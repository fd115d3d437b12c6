"""W4A8 dense matmul: int4-packed weights, int8 activations, Pallas kernel.

The VQA/serving decode loop is HBM-bound: at batch 32 it reads ~2.0 GB/step of
which ~1.3 GB is dense weights (BENCH.md decode roofline — 33% of
speed-of-light with int8 weights). Halving the dominant weight read is the one
remaining traffic lever, but int4 CANNOT win in plain XLA: the nibble-unpack
would materialize an int8 weight tensor in HBM before the dot (XLA does not
fuse producers into dot operands), paying the int8 read PLUS the packed read.
This kernel unpacks in VMEM after the packed tile is DMA'd, so HBM sees only
0.5 byte/weight.

Scheme (the reference has no int4 path; its generate loop is bf16 HF
`generate`, reference models/modeling_unigen.py:583-588):

* weights: symmetric int4 per (group of ``group`` input rows, output channel):
  ``w ≈ w_int4 * scale4[g, out]``, clipped to [-7, 7];
* packing: within each group, row j of the LOW half pairs with row j of the
  HIGH half into one int8 byte — so the kernel splits the group's contraction
  into two contiguous int8 dots (no in-register interleave/relayout needed);
* activations: the backbone's dynamic per-token int8 (ops/quantization.py);
* accumulation: int32 on the MXU per half-group, fp32 across groups with the
  per-group scale folded in.

Per-group scales (default group=256 → two 128-deep MXU passes per group) keep
int4's quantization noise bounded per 256 inputs instead of per 1536/8960 —
the difference between a usable and a garbage 4-bit backbone at real-weight
outlier channels.

Quality gates: tests/test_int4.py (kernel exactness vs its own dequantized
reference in fp32, hidden-state cosine vs bf16, engine token agreement).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
PyTree = Any

_KEY = "kernel_int4"


def pack_int4(w: Array, group: int = 256):
    """[K, N] float -> (packed int8 [K//2, Npad], scale4 fp32 [K//group, Npad]).

    ``Npad`` rounds N up to a multiple of 512 (the kernel's N block); padded
    columns quantize zeros. K must be a multiple of ``group`` (even)."""
    k, n = w.shape
    if k % group or group % 2:
        raise ValueError(f"K={k} must be a multiple of even group={group}")
    npad = -(-n // 512) * 512
    wf = w.astype(jnp.float32)
    if npad != n:
        wf = jnp.pad(wf, ((0, 0), (0, npad - n)))
    g = k // group
    wg = wf.reshape(g, group, npad)
    scale = jnp.max(jnp.abs(wg), axis=1) / 7.0          # [g, Npad]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7).astype(jnp.int8)
    half = group // 2
    lo, hi = q[:, :half], q[:, half:]                    # [g, half, Npad]
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)   # [g, half, Npad]
    return packed.reshape(k // 2, npad), scale


def _w4a8_kernel(x_ref, w_ref, s_ref, o_ref, *, groups, half):
    """One (T, N) block: o[BT, BN] = sum_g (x8_g . unpack(w4_g)) * scale4[g, :]."""
    x = x_ref[...]                                       # [B, K] int8
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(groups):                              # static unroll
        wp = w_ref[g * half:(g + 1) * half, :]           # [half, BN] packed
        # Mosaic legalizes shifts on i32 vectors only (arith.shli/shrsi on i8
        # fail to legalize — probed on the chip); unpack through int32
        w32 = wp.astype(jnp.int32)
        lo = ((w32 << 28) >> 28).astype(jnp.int8)        # sign-extended low nibble
        hi = (w32 >> 4).astype(jnp.int8)                 # arithmetic: high nibble
        xa = x[:, g * 2 * half:g * 2 * half + half]
        xb = x[:, g * 2 * half + half:(g + 1) * 2 * half]
        part = jax.lax.dot_general(
            xa, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        part += jax.lax.dot_general(
            xb, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += part.astype(jnp.float32) * s_ref[g, :][None, :]
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("group", "block_n", "interpret"))
def w4a8_matmul(x_int8: Array, packed: Array, scale4: Array, *,
                group: int = 256, block_n: int = 512,
                interpret: bool = False) -> Array:
    """[T, K] int8 @ int4-packed [K//2, Npad] -> [T, Npad] fp32 (scales folded).

    The caller applies per-token activation scales and bias. T is padded to
    the int8 sublane tile (32) internally."""
    t, k = x_int8.shape
    npad = packed.shape[1]
    groups, half = k // group, group // 2
    block_n = min(block_n, npad)
    if npad % block_n:
        raise ValueError(f"N={npad} not a multiple of block_n={block_n}")
    # tile T too: prefill runs B*L rows (e.g. 19200) — an untiled x block
    # blows the 128MB VMEM budget (measured OOM at [19200, 8960] int8)
    block_t = 256
    tpad = -(-t // 32) * 32 if t <= block_t else -(-t // block_t) * block_t
    block_t = min(block_t, tpad)
    if tpad != t:
        x_int8 = jnp.pad(x_int8, ((0, tpad - t), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, groups=groups, half=half),
        out_shape=jax.ShapeDtypeStruct((tpad, npad), jnp.float32),
        grid=(tpad // block_t, npad // block_n),   # N innermost: x block stays
        in_specs=[
            pl.BlockSpec((block_t, k), lambda i, j: (i, 0)),       # x: T block
            pl.BlockSpec((k // 2, block_n), lambda i, j: (0, j)),  # w: N block
            pl.BlockSpec((groups, block_n), lambda i, j: (0, j)),  # scales
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda i, j: (i, j)),
        # double-buffered x/w/out blocks + unpack temps exceed the default
        # 16MB scoped-vmem budget at K=8960 (measured 16.76M); the chip has
        # 128MB — raise the cap instead of shrinking the MXU tiles
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x_int8, packed, scale4)
    return out[:t] if tpad != t else out


def quantize_dense_int4(p: dict, group: int = 256) -> dict:
    """{'kernel': [K, N], 'bias'?} -> int4-packed form.

    Always emits a ``bias`` (zeros when the layer has none): its [N] shape is
    the only static record of the UNPADDED output width, and adding it is free
    (fused into the dequant epilogue)."""
    w = p["kernel"]
    packed, scale = pack_int4(w, group)
    out = {_KEY: packed, "scale4": scale,
           "bias": p.get("bias", jnp.zeros((w.shape[1],), jnp.float32))}
    for key in p:  # QLoRA adapters ride along untouched
        if key.startswith("lora_"):
            out[key] = p[key]
    return out


def dense_int4_prequant(p: dict, x_int8: Array, act_scale: Array,
                        out_dtype) -> Array:
    """W4A8 matmul over pre-quantized activations (shared-input layers)."""
    n = p["bias"].shape[0]
    lead = x_int8.shape[:-1]
    k = x_int8.shape[-1]
    groups = p["scale4"].shape[-2]
    interpret = jax.default_backend() != "tpu"
    y = w4a8_matmul(x_int8.reshape(-1, k), p[_KEY], p["scale4"],
                    group=k // groups, interpret=interpret)
    y = y[:, :n].reshape(*lead, n) * act_scale
    y = y + p["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def dense_int4(p: dict, x: Array) -> Array:
    """W4A8 matmul with dynamic per-token activation scales; returns x.dtype."""
    from .quantization import quantize_activations
    x_int8, act_scale = quantize_activations(x)
    return dense_int4_prequant(p, x_int8, act_scale, x.dtype)


def is_quantized_int4(p: dict) -> bool:
    return isinstance(p, dict) and _KEY in p


def quantize_qwen2_params_int4(params: PyTree, group: int = 256) -> PyTree:
    """Int4-pack every transformer dense layer of a Qwen2 param tree (stacked
    layers: per-layer packing via vmap)."""
    out = dict(params)
    layers = dict(params["layers"])

    def q(p):
        return jax.vmap(lambda leaf: quantize_dense_int4(leaf, group))(p)

    attn = dict(layers["attn"])
    for name in ("q", "k", "v", "o"):
        attn[name] = q(attn[name])
    mlp = dict(layers["mlp"])
    for name in ("gate", "up", "down"):
        mlp[name] = q(mlp[name])
    layers["attn"] = attn
    layers["mlp"] = mlp
    out["layers"] = layers
    return out


def quantize_unigen_params_int4(params: PyTree, cfg=None, lm_head: bool = True,
                                group: int = 256) -> PyTree:
    """Backbone + text head to W4A8 for the HBM-bound decode path.

    Projectors/embeddings/norms stay high precision (rounding error of the
    traffic). Counterpart of quantization.quantize_unigen_params."""
    out = dict(params)
    out["llm"] = quantize_qwen2_params_int4(params["llm"], group)
    if lm_head and cfg is not None:
        from ..models import qwen2
        out["llm"]["lm_head_q"] = quantize_dense_int4(
            {"kernel": qwen2.lm_head_weight(params["llm"], cfg.llm)}, group)
    return out
