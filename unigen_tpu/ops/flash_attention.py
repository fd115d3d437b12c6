"""Pallas TPU attention kernel with on-the-fly omni-mask computation.

Replaces the reference's materialized [B,1,L,L] additive float masks
(reference: training/prompting_utils.py:975-1074) with three per-token bit flags
(ops.masks.AttnMeta) evaluated inside the kernel:

    visible(q, k) = ~pad[q] & ~pad[k] & (k <= q | bidir_q[q] | bidir_k[k])

This covers all three mask families with zero HBM mask traffic:
  * plain causal            (all flags zero)
  * t2i omni                (bidir_q on image-block tokens)
  * mmu prefix-LM           (bidir_k on the image prefix)

Kernel shape: grid (B, H, Lq/BQ); K/V for one (batch, kv-head) live in VMEM
(UniGen sequences are ≤ ~1.5k tokens — SURVEY.md §5 long-context note — so a
single K/V tile fits comfortably); fp32 logits/softmax on the MXU/VPU; GQA by
q-head -> kv-head index mapping in the BlockSpec.

The same function runs in interpreter mode on CPU for CI parity tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masks import AttnMeta

Array = jax.Array

_PAD_BIT, _BIDIRQ_BIT, _BIDIRK_BIT = 1, 2, 4
_SEG_SHIFT = 3  # packed-segment id lives in bits [3, 31] (ops.masks.AttnMeta.seg)


def pack_meta(meta: AttnMeta) -> Array:
    """AttnMeta -> [B, L] int32 bitfield consumed by the kernel."""
    bits = (meta.pad.astype(jnp.int32) * _PAD_BIT
            + meta.bidir_q.astype(jnp.int32) * _BIDIRQ_BIT
            + meta.bidir_k.astype(jnp.int32) * _BIDIRK_BIT)
    if meta.seg is not None:
        bits = bits + (meta.seg.astype(jnp.int32) << _SEG_SHIFT)
    return bits


def _attn_kernel(meta_q_ref, meta_k_ref, q_ref, k_ref, v_ref, o_ref, *, scale,
                 block_q):
    i = pl.program_id(2)
    q = q_ref[0, 0]                       # [BQ, D]
    k = k_ref[0, 0]                       # [Lk, D]
    v = v_ref[0, 0]                       # [Lk, D]
    lk = k.shape[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [BQ, Lk]

    # broadcast meta in int32 FIRST (Mosaic only supports minor-dim insertion for
    # 32-bit types; 1-bit vectors cannot be reshaped [BQ] -> [BQ, 1])
    mq = meta_q_ref[0, 0].reshape(block_q, 1)   # [BQ, 1] int32
    mk = meta_k_ref[0, 0].reshape(1, lk)        # [1, Lk] int32
    q_pos = i * block_q + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)

    visible = (k_pos <= q_pos) | ((mq & _BIDIRQ_BIT) != 0) | ((mk & _BIDIRK_BIT) != 0)
    visible &= ((mq & _PAD_BIT) == 0) & ((mk & _PAD_BIT) == 0)
    # sequence packing: query and key must share a segment id (0 when unpacked)
    visible &= (mq >> _SEG_SHIFT) == (mk >> _SEG_SHIFT)

    logits = jnp.where(visible, logits, jnp.finfo(jnp.float32).min)
    # fp32 softmax; fully-masked rows (pads) produce uniform weights over the
    # -inf row — matching the XLA path's where+softmax behavior
    weights = jax.nn.softmax(logits, axis=-1)
    o_ref[0, 0] = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _xla_reference(q, k, v, meta_bits, scale):
    """Mask-metadata attention in plain XLA — used as the VJP for the kernel
    (backward recomputes through this; its forward math matches the kernel)."""
    from .attention import dot_product_attention
    pad = (meta_bits & _PAD_BIT) != 0
    bidir_q = (meta_bits & _BIDIRQ_BIT) != 0
    bidir_k = (meta_bits & _BIDIRK_BIT) != 0
    meta = AttnMeta(pad=pad, bidir_q=bidir_q, bidir_k=bidir_k,
                    seg=meta_bits >> _SEG_SHIFT)
    return dot_product_attention(q, k, v, meta=meta, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: Array,            # [B, Lq, H, Dh]
    k: Array,            # [B, Lk, KVH, Dh]
    v: Array,            # [B, Lk, KVH, Dh]
    meta_bits: Array,    # [B, L] int32 (pack_meta), with Lq == Lk == L
    scale: Optional[float] = None,
    block_q: int = 128,
    interpret: bool = False,
) -> Array:
    """Self-attention with kernel-side omni masking. Returns [B, Lq, H, Dh].

    Differentiable: forward runs the Pallas kernel; the backward pass recomputes
    through the numerically-matching XLA path (backward attention is
    matmul-dominated, which XLA already schedules well on the MXU)."""
    return _flash_attention_impl(q, k, v, meta_bits, scale, block_q, interpret)


def _flash_fwd(q, k, v, meta_bits, scale, block_q, interpret):
    out = _flash_attention_impl(q, k, v, meta_bits, scale, block_q, interpret)
    return out, (q, k, v, meta_bits)


def _flash_bwd(scale, block_q, interpret, residuals, g):
    q, k, v, meta_bits = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, meta_bits, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _flash_attention_impl(q, k, v, meta_bits, scale=None, block_q=128,
                          interpret=False) -> Array:
    b, lq, h, dh = q.shape
    lk, kvh = k.shape[1], k.shape[2]
    if scale is None:
        scale = dh ** -0.5
    rep = h // kvh

    # [B, L, H, D] -> [B, H, L, D] tiles
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    block_q = min(block_q, lq)
    grid = (b, h, pl.cdiv(lq, block_q))
    # meta as [B, 1, L]: TPU block specs need the trailing dims tile-aligned; the
    # middle singleton satisfies the sublane constraint (block dim == full dim)
    meta3 = meta_bits[:, None, :]

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),                    # meta_q
            pl.BlockSpec((1, 1, lk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),                    # meta_k
            pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),                    # q
            pl.BlockSpec((1, 1, lk, dh), lambda bi, hi, qi: (bi, hi // rep, 0, 0),
                         memory_space=pltpu.VMEM),                    # k
            pl.BlockSpec((1, 1, lk, dh), lambda bi, hi, qi: (bi, hi // rep, 0, 0),
                         memory_space=pltpu.VMEM),                    # v
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, dh), q.dtype),
        interpret=interpret,
    )(meta3, meta3, qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)
