"""Pallas attention kernel for the prefix-cached MaskGIT chunk step.

The t2i sampler's hot loop forwards an (n+2)-token chunk against a cached
prefix 50 times per image (generation/t2i.py::_t2i_generate_prefix_cached).
XLA's dot-product attention materializes the [B, H, Lq, S] fp32 logits tensor
through HBM (~39MB per layer at the GenEval batch-4 shape — several GB per
MaskGIT step across 28 layers, the single largest remaining HBM cost of the
sampler after W8A8). One batch row's whole attention problem fits VMEM
(q 0.8MB + K/V 0.4MB + logits 2.4MB fp32), so this kernel runs it per-row
entirely on-chip: no logits ever touch HBM.

Specialization that makes it simple: in the chunk step every query sees the
same key set for its row (non-pad prefix + the whole bidirectional chunk), so
the mask is a per-(row, key-slot) vector ``kvalid [B, S]`` — not a [Lq, S]
matrix. GQA is handled by reshaping each group of H/KVH query heads into the
M dimension of a single MXU matmul against the shared K.

Numerics match ops/attention.py::dot_product_attention exactly-in-structure:
fp32 logits, fp32 softmax with a max-shift, bf16 PV matmul with fp32
accumulation. Inference-only (no VJP) — the sampler never differentiates.

**Measured outcome (BENCH.md):** at the GenEval batch-4 shape the kernel is
SLOWER end-to-end than XLA's attention (2.6 vs 3.1 img/s; a batched-dim
dot_general variant measured 2.4) — XLA evidently keeps these modest logits
tiles inside fusions rather than round-tripping HBM as the sizing argument
assumed. The kernel therefore ships opt-in (``t2i_generate(chunk_kernel=True)``,
token-exact vs the XLA path in tests) as a documented negative result; its
premise would only pay at much longer prefixes where the logits tile genuinely
exceeds what XLA can keep resident.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(q_ref, k_ref, v_ref, kvalid_ref, out_ref, *, Lq, S, H, KVH, Dh, scale):
    G = H // KVH
    neg = jnp.float32(-1e30)
    valid = kvalid_ref[0, 0]                                # [S] int32 (1 = visible)
    bias = jnp.where(valid > 0, 0.0, neg)[None, :]          # [1, S] fp32

    for kh in range(KVH):
        k = k_ref[0, :, kh]                                 # [S, Dh]
        v = v_ref[0, :, kh]
        # the G query heads sharing this K/V head fold into the M dimension
        # (measured faster than a batched-dim dot_general in this kernel)
        q = q_ref[0, :, kh * G:(kh + 1) * G]                # [Lq, G, Dh]
        q = q.transpose(1, 0, 2).reshape(G * Lq, Dh)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [G*Lq, S]
        logits = logits + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [G*Lq, Dh]
        out = out.reshape(G, Lq, Dh).transpose(1, 0, 2)
        out_ref[0, :, kh * G:(kh + 1) * G] = out.astype(out_ref.dtype)


def chunk_attention(q: Array, k: Array, v: Array, kvalid: Array,
                    interpret=None) -> Array:
    """Attention of a query chunk against a full KV cache with a per-row
    key-visibility mask.

    q: [B, Lq, H, Dh]; k, v: [B, S, KVH, Dh]; kvalid: [B, S] bool.
    Returns [B, Lq, H, Dh] in q.dtype. Every query of row b attends exactly
    the keys with kvalid[b] set (the t2i chunk-step visibility semantic,
    generation/t2i.py slot_visible).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Lq, H, Dh = q.shape
    S, KVH = k.shape[1], k.shape[2]
    scale = Dh ** -0.5
    kern = functools.partial(_kernel, Lq=Lq, S=S, H=H, KVH=KVH, Dh=Dh,
                             scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Lq, H, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, KVH, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, KVH, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, H, Dh), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, H, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * S * Dh,
            bytes_accessed=2 * B * (2 * Lq * H * Dh + 2 * S * KVH * Dh),
            transcendentals=B * H * Lq * S),
        interpret=interpret,
    )(q, k.astype(q.dtype), v.astype(q.dtype), kvalid.astype(jnp.int32)[:, None, :])
