"""Attention dispatch: XLA reference path + Pallas TPU flash kernel.

The reference runs torch SDPA with materialized [B,1,L,L] additive masks
(reference: models/unigen.py:67, training/prompting_utils.py:975-1074). Here the
canonical representation is the boolean mask / ``AttnMeta`` from ``ops.masks``;
``dot_product_attention`` applies it with an fp32 softmax (matching the reference's
upcast, siglip_encoder.py:231), and the Pallas kernel (ops/flash_attention.py)
computes visibility from AttnMeta on the fly for the TPU hot path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .masks import AttnMeta

Array = jax.Array


def dot_product_attention(
    q: Array,                       # [B, Lq, H, Dh]
    k: Array,                       # [B, Lk, KVH, Dh]
    v: Array,                       # [B, Lk, KVH, Dh]
    mask: Optional[Array] = None,   # [B, 1, Lq, Lk] bool (True = visible)
    meta: Optional[AttnMeta] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> Array:
    """Multi-head attention with fp32 softmax. Returns [B, Lq, H, Dh].

    Either ``mask`` (boolean) or ``meta`` (per-token metadata) may be provided; with
    ``meta`` the XLA path materializes visibility lazily (XLA fuses it into the
    softmax), and the Pallas path never materializes it at all.
    """
    del impl  # Pallas kernel is selected inside flash_attention when available.
    b, lq, h, dh = q.shape
    lk, kvh = k.shape[1], k.shape[2]
    g = h // kvh

    if scale is None:
        scale = dh ** -0.5

    # GQA-grouped einsum: query heads reshape to [KVH, G] so K/V are NEVER
    # repeated/materialized G-fold (a 6x cache copy per decode step for Qwen2.5)
    qg = q.reshape(b, lq, kvh, g, dh)
    logits = jnp.einsum("bqkgd,bskd->bkgqs", qg, k,
                        preferred_element_type=jnp.float32) * scale

    if mask is None and meta is not None:
        mask = meta.visibility()
    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, jnp.finfo(jnp.float32).min)

    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgqs,bskd->bqkgd", weights, v)
    return out.reshape(b, lq, h, dh)


def dot_product_attention_q8(
    q: Array,            # [B, Lq, H, Dh]
    k_q: Array,          # [B, Lk, KVH, Dh] int8
    k_scale: Array,      # [B, Lk, KVH] fp32
    v_q: Array,          # [B, Lk, KVH, Dh] int8
    v_scale: Array,      # [B, Lk, KVH] fp32
    mask: Optional[Array] = None,   # [B, 1, Lq, Lk] bool
    scale: Optional[float] = None,
) -> Array:
    """Attention over an int8 KV cache with POST-matmul scale application.

    The per-(slot, head) scales are constant over the head dimension, so they
    factor out of both matmuls: logits scale columns of q@k, and v's scale folds
    into the softmax weights. The int8 cache is never expanded to a full-size
    bf16 temp — the int8->bf16 convert fuses into the dot operands.
    """
    b, lq, h, dh = q.shape
    kvh = k_q.shape[2]
    g = h // kvh
    if scale is None:
        scale = dh ** -0.5

    qg = q.reshape(b, lq, kvh, g, dh)
    logits = jnp.einsum("bqkgd,bskd->bkgqs", qg, k_q.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    # apply q-scale and the k slot scales after the matmul
    logits = logits * scale * jnp.moveaxis(k_scale, 1, 2)[:, :, None, None, :]

    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, jnp.finfo(jnp.float32).min)

    weights = jax.nn.softmax(logits, axis=-1)
    weights = (weights * jnp.moveaxis(v_scale, 1, 2)[:, :, None, None, :]).astype(q.dtype)
    out = jnp.einsum("bkgqs,bskd->bqkgd", weights, v_q.astype(q.dtype))
    return out.reshape(b, lq, h, dh)
