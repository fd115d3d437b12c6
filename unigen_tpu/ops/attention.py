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


def _repeat_kv(x: Array, n_rep: int) -> Array:
    """[B, L, KVH, D] -> [B, L, KVH*n_rep, D] for grouped-query attention."""
    if n_rep == 1:
        return x
    b, l, kvh, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, l, kvh, n_rep, d))
    return x.reshape(b, l, kvh * n_rep, d)


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
    kvh = k.shape[2]
    n_rep = h // kvh
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)

    if scale is None:
        scale = dh ** -0.5

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale

    if mask is None and meta is not None:
        mask = meta.visibility()
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)

    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
