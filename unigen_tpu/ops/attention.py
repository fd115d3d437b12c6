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
    k: Array,                       # [B, Lk, KVH, Dh] ("bskd"), [Lk, KVH, B, Dh]
                                    # ("skbd"), or [B, KVH, Lk, Dh] ("bhsd")
    v: Array,                       # same layout as k
    mask: Optional[Array] = None,   # [B, 1, Lq, Lk] bool (True = visible)
    meta: Optional[AttnMeta] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    kv_format: str = "bskd",
) -> Array:
    """Multi-head attention with fp32 softmax. Returns [B, Lq, H, Dh].

    Either ``mask`` (boolean) or ``meta`` (per-token metadata) may be provided; with
    ``meta`` the XLA path materializes visibility lazily (XLA fuses it into the
    softmax), and the Pallas path never materializes it at all.

    ``kv_format`` consumes K/V directly in any of the KV-cache storage
    orders (models/qwen2.py::Qwen2Config.kv_layout) — no transpose is
    materialized, the einsum carries the layout.
    """
    del impl  # Pallas kernel is selected inside flash_attention when available.
    b, lq, h, dh = q.shape
    kv_spec = {"bskd": "bskd", "skbd": "skbd", "bhsd": "bksd"}[kv_format]
    kvh = k.shape[1] if kv_format == "skbd" else k.shape[2 if kv_format == "bskd" else 1]
    g = h // kvh

    if scale is None:
        scale = dh ** -0.5

    # GQA-grouped einsum: query heads reshape to [KVH, G] so K/V are NEVER
    # repeated/materialized G-fold (a 6x cache copy per decode step for Qwen2.5)
    qg = q.reshape(b, lq, kvh, g, dh)
    logits = jnp.einsum(f"bqkgd,{kv_spec}->bkgqs", qg, k,
                        preferred_element_type=jnp.float32) * scale

    if mask is None and meta is not None:
        mask = meta.visibility()
    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, jnp.finfo(jnp.float32).min)

    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum(f"bkgqs,{kv_spec}->bqkgd", weights, v)
    return out.reshape(b, lq, h, dh)


def dot_product_attention_q8(
    q: Array,            # [B, Lq, H, Dh]
    k_q: Array,          # int8, any kv_format order (see dot_product_attention)
    k_scale: Array,      # fp32, k_q's order with Dh dropped
    v_q: Array,          # layout of k_q
    v_scale: Array,      # layout of k_scale
    mask: Optional[Array] = None,   # [B, 1, Lq, Lk] bool
    scale: Optional[float] = None,
    kv_format: str = "bskd",
) -> Array:
    """Attention over an int8 KV cache with POST-matmul scale application.

    The per-(slot, head) scales are constant over the head dimension, so they
    factor out of both matmuls: logits scale columns of q@k, and v's scale folds
    into the softmax weights. The int8 cache is never expanded to a full-size
    bf16 temp — the int8->bf16 convert fuses into the dot operands.
    """
    b, lq, h, dh = q.shape
    kv_spec = {"bskd": "bskd", "skbd": "skbd", "bhsd": "bksd"}[kv_format]
    kvh = k_q.shape[{"bskd": 2, "skbd": 1, "bhsd": 1}[kv_format]]
    g = h // kvh
    if scale is None:
        scale = dh ** -0.5

    def bcast(sc):  # -> [B, KVH, 1, 1, S] for the bkgqs logits
        if kv_format == "skbd":
            sc = jnp.transpose(sc, (2, 1, 0))
        elif kv_format == "bskd":
            sc = jnp.moveaxis(sc, 1, 2)
        # bhsd scales are already [B, KVH, S]
        return sc[:, :, None, None, :]

    qg = q.reshape(b, lq, kvh, g, dh)
    logits = jnp.einsum(f"bqkgd,{kv_spec}->bkgqs", qg, k_q.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    # apply q-scale and the k slot scales after the matmul
    logits = logits * scale * bcast(k_scale)

    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, jnp.finfo(jnp.float32).min)

    weights = jax.nn.softmax(logits, axis=-1)
    weights = (weights * bcast(v_scale)).astype(q.dtype)
    out = jnp.einsum(f"bkgqs,{kv_spec}->bqkgd", weights, v_q.astype(q.dtype))
    return out.reshape(b, lq, h, dh)
