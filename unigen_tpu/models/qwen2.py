"""Qwen2.5 causal-LM backbone, TPU-native.

Functional re-implementation of the backbone the reference wraps via HuggingFace
``Qwen2ForCausalLM`` (reference: models/unigen.py:16,56). Design choices that differ
from a torch translation, deliberately:

* **Stacked layer parameters + ``lax.scan``** over the depth dimension — one compiled
  layer body instead of 28 unrolled ones (fast compiles, smaller HLO, scan-friendly
  remat for training).
* **Pure functions over pytrees** — ``init`` builds the parameter tree, ``forward``
  is stateless; sharding is applied externally via ``jax.sharding`` PartitionSpecs
  (see parallel/partition.py).
* **KV cache as an explicit pytree** threaded through decode loops (the reference's
  mmu decode re-forwards the whole sequence every step, unigen.py:536-558; here the
  prefix-LM mask is honored at prefill and decode reads the cache).
* fp32 RMSNorm/softmax islands inside a bf16 compute stream.

Weight layout matches HF Qwen2: q/k/v projections carry biases, o_proj does not;
SwiGLU MLP (gate/up/down); RoPE with configurable theta and optional linear scaling
(reference exposes rope_theta / scaling_factor / rope_type at unigen.py:38-40,61-64).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from ..ops.masks import AttnMeta

Array = jax.Array
PyTree = Any


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: int = 128
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    rope_scaling_factor: float = 1.0
    rope_type: str = "linear"
    tie_word_embeddings: bool = True
    dtype: Any = jnp.bfloat16
    # KV-cache storage order (names omit the leading layer axis):
    #   "bskd": [L, B, S, KVH, Dh] — the original batch-major order.
    #   "skbd": [L, S, KVH, B, Dh] — seq-major.
    #   "bhsd": [L, B, KVH, S, Dh] — head-major; matches the memory order the
    #           decode attention fusion consumes K/V in (scheduled-HLO layout
    #           {4,2,3,1,0} over bskd = exactly bhsd), so XLA's per-layer
    #           cache slice stops being a transpose relayout (0.63 ms/step =
    #           15% of the VQA decode step at batch 32, BENCH.md r4 trace).
    kv_layout: str = "bskd"

    @classmethod
    def tiny(cls, vocab_size: int = 512, **kw) -> "Qwen2Config":
        """Small config for tests."""
        defaults = dict(vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                        head_dim=16, rope_theta=1e4, dtype=jnp.float32)
        defaults.update(kw)
        return cls(**defaults)


class KVCache(NamedTuple):
    """Per-layer-stacked KV cache. Storage order is set by ``cfg.kv_layout``
    (default [num_layers, B, max_len, KVH, Dh]; see Qwen2Config) — scales
    follow the k/v order with the trailing Dh dropped. The layout is a
    property of the config, not the cache object: every consumer receives
    ``cfg`` alongside the cache.

    Optionally int8-quantized (``init_kv_cache(..., quantize=True)``): k/v are
    stored int8 with per-(slot, head) symmetric scales — halves the dominant
    HBM read of the decode loop (the cache is ~2.1GB/step at VQA shapes,
    BENCH.md) at ~1e-2 relative error, re-quantized at write time only.

    ``index`` is scalar int32 (all rows at the same decode position — the
    batch-decode paths) or [B] int32 (each row at its own position — the
    continuous-batching serving engine, where every slot holds an
    independently-aged request; writes become a per-row scatter).
    """
    k: Array
    v: Array
    index: Array  # scalar or [B] int32 — number of valid positions (per row)
    k_scale: Optional[Array] = None  # [num_layers, B, max_len, KVH] fp32
    v_scale: Optional[Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


_KV_SEQ_AXIS = {"bskd": 2, "skbd": 1, "bhsd": 3}


def kv_seq_axis(cfg: Qwen2Config) -> int:
    """Axis of the sequence (slot) dimension in the cache k/v arrays."""
    return _KV_SEQ_AXIS[cfg.kv_layout]


def cache_len(cfg: Qwen2Config, cache: KVCache) -> int:
    """Number of slots allocated in the cache."""
    return cache.k.shape[kv_seq_axis(cfg)]


def init_kv_cache(cfg: Qwen2Config, batch_size: int, max_len: int,
                  dtype: Optional[Any] = None, quantize: bool = False,
                  per_row_index: bool = False) -> KVCache:
    L, kvh, dh = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    if cfg.kv_layout == "skbd":
        shape = (L, max_len, kvh, batch_size, dh)
    elif cfg.kv_layout == "bhsd":
        shape = (L, batch_size, kvh, max_len, dh)
    else:
        shape = (L, batch_size, max_len, kvh, dh)
    index = jnp.zeros((batch_size,) if per_row_index else (), jnp.int32)
    if quantize:
        sshape = shape[:-1]
        return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       index,
                       jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32))
    dtype = dtype or cfg.dtype
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), index)


def _cache_write(buf: Array, upd: Array, li: Array, cache_index: Array,
                 layout: str = "bskd") -> Array:
    """Write a chunk into one layer of the stacked cache buffer.

    ``buf``: one of the ``cfg.kv_layout`` orders; ``upd``: [B, l, ...];
    ``li``: scalar layer index.
    Scalar ``cache_index``: one dynamic_update_slice at the shared position.
    [B] ``cache_index``: per-row positions (the continuous-batching engine
    keeps every serving slot at its own age) — written as ONE fused
    masked-select rewrite of the layer slice. The earlier vmapped
    dynamic_update_slice form unrolled to B tiny ops per (layer, step) —
    28,672 dispatches per 16-step serving chunk at 32 slots, 59% of the
    decode chunk's device time (BENCH.md r5 engine trace); the select
    streams the 7MB layer slice once instead and XLA aliases it in place.
    """
    upd = upd.astype(buf.dtype)
    if layout == "bhsd":
        upd = jnp.swapaxes(upd, 1, 2)  # [B, KVH, l(, Dh)]
    if jnp.ndim(cache_index) == 0:
        if layout == "skbd":
            # [B, l, ...] -> [l, ..., B(, Dh)]: batch lands at index 2 for both
            # values ([l, KVH, B, Dh]) and scales ([l, KVH, B])
            upd = jnp.moveaxis(upd, 0, 2)
            zeros = (0,) * (buf.ndim - 2)
            return jax.lax.dynamic_update_slice(buf, upd[None],
                                                (li, cache_index) + zeros)
        if layout == "bhsd":
            zeros = (0,) * (buf.ndim - 4)
            return jax.lax.dynamic_update_slice(
                buf, upd[None], (li, 0, 0, cache_index) + zeros)
        zeros = (0,) * (buf.ndim - 3)
        return jax.lax.dynamic_update_slice(buf, upd[None], (li, 0, cache_index) + zeros)

    # layer-slice axes (after dropping the leading stacked-layer dim):
    #   bskd  [B, S, KVH(, Dh)]  upd [B, l, KVH(, Dh)]
    #   skbd  [S, KVH, B(, Dh)]  upd [B, l, KVH(, Dh)] -> moveaxis to [l, KVH, B(, Dh)]
    #   bhsd  [B, KVH, S(, Dh)]  upd [B, KVH, l(, Dh)] (swapped above)
    slot_ax = {"bskd": 1, "skbd": 0, "bhsd": 2}[layout]
    bat_ax = {"bskd": 0, "skbd": 2, "bhsd": 0}[layout]
    l_ax = {"bskd": 1, "skbd": 1, "bhsd": 2}[layout]  # chunk axis within upd

    layer = jax.lax.dynamic_index_in_dim(buf, li, 0, keepdims=False)
    b, s = cache_index.shape[0], layer.shape[slot_ax]
    l = upd.shape[l_ax]
    pos = jnp.arange(s)
    sel = (pos[None] >= cache_index[:, None]) & \
          (pos[None] < (cache_index + l)[:, None])              # [B, S]
    if l > 1:
        # expand the chunk to slot width: slot s holds upd[:, s - idx] (clamped;
        # out-of-window slots are discarded by the select)
        rel = jnp.clip(pos[None] - cache_index[:, None], 0, l - 1)  # [B, S]
        rel = rel.reshape(rel.shape + (1,) * (upd.ndim - 2))
        if layout == "bhsd":
            rel = jnp.swapaxes(rel, 1, 2)                       # [B, 1, S(, 1)]
        upd = jnp.take_along_axis(upd, rel, axis=l_ax)
    sel2 = sel.T if bat_ax > slot_ax else sel                   # skbd: [S, B]
    shape = [1] * layer.ndim
    shape[bat_ax], shape[slot_ax] = b, s
    if layout == "skbd":
        upd = jnp.moveaxis(upd, 0, 2)
    new_layer = jnp.where(sel2.reshape(shape), upd.astype(layer.dtype), layer)
    return jax.lax.dynamic_update_index_in_dim(buf, new_layer, li, 0)


def _kv_quantize(x: Array) -> Tuple[Array, Array]:
    """[B, L, KVH, Dh] -> (int8 values, [B, L, KVH] fp32 scales)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _kv_dequantize(q: Array, scale: Array, dtype) -> Array:
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _dense_init(key, in_dim, out_dim, dtype, with_bias):
    scale = in_dim ** -0.5
    w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * scale
    p = {"kernel": w.astype(dtype)}
    if with_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def _layer_init(key, cfg: Qwen2Config):
    d, h, kvh, dh, i = (cfg.hidden_size, cfg.num_attention_heads,
                        cfg.num_key_value_heads, cfg.head_dim, cfg.intermediate_size)
    ks = jax.random.split(key, 7)
    return {
        "input_ln": {"scale": jnp.ones((d,), cfg.dtype)},
        "attn": {
            "q": _dense_init(ks[0], d, h * dh, cfg.dtype, True),
            "k": _dense_init(ks[1], d, kvh * dh, cfg.dtype, True),
            "v": _dense_init(ks[2], d, kvh * dh, cfg.dtype, True),
            "o": _dense_init(ks[3], h * dh, d, cfg.dtype, False),
        },
        "post_ln": {"scale": jnp.ones((d,), cfg.dtype)},
        "mlp": {
            "gate": _dense_init(ks[4], d, i, cfg.dtype, False),
            "up": _dense_init(ks[5], d, i, cfg.dtype, False),
            "down": _dense_init(ks[6], i, d, cfg.dtype, False),
        },
    }


def init(key: Array, cfg: Qwen2Config) -> PyTree:
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_hidden_layers)
    layers = jax.vmap(lambda k: _layer_init(k, cfg))(layer_keys)
    params = {
        "embed": {"weight": (jax.random.normal(k_embed, (cfg.vocab_size, cfg.hidden_size),
                                               jnp.float32) * 0.02).astype(cfg.dtype)},
        "layers": layers,
        "final_ln": {"scale": jnp.ones((cfg.hidden_size,), cfg.dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": (jax.random.normal(
            k_head, (cfg.hidden_size, cfg.vocab_size), jnp.float32) * 0.02).astype(cfg.dtype)}
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def rms_norm(x: Array, scale: Array, eps: float) -> Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * scale.astype(jnp.float32)).astype(dtype)


def _lora_delta(p, x):
    """Low-rank residual ``((x @ a) @ b) * scale`` (training/lora.py leaves).

    The [*, r] bottleneck is tiny next to the base matmul; runs in x.dtype with
    the per-layer fp32 scale folded at the end."""
    y = (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    return y * p["lora_scale"].astype(x.dtype)


def _quant_prequant(p, x8, xs, dtype):
    """Quantized matmul over shared pre-quantized activations: W8A8 or W4A8."""
    if "kernel_int4" in p:
        from ..ops.int4 import dense_int4_prequant
        return dense_int4_prequant(p, x8, xs, dtype)
    from ..ops.quantization import dense_int8_prequant
    return dense_int8_prequant(p, x8, xs, dtype)


def _is_quant(p) -> bool:
    return "kernel_int8" in p or "kernel_int4" in p


def _dense(p, x):
    if "kernel_int4" in p:
        from ..ops.int4 import dense_int4
        y = dense_int4(p, x)
    elif "kernel_int8" in p:
        from ..ops.quantization import dense_int8
        y = dense_int8(p, x)
    else:
        y = x @ p["kernel"]
        if "bias" in p:
            y = y + p["bias"]
    if "lora_a" in p:
        y = y + _lora_delta(p, x)
    return y


def rope(x: Array, positions: Array, theta: float, scaling_factor: float = 1.0) -> Array:
    """Rotary embedding, NeoX rotate-half convention (matches HF Qwen2).

    x: [B, L, H, Dh]; positions: [B, L] int.
    """
    dh = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    pos = positions.astype(jnp.float32)
    if scaling_factor != 1.0:
        pos = pos / scaling_factor
    freqs = pos[..., None] * inv_freq  # [B, L, Dh/2]
    cos = jnp.cos(freqs)[:, :, None, :]
    sin = jnp.sin(freqs)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _attention_block(p, cfg: Qwen2Config, x: Array, mask: Optional[Array],
                     positions: Array, cache_ctx=None,
                     meta_bits: Optional[Array] = None,
                     kv_rowmask: Optional[Array] = None):
    """``cache_ctx``: None, or ``(leaves, layer_idx, cache_index)`` where
    ``leaves`` are the FULL layer-stacked cache arrays. The chunk's K/V are
    written with one dynamic_update_slice into the stacked buffers — inside
    the layer scan that update aliases the loop carry, so each step writes
    only the new tokens instead of re-stacking every layer's whole cache
    slice through scan ys (~0.7GB/step of pure copy at serving batch 32)."""
    b, l, _ = x.shape
    h, kvh, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if _is_quant(p["q"]):
        # q/k/v share the input: quantize activations once for all three
        from ..ops.quantization import quantize_activations
        xq, xs = quantize_activations(x)
        q = _quant_prequant(p["q"], xq, xs, x.dtype)
        k = _quant_prequant(p["k"], xq, xs, x.dtype)
        v = _quant_prequant(p["v"], xq, xs, x.dtype)
        # QLoRA: bf16 adapters over the int8 base (per-projection — targets
        # may cover only a subset, e.g. the attention-q/v-only recipe)
        q, k, v = (y + _lora_delta(pp, x) if "lora_a" in pp else y
                   for y, pp in ((q, p["q"]), (k, p["k"]), (v, p["v"])))
        q = q.reshape(b, l, h, dh)
        k = k.reshape(b, l, kvh, dh)
        v = v.reshape(b, l, kvh, dh)
    else:
        q = _dense(p["q"], x).reshape(b, l, h, dh)
        k = _dense(p["k"], x).reshape(b, l, kvh, dh)
        v = _dense(p["v"], x).reshape(b, l, kvh, dh)
    q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling_factor)
    k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling_factor)

    new_cache = None
    kv_format = cfg.kv_layout
    if cache_ctx is not None and len(cache_ctx[0]) == 4:
        # int8 cache: quantize the incoming chunk; attention applies the scales
        # post-matmul so the cache is never expanded to a bf16 temp
        from ..ops.attention import dot_product_attention_q8
        (ck, cv, cks, cvs), li, cache_index = cache_ctx
        kq, ks_new = _kv_quantize(k)
        vq, vs_new = _kv_quantize(v)
        ck = _cache_write(ck, kq, li, cache_index, kv_format)
        cv = _cache_write(cv, vq, li, cache_index, kv_format)
        cks = _cache_write(cks, ks_new, li, cache_index, kv_format)
        cvs = _cache_write(cvs, vs_new, li, cache_index, kv_format)
        out = dot_product_attention_q8(
            q,
            jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(cks, li, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(cvs, li, 0, keepdims=False),
            mask=mask, kv_format=kv_format)
        out = out.reshape(b, l, h * dh)
        return _dense(p["o"], out), (ck, cv, cks, cvs)
    elif cache_ctx is not None:
        (ck, cv), li, cache_index = cache_ctx
        ck = _cache_write(ck, k, li, cache_index, kv_format)
        cv = _cache_write(cv, v, li, cache_index, kv_format)
        k = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
        new_cache = (ck, cv)
        if kv_rowmask is not None:
            # per-row key-visibility mask (t2i chunk step): the whole attention
            # problem runs in VMEM — the [B, H, Lq, S] logits never touch HBM
            from ..ops.chunk_attention import chunk_attention
            if kv_format != "bskd":
                # kernel expects [B, S, KVH, Dh]; the chunk kernel is opt-in
                # (dead-by-default, BENCH.md) so the transpose is acceptable
                perm = (2, 0, 1, 3) if kv_format == "skbd" else (0, 2, 1, 3)
                k = jnp.transpose(k, perm)
                v = jnp.transpose(v, perm)
            out = chunk_attention(q, k, v, kv_rowmask)
            return _dense(p["o"], out.reshape(b, l, h * dh)), new_cache

    if meta_bits is not None:
        # Pallas kernel: omni mask computed on the fly, zero HBM mask traffic
        # (interpret mode off-TPU so CPU CI exercises the same code path)
        from ..ops.flash_attention import flash_attention
        out = flash_attention(q, k.astype(q.dtype), v.astype(q.dtype), meta_bits,
                              interpret=jax.default_backend() != "tpu")
    else:
        out = dot_product_attention(q, k.astype(q.dtype), v.astype(q.dtype), mask=mask,
                                    kv_format=kv_format if new_cache is not None
                                    else "bskd")
    out = out.reshape(b, l, h * dh)
    return _dense(p["o"], out), new_cache


def _mlp_block(p, x: Array) -> Array:
    if _is_quant(p["gate"]):
        # gate/up share the input: one activation quantization for both
        from ..ops.quantization import quantize_activations
        xq, xs = quantize_activations(x)
        gate = _quant_prequant(p["gate"], xq, xs, x.dtype)
        up = _quant_prequant(p["up"], xq, xs, x.dtype)
        if "lora_a" in p["gate"]:
            gate = gate + _lora_delta(p["gate"], x)
        if "lora_a" in p["up"]:
            up = up + _lora_delta(p["up"], x)
        return _dense(p["down"], jax.nn.silu(gate) * up)
    return _dense(p["down"], jax.nn.silu(_dense(p["gate"], x)) * _dense(p["up"], x))


def _layer(p, cfg: Qwen2Config, x, mask, positions, cache_ctx=None,
           meta_bits=None, kv_rowmask=None):
    attn_out, new_cache = _attention_block(
        p["attn"], cfg, rms_norm(x, p["input_ln"]["scale"], cfg.rms_norm_eps),
        mask, positions, cache_ctx, meta_bits=meta_bits, kv_rowmask=kv_rowmask)
    x = x + attn_out
    x = x + _mlp_block(p["mlp"], rms_norm(x, p["post_ln"]["scale"], cfg.rms_norm_eps))
    return x, new_cache


def embed(params: PyTree, input_ids: Array) -> Array:
    return jnp.take(params["embed"]["weight"], input_ids, axis=0)


def forward(
    params: PyTree,
    cfg: Qwen2Config,
    *,
    input_ids: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    mask: Optional[Array] = None,        # [B,1,Lq,Lk] bool (True = visible)
    meta: Optional[AttnMeta] = None,
    positions: Optional[Array] = None,   # [B, Lq]
    cache: Optional[KVCache] = None,
    remat: bool = False,
    use_flash: Optional[bool] = None,
    kv_rowmask: Optional[Array] = None,  # [B, S] key visibility (chunk kernel)
) -> Tuple[Array, Optional[KVCache]]:
    """Backbone forward. Returns (hidden_states [B, L, D], updated cache or None).

    Without a cache this is the training/prefill path; with a cache the incoming
    chunk is written at ``cache.index`` and attention runs against the full cache.

    With ``meta`` (AttnMeta) and no cache, the Pallas omni-mask kernel is used on
    TPU (``use_flash=None`` auto-selects; True/False forces).
    """
    if inputs_embeds is None:
        inputs_embeds = embed(params, input_ids)
    x = inputs_embeds.astype(cfg.dtype)
    b, l, _ = x.shape

    if positions is None:
        start = cache.index if cache is not None else 0
        if jnp.ndim(start) == 1:  # per-row index: each slot at its own position
            positions = start[:, None] + jnp.arange(l)[None, :]
        else:
            positions = start + jnp.arange(l)[None, :]
        positions = jnp.broadcast_to(positions, (b, l))

    meta_bits = None
    if meta is not None and cache is None:
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu" and cfg.head_dim % 128 == 0
        if use_flash:
            from ..ops.flash_attention import pack_meta
            meta_bits = pack_meta(meta)
    if mask is None and meta is not None and meta_bits is None:
        mask = meta.visibility()
    if mask is None and cache is None:
        pos = jnp.arange(l)
        mask = jnp.broadcast_to((pos[:, None] >= pos[None, :])[None, None], (b, 1, l, l))
    if kv_rowmask is not None and cache is not None and cache.quantized:
        raise NotImplementedError(
            "kv_rowmask (chunk-attention kernel) does not support the int8 KV "
            "cache — the quantized branch would silently ignore the mask")
    if cache is not None and mask is None and kv_rowmask is None:
        # Decode-step mask: attend to every cache slot < index + this chunk (causal
        # within the chunk).
        s = cache_len(cfg, cache)
        kpos = jnp.arange(s)[None, None, None, :]
        idx = (cache.index[:, None, None, None] if jnp.ndim(cache.index) == 1
               else cache.index)
        qpos = idx + jnp.arange(l)[None, None, :, None]
        mask = jnp.broadcast_to(kpos <= qpos, (b, 1, l, s))

    if cache is not None:
        # the stacked cache rides in the scan CARRY and each layer updates it
        # with one dynamic_update_slice — aliased in place by XLA, so a decode
        # step writes only the new tokens (scanning it through xs/ys instead
        # would re-stack every layer's full cache slice each step)
        leaves = ((cache.k, cache.v, cache.k_scale, cache.v_scale)
                  if cache.quantized else (cache.k, cache.v))

        def body_cache(carry, li):
            xc, lv = carry
            lp = jax.tree.map(
                lambda pp: jax.lax.dynamic_index_in_dim(pp, li, 0, keepdims=False),
                params["layers"])
            out, lv = _layer(lp, cfg, xc, mask, positions, (lv, li, cache.index),
                             kv_rowmask=kv_rowmask)
            return (out, lv), None

        (x, leaves), _ = jax.lax.scan(body_cache, (x, leaves),
                                      jnp.arange(cfg.num_hidden_layers))
        new_cache = KVCache(leaves[0], leaves[1], cache.index + l,
                            *(leaves[2:] if cache.quantized else ()))
    else:
        def body(carry, layer_params):
            out, _ = _layer(layer_params, cfg, carry, mask, positions,
                            meta_bits=meta_bits)
            return out, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None

    x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)
    return x, new_cache


def lm_head_weight(params: PyTree, cfg: Qwen2Config) -> Array:
    """[D, V] output projection (tied to the embedding unless untied)."""
    if cfg.tie_word_embeddings and "lm_head" not in params:
        return params["embed"]["weight"].T
    return params["lm_head"]["kernel"]


def logits(params: PyTree, cfg: Qwen2Config, hidden: Array,
           vocab_slice: Optional[Tuple[int, int]] = None) -> Array:
    """Project hidden states to (a slice of) the vocabulary.

    ``vocab_slice=(start, end)`` computes only those output columns — the t2i
    sampler needs just the 8192-entry image vocabulary, so slicing the weight
    *before* the matmul turns a 160k-wide head into an 8k-wide one
    (reference slices logits *after* the full matmul, unigen.py:416).

    A pre-quantized head (``lm_head_q``, ops/quantization.py::quantize_lm_head)
    is picked up automatically: halves the decode loop's dominant 160k-wide
    weight read.
    """
    if "lm_head_q" in params:
        p = params["lm_head_q"]
        if "kernel_int4" in p:
            # W4A8 head (ops/int4.py): packing is along K, so output-column
            # slices stay contiguous in the packed layout
            from ..ops.int4 import dense_int4
            if vocab_slice is not None:
                a, b = vocab_slice
                p = {"kernel_int4": p["kernel_int4"][:, a:b],
                     "scale4": p["scale4"][:, a:b], "bias": p["bias"][a:b]}
            return dense_int4(p, hidden)
        from ..ops.quantization import dense_int8
        if vocab_slice is not None:
            p = {"kernel_int8": p["kernel_int8"][:, vocab_slice[0]:vocab_slice[1]],
                 "scale": p["scale"][vocab_slice[0]:vocab_slice[1]]}
        return dense_int8(p, hidden)
    w = lm_head_weight(params, cfg)
    if vocab_slice is not None:
        w = w[:, vocab_slice[0]:vocab_slice[1]]
    return hidden @ w


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------

def convert_hf_state_dict(sd: dict, cfg: Qwen2Config, prefix: str = "model.") -> PyTree:
    """Map a HuggingFace Qwen2ForCausalLM state dict (numpy arrays) to our pytree.

    Accepts the key layout of ``Qwen2ForCausalLM.state_dict()``; used for weight
    parity against the reference checkpoints (BASELINE.md config #2).
    """
    import numpy as np

    def get(name):
        return np.asarray(sd[name])

    def stack(fmt, transpose=False):
        ws = [get(fmt.format(i)) for i in range(cfg.num_hidden_layers)]
        out = np.stack([w.T if transpose else w for w in ws])
        return jnp.asarray(out, cfg.dtype)

    params = {
        "embed": {"weight": jnp.asarray(get(prefix + "embed_tokens.weight"), cfg.dtype)},
        "layers": {
            "input_ln": {"scale": stack(prefix + "layers.{}.input_layernorm.weight")},
            "attn": {
                "q": {"kernel": stack(prefix + "layers.{}.self_attn.q_proj.weight", True),
                      "bias": stack(prefix + "layers.{}.self_attn.q_proj.bias")},
                "k": {"kernel": stack(prefix + "layers.{}.self_attn.k_proj.weight", True),
                      "bias": stack(prefix + "layers.{}.self_attn.k_proj.bias")},
                "v": {"kernel": stack(prefix + "layers.{}.self_attn.v_proj.weight", True),
                      "bias": stack(prefix + "layers.{}.self_attn.v_proj.bias")},
                "o": {"kernel": stack(prefix + "layers.{}.self_attn.o_proj.weight", True)},
            },
            "post_ln": {"scale": stack(prefix + "layers.{}.post_attention_layernorm.weight")},
            "mlp": {
                "gate": {"kernel": stack(prefix + "layers.{}.mlp.gate_proj.weight", True)},
                "up": {"kernel": stack(prefix + "layers.{}.mlp.up_proj.weight", True)},
                "down": {"kernel": stack(prefix + "layers.{}.mlp.down_proj.weight", True)},
            },
        },
        "final_ln": {"scale": jnp.asarray(get(prefix + "norm.weight"), cfg.dtype)},
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        import numpy as np
        params["lm_head"] = {"kernel": jnp.asarray(np.asarray(sd["lm_head.weight"]).T, cfg.dtype)}
    return params
