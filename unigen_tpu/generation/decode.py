"""Understanding / text decode with a real prefix-LM KV cache.

The reference's ``mmu_generate`` re-forwards the whole growing sequence each step
and grows its [L,L] float mask by hstack/vstack (reference: models/unigen.py:523-581,
an O(n·L²) "FIXME" path). Here: one prefill over the prompt with the omni mmu mask
(bidirectional image prefix), then a jitted ``lax.scan`` decode that reads the KV
cache — O(n·L).

Supports batch decoding with right-padded ragged prompts: each row tracks its own
prompt length for RoPE positions; padding slots are never visible. Stop tokens are
handled inside the scan with a done flag (output stays fixed-shape; finished rows
keep emitting the stop token).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import qwen2
from ..models.unigen import UniGenConfig, embed_tokens
from ..ops import sampling as S

Array = jax.Array


def _sample_step(key: Array, logits: Array, temperature: float, top_k: Optional[int],
                 inj: Optional[Array] = None) -> Array:
    """Greedy (temperature==0) or temperature/top-k sampling (reference :561-570).

    ``inj``: pre-drawn uniform[0,1) noise [B, V] consumed instead of the key
    (shared-noise cross-framework parity mode)."""
    if temperature > 0:
        logits = logits / temperature
        if top_k is not None:
            kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][..., -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        return S.sample_categorical(key, probs, noise=inj)
    return jnp.argmax(logits, axis=-1)


def _decode_loop(params, cfg: UniGenConfig, key, cache, valid, first_tok, prompt_len,
                 max_new_tokens, temperature, top_k, eot_token, noise=None):
    """Shared cached decode: first_tok is the token sampled from prefill."""
    total = qwen2.cache_len(cfg.llm, cache)
    b = valid.shape[0]
    eot = -1 if eot_token is None else eot_token

    def step(carry, inj):
        cache_c, valid_c, tok, done, k, t = carry
        k, k_s = jax.random.split(k)
        emb = embed_tokens(params, tok)
        slot = cache_c.index
        valid_c = valid_c | (jnp.arange(total) == slot)[None, :]
        mask = valid_c[:, None, None, :]
        pos = (prompt_len + t)[:, None].astype(jnp.int32)
        hidden, cache_c = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                                        mask=mask, positions=pos, cache=cache_c)
        logits = qwen2.logits(params["llm"], cfg.llm, hidden[:, -1]).astype(jnp.float32)
        nxt = _sample_step(k_s, logits, temperature, top_k, inj)
        nxt = jnp.where(done, eot, nxt)
        done = done | (nxt == eot) if eot_token is not None else done
        return (cache_c, valid_c, nxt[:, None], done, k, t + 1), tok[:, 0]

    done0 = (first_tok == eot) if eot_token is not None else jnp.zeros((b,), bool)
    # the incoming first_tok is decode-token 0: its RoPE position is prompt_len + 0
    init = (cache, valid, first_tok[:, None], done0, key,
            jnp.zeros((b,), jnp.int32))
    (_, _, last, _, _, _), toks = jax.lax.scan(
        step, init, None if noise is None else noise[1:],
        length=max_new_tokens - 1)
    toks = jnp.moveaxis(toks, 0, 1)
    return jnp.concatenate([toks, last], axis=1)


def mmu_generate(
    params,
    cfg: UniGenConfig,
    key: Array,
    *,
    input_ids: Optional[Array] = None,          # [B, L] (discrete path)
    input_embeddings: Optional[Array] = None,   # [B, L, D] (continuous path)
    attention_mask: Array,                      # [B, 1, L, L] bool omni mmu mask
    prompt_len: Array,                          # [B] valid prompt length per row
    max_new_tokens: int = 100,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    eot_token: Optional[int] = None,
    quantized_cache: bool = False,
    noise: Optional[Array] = None,
) -> Array:
    """VQA / captioning decode (reference: models/unigen.py:523-581), cached.

    Returns [B, max_new_tokens] token ids; rows stop at ``eot_token`` and then
    repeat it. ``quantized_cache`` stores K/V int8 (halves the decode loop's
    cache bandwidth at ~1e-2 relative error). ``noise``: optional pre-drawn
    uniform[0,1) [max_new_tokens, B, V] for the shared-noise parity mode
    (see generation/t2i.py docstrings).
    """
    if input_embeddings is None:
        input_embeddings = embed_tokens(params, input_ids)
    b, l, _ = input_embeddings.shape
    total = l + max_new_tokens

    cache = qwen2.init_kv_cache(cfg.llm, b, total, quantize=quantized_cache)
    pos = jnp.arange(l)[None, :]
    positions = jnp.minimum(pos, prompt_len[:, None] - 1)  # pads collapse, masked anyway
    prefill_mask = jnp.concatenate(
        [attention_mask, jnp.zeros((b, 1, l, total - l), bool)], axis=-1)
    hidden, cache = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=input_embeddings,
                                  mask=prefill_mask, positions=positions, cache=cache)

    # logits at each row's last valid prompt token
    last_idx = (prompt_len - 1)[:, None, None]
    last_hidden = jnp.take_along_axis(hidden, jnp.broadcast_to(
        last_idx, (b, 1, hidden.shape[-1])), axis=1)[:, 0]
    k0, key = jax.random.split(key)
    first = _sample_step(k0, qwen2.logits(params["llm"], cfg.llm, last_hidden
                                          ).astype(jnp.float32), temperature, top_k,
                         None if noise is None else noise[0])

    row_valid = (pos < prompt_len[:, None])
    valid = jnp.concatenate([row_valid, jnp.zeros((b, max_new_tokens), bool)], axis=1)
    return _decode_loop(params, cfg, key, cache, valid, first, prompt_len,
                        max_new_tokens, temperature, top_k, eot_token, noise)


def generate_text(
    params,
    cfg: UniGenConfig,
    key: Array,
    input_ids: Array,                           # [B, L] right-padded
    prompt_len: Array,                          # [B]
    max_new_tokens: int = 100,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    eot_token: Optional[int] = None,
) -> Array:
    """Plain causal text generation (the reference's ``generate`` passthrough to HF,
    models/unigen.py:583-588) with the same cached decode loop."""
    b, l = input_ids.shape
    pos = jnp.arange(l)[None, :]
    keep = pos < prompt_len[:, None]
    causal = (pos[0][:, None] >= pos[0][None, :])[None, None]
    mask = causal & keep[:, None, None, :] & keep[:, None, :, None]
    return mmu_generate(params, cfg, key, input_ids=input_ids, attention_mask=mask,
                        prompt_len=prompt_len, max_new_tokens=max_new_tokens,
                        temperature=temperature, top_k=top_k, eot_token=eot_token)
