"""Text-to-image samplers: MaskGIT parallel decoding and autoregressive decoding.

TPU-first re-design of the reference samplers (reference: models/unigen.py:344-521):

* ``t2i_generate`` fuses the whole T-step MaskGIT loop (reference :398-454) into one
  jitted ``lax.scan``: the prefix/suffix embeddings and the omni attention mask are
  computed once outside the loop; each step re-embeds only the 256 image tokens. The
  classifier-free-guidance pair rides as a doubled batch.
* image logits come from a *sliced* head matmul (8k-wide) instead of the reference's
  full 160k-vocab lm_head followed by a slice (unigen.py:416).
* ``t2i_generate_ar`` (reference :457-521) runs prefill + a 256-step ``lax.scan``
  over a real KV cache.

All sampling is exact MaskGIT semantics: multinomial over softmax probabilities,
confidence re-masking with annealed Gumbel noise, mask_len schedule with the
keep-at-least-one / mask-at-least-one clamps, and the reference's *compounding*
temperature decay (``temperature *= (1 - ratio)`` rebinds each step, unigen.py:444).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import qwen2
from ..models.unigen import UniGenConfig, get_gen_embed, embed_tokens
from ..ops import sampling as S

Array = jax.Array


def _image_head(params, cfg: UniGenConfig, hidden: Array) -> Array:
    """Codebook logits for image positions — sliced matmul, fp32 accumulate.

    If the param tree carries a pre-quantized head (``img_head_q``, added by
    ``quantize_unigen_params(..., cfg)``), runs it W8A8 on the MXU's int8 path.
    """
    if "img_head_q" in params:
        from ..ops.quantization import dense_int8
        return dense_int8(params["img_head_q"], hidden).astype(jnp.float32)
    if cfg.use_gen_projector:
        w = params["img_head"]["kernel"]
        return (hidden @ w.astype(hidden.dtype)).astype(jnp.float32)
    w = qwen2.lm_head_weight(params["llm"], cfg.llm)
    w = jax.lax.dynamic_slice_in_dim(w, cfg.text_vocab_len, cfg.codebook_size, axis=1)
    return (hidden @ w.astype(hidden.dtype)).astype(jnp.float32)


def _cfg_head_logits(params, cfg: UniGenConfig, hidden_img: Array, bsz: int,
                     use_cfg: bool, guidance_scale: float, cfg_combine: str) -> Array:
    """Image-head logits with classifier-free guidance.

    ``cfg_combine="hidden"`` (default, fast): the head is a bias-free linear
    map, so the CFG combine commutes with it — blend the cond/uncond *hidden*
    states first and run ONE head matmul on B rows instead of 2B. Halves head
    FLOPs and never materializes the [2B, N, CB] fp32 logits tensor.
    ``cfg_combine="logits"``: the reference's exact operation order
    (g*(cond-uncond)+uncond on fp32 logits, unigen.py:409-414) — used by the
    cross-framework token-parity tests.

    With an int8 head (``img_head_q``), the hidden-combine path quantizes the
    *blended* activations — the result is the fp32 CFG formula plus bounded
    W8A8 noise (the head is linear in fp32; quantization is the only extra
    error term), which is exactly what the per-step token-agreement gate in
    tests/test_quantization.py measures (int8-blend vs fp32-blend).
    """
    if use_cfg and cfg_combine == "hidden":
        hc = hidden_img[:bsz].astype(jnp.float32)
        hu = hidden_img[bsz:].astype(jnp.float32)
        blended = (guidance_scale * (hc - hu) + hu).astype(hidden_img.dtype)
        return _image_head(params, cfg, blended)
    logits = _image_head(params, cfg, hidden_img)
    if use_cfg:
        cond, uncond = logits[:bsz], logits[bsz:]
        logits = guidance_scale * (cond - uncond) + uncond
    return logits


def _embed_image_tokens(params, cfg: UniGenConfig, ids_cb: Array) -> Array:
    """Codebook-space ids (mask marker = cfg.mask_token_id) -> embeddings."""
    if cfg.use_gen_projector:
        return get_gen_embed(params, ids_cb)
    unified = jnp.where(ids_cb == cfg.mask_token_id, cfg.mask_token_id,
                        ids_cb + cfg.text_vocab_len)
    return embed_tokens(params, unified)


def t2i_generate(
    params,
    cfg: UniGenConfig,
    key: Array,
    input_ids: Array,                      # [B, L] cond prompt (image block = mask ids)
    attention_mask: Array,                 # [RB, 1, L, L] bool (cond rows then uncond)
    uncond_input_ids: Optional[Array] = None,
    temperature: float = 1.0,
    timesteps: int = 18,
    guidance_scale: float = 0.0,
    noise_schedule: Callable[[Array], Array] = S.cosine_schedule,
    image_token_num_per_image: Optional[int] = None,
    reuse_prefix_cache: bool = True,
    pad_id: Optional[int] = None,
    noise: Optional[Tuple[Array, Array]] = None,
    cfg_combine: str = "hidden",
    chunk_kernel: Optional[bool] = None,
) -> Array:
    """MaskGIT masked-token parallel decoding (reference: models/unigen.py:344-455).

    Returns [B, N] codebook-space token ids.

    With ``reuse_prefix_cache`` (default) the text prefix — which is causal-only
    and therefore *constant across all T steps* — is prefilled into a KV cache
    once; each step then forwards only the n+2 [soi][img][eoi] tokens against it
    (~33% fewer FLOPs at the GenEval shape vs the reference's full re-forward,
    unigen.py:398-406). Token-exact vs the full path. ``pad_id`` enables the
    cached path to exclude left-padding keys (defaults to the id at position 0
    when padding is present is NOT inferred — pass it; without it and without
    padding the mask reduces to all-visible prefix).

    ``noise`` is the shared-noise hook for cross-framework token-parity tests:
    a pair of pre-drawn uniform[0,1) arrays (u_sample [T,B,N,CB], u_mask [T,B,N])
    consumed instead of the PRNG key — two samplers fed identical noise and
    identical logits emit identical tokens (tests/test_model_parity.py drives
    the torch reference through the same arrays).

    ``cfg_combine`` — NOTE the default DIVERGES from the reference's operation
    order: the reference applies CFG on fp32 logits (unigen.py:409-414);
    ``"hidden"`` (default) blends the cond/uncond *hidden states* and runs one
    head matmul, which is algebraically identical for the bias-free linear
    head but changes the rounding story under bf16/int8. The default path is
    gated by agreement tests at flagship layer widths in BOTH regimes
    (tests/test_quantization.py::test_t2i_cfg_combine_hidden_matches_logits,
    ::test_t2i_cfg_combine_hidden_bf16_flagship_gate); pass
    ``cfg_combine="logits"`` for the reference's exact op order (the
    cross-framework parity tests pin it).
    """
    if cfg_combine not in ("hidden", "logits"):
        raise ValueError(
            f"cfg_combine must be 'hidden' or 'logits', got {cfg_combine!r}")
    n = image_token_num_per_image or cfg.num_vq_tokens
    if reuse_prefix_cache:
        return _t2i_generate_prefix_cached(
            params, cfg, key, input_ids, uncond_input_ids, temperature, timesteps,
            guidance_scale, noise_schedule, n, pad_id, noise, cfg_combine,
            chunk_kernel)
    return _t2i_generate_full(
        params, cfg, key, input_ids, attention_mask, uncond_input_ids, temperature,
        timesteps, guidance_scale, noise_schedule, n, noise, cfg_combine)


def _t2i_generate_full(params, cfg, key, input_ids, attention_mask, uncond_input_ids,
                       temperature, timesteps, guidance_scale, noise_schedule, n,
                       noise=None, cfg_combine="hidden"):
    """Reference-shaped path: full forward over the whole sequence each step."""
    mask_id = cfg.mask_token_id
    bsz = input_ids.shape[0]
    use_cfg = guidance_scale > 1

    input_embeddings = embed_tokens(params, input_ids)
    prefix = input_embeddings[:, :-(n + 1)]
    suffix = input_embeddings[:, -1:]
    if use_cfg:
        uncond_embeddings = embed_tokens(params, uncond_input_ids)
        prefix = jnp.concatenate([prefix, uncond_embeddings[:, :-(n + 1)]], axis=0)
        suffix = jnp.concatenate([suffix, suffix], axis=0)
    repeat_n = 2 if use_cfg else 1

    # image block starts all-masked in codebook space
    if cfg.use_gen_projector:
        init_ids = input_ids[:, -(n + 1):-1]
    else:
        raw = input_ids[:, -(n + 1):-1]
        init_ids = jnp.where(raw == mask_id, mask_id, raw - cfg.text_vocab_len)

    def step(carry, xs):
        s, inj = xs
        ids_cb, temp, k = carry
        k, k_sample, k_mask = jax.random.split(k, 3)

        img_embeds = _embed_image_tokens(params, cfg, ids_cb)
        img_embeds = jnp.concatenate([img_embeds] * repeat_n, axis=0)
        embeds = jnp.concatenate([prefix, img_embeds, suffix], axis=1)
        hidden, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=embeds,
                                  mask=attention_mask)
        logits = _cfg_head_logits(params, cfg, hidden[:, -(n + 1):-1], bsz,
                                  use_cfg, guidance_scale, cfg_combine)

        new_ids, sampled, temp = _maskgit_update(
            k_sample, k_mask, logits, ids_cb, s, temp, timesteps, n, mask_id,
            noise_schedule, inj)
        return (new_ids, temp, k), sampled

    init = (init_ids, jnp.asarray(temperature, jnp.float32), key)
    (_, _, _), sampled_seq = jax.lax.scan(step, init, (jnp.arange(timesteps), noise))
    return sampled_seq[-1]


def _maskgit_update(k_sample, k_mask, logits, ids_cb, s, temp, timesteps, n,
                    mask_id, noise_schedule, inj=None):
    """One MaskGIT confidence re-masking step (shared by both t2i paths).

    Sampling runs directly on logits via Gumbel-max — draw-identical to
    categorical-over-softmax (the row-wise logsumexp shift cancels under argmax)
    while skipping the materialized [B, N, 8192] probability tensor.

    ``inj``: optional (u_sample [B,N,CB], u_mask [B,N]) pre-drawn uniforms for
    the shared-noise cross-framework parity mode (see t2i_generate docstring).
    """
    # barrier: keeps XLA from fusing the CFG combine + head matmul + gumbel into
    # one kernel whose stack tile overflows scoped VMEM at batch >= 8
    logits = jax.lax.optimization_barrier(logits)
    if inj is not None:
        noise = -S.safe_log(-S.safe_log(inj[0].astype(logits.dtype)))
    else:
        noise = S.gumbel_noise(k_sample, logits.shape, logits.dtype)
    sampled = jnp.argmax(logits + noise, axis=-1)
    unknown = ids_cb == mask_id
    sampled = jnp.where(unknown, sampled, ids_cb)

    ratio = (s + 1).astype(jnp.float32) / timesteps
    mask_ratio = noise_schedule(ratio)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    selected = jnp.exp(jnp.take_along_axis(logits, sampled[..., None], axis=-1)[..., 0]
                       - lse)
    selected = jnp.where(unknown, selected, jnp.finfo(jnp.float32).max)
    mask_len = jnp.floor(n * mask_ratio)
    mask_len = jnp.maximum(
        1.0, jnp.minimum(unknown.sum(axis=-1, keepdims=True).astype(jnp.float32) - 1.0,
                         mask_len))
    temp = temp * (1.0 - ratio)  # compounding decay, as in the reference
    masking = S.mask_by_random_topk(k_mask, mask_len, selected, temp,
                                    noise=None if inj is None else inj[1])
    new_ids = jnp.where(masking, mask_id, sampled)
    return new_ids, sampled, temp


def _t2i_generate_prefix_cached(params, cfg, key, input_ids, uncond_input_ids,
                                temperature, timesteps, guidance_scale,
                                noise_schedule, n, pad_id, noise=None,
                                cfg_combine="hidden", chunk_kernel=None):
    """Prefix-KV-cached MaskGIT: prefill the causal text prefix once, then per
    step forward only the n+1 image/suffix tokens against the cache.

    ``chunk_kernel`` routes the step attention through the per-row VMEM
    Pallas kernel (ops/chunk_attention.py). Opt-in: measured slower than
    XLA's attention at the GenEval shape (see the kernel's docstring), so
    the default resolves to off. With the kernel, the cache is padded to a
    lane-aligned length and the extra slots masked invisible.
    """
    mask_id = cfg.mask_token_id
    bsz = input_ids.shape[0]
    use_cfg = guidance_scale > 1
    repeat_n = 2 if use_cfg else 1
    if chunk_kernel is None:
        # measured on the v5e chip: the kernel LOSES to XLA's in-graph
        # attention at the GenEval shape (2.6 vs 3.1 img/s) — XLA keeps these
        # modest logits tiles fused; auto therefore resolves to OFF and the
        # kernel stays opt-in (BENCH.md)
        chunk_kernel = False

    # the cacheable prefix is ONLY the causal text: <|soi|> belongs to the
    # bidirectional image segment (reference mask, prompting_utils.py:990), so its
    # hidden state changes with the image tokens and must ride in the step chunk
    prompt = input_ids[:, :-(n + 2)]
    if use_cfg:
        prompt = jnp.concatenate([prompt, uncond_input_ids[:, :-(n + 2)]], axis=0)
    rb, lp = prompt.shape
    chunk_len = n + 2                       # [soi][img x n][eoi]
    total = lp + chunk_len
    # lane-aligned cache for the Pallas kernel; pad slots are never visible
    alloc = ((total + 127) // 128) * 128 if chunk_kernel else total

    keep = jnp.ones((rb, lp), bool) if pad_id is None else (prompt != pad_id)

    # prefill the text prefix (causal over non-pad keys; pads never become
    # visible to image queries so their rows don't matter)
    cache = qwen2.init_kv_cache(cfg.llm, rb, alloc)
    pos = jnp.arange(lp)
    prefill_mask = (pos[:, None] >= pos[None, :])[None, None] & keep[:, None, None, :]
    prefill_mask = jnp.concatenate(
        [jnp.broadcast_to(prefill_mask, (rb, 1, lp, lp)),
         jnp.zeros((rb, 1, lp, alloc - lp), bool)], axis=-1)
    _, cache = qwen2.forward(params["llm"], cfg.llm,
                             inputs_embeds=embed_tokens(params, prompt),
                             mask=prefill_mask, cache=cache)

    soi_emb = embed_tokens(params, input_ids[:, -(n + 2):-(n + 1)])
    eoi_emb = embed_tokens(params, input_ids[:, -1:])
    soi_emb = jnp.concatenate([soi_emb] * repeat_n, axis=0)             # [RB, 1, D]
    eoi_emb = jnp.concatenate([eoi_emb] * repeat_n, axis=0)

    # every chunk query (soi/img/eoi, all bidirectional) sees: non-pad prefix +
    # the whole current chunk
    slot_visible = jnp.concatenate(
        [keep, jnp.ones((rb, chunk_len), bool),
         jnp.zeros((rb, alloc - total), bool)], axis=1)
    step_mask = None if chunk_kernel else jnp.broadcast_to(
        slot_visible[:, None, None, :], (rb, 1, chunk_len, alloc))
    step_rowmask = slot_visible if chunk_kernel else None
    step_positions = jnp.broadcast_to((lp + jnp.arange(chunk_len))[None],
                                      (rb, chunk_len))

    if cfg.use_gen_projector:
        init_ids = input_ids[:, -(n + 1):-1]
    else:
        raw = input_ids[:, -(n + 1):-1]
        init_ids = jnp.where(raw == mask_id, mask_id, raw - cfg.text_vocab_len)

    def step(carry, xs):
        s, inj = xs
        ids_cb, temp, k, cache_c = carry
        k, k_sample, k_mask = jax.random.split(k, 3)
        img_embeds = _embed_image_tokens(params, cfg, ids_cb)
        img_embeds = jnp.concatenate([img_embeds] * repeat_n, axis=0)
        chunk = jnp.concatenate([soi_emb, img_embeds, eoi_emb], axis=1)  # [RB, n+2, D]
        # rewind the write pointer: every step overwrites the same chunk slots
        cache_c = qwen2.KVCache(cache_c.k, cache_c.v, jnp.asarray(lp, jnp.int32))
        hidden, cache_c = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=chunk,
                                        mask=step_mask, positions=step_positions,
                                        cache=cache_c, kv_rowmask=step_rowmask)
        logits = _cfg_head_logits(params, cfg, hidden[:, 1:n + 1], bsz,
                                  use_cfg, guidance_scale, cfg_combine)
        new_ids, sampled, temp = _maskgit_update(
            k_sample, k_mask, logits, ids_cb, s, temp, timesteps, n, mask_id,
            noise_schedule, inj)
        return (new_ids, temp, k, cache_c), sampled

    init = (init_ids, jnp.asarray(temperature, jnp.float32), key, cache)
    _, sampled_seq = jax.lax.scan(step, init, (jnp.arange(timesteps), noise))
    return sampled_seq[-1]


def t2i_generate_ar(
    params,
    cfg: UniGenConfig,
    key: Array,
    input_ids: Array,                      # [B, L] cond prompt incl. image block
    uncond_input_ids: Array,               # [B, L]
    attention_1d: Array,                   # [2B, L] 0/1 padding mask (cond; uncond)
    guidance_scale: float = 0.0,
    temperature: float = 1.0,
    image_token_num_per_image: Optional[int] = None,
    quantized_cache: bool = False,
    noise: Optional[Array] = None,
) -> Array:
    """Autoregressive image generation with CFG and a KV cache
    (reference: models/unigen.py:457-521). Returns [B, N] codebook ids.

    ``noise``: optional pre-drawn uniform[0,1) array [N, B, CB] — the
    shared-noise hook for cross-framework token parity (consumed instead of
    the PRNG key, one slice per generated token; the torch reference consumes
    the same array through a patched ``torch.multinomial``)."""
    n = image_token_num_per_image or cfg.num_vq_tokens
    bsz = input_ids.shape[0]
    prompt = jnp.concatenate([input_ids[:, :-(n + 1)], uncond_input_ids[:, :-(n + 1)]], axis=0)
    lp = prompt.shape[1]
    total = lp + n

    cache = qwen2.init_kv_cache(cfg.llm, 2 * bsz, total, quantize=quantized_cache)
    pad_keep = attention_1d[:, :lp].astype(bool)                       # [2B, Lp]

    # prefill: causal over non-pad prompt tokens, padded out to the cache length
    pos = jnp.arange(lp)
    prefill_mask = (pos[:, None] >= pos[None, :])[None, None] & pad_keep[:, None, None, :]
    prefill_mask = jnp.concatenate(
        [jnp.broadcast_to(prefill_mask, (2 * bsz, 1, lp, lp)),
         jnp.zeros((2 * bsz, 1, lp, total - lp), bool)], axis=-1)
    embeds = embed_tokens(params, prompt)
    hidden, cache = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=embeds,
                                  mask=prefill_mask, cache=cache)

    valid0 = jnp.concatenate([pad_keep, jnp.zeros((2 * bsz, n), bool)], axis=1)  # [2B, S]

    def sample_from(hidden_last, k, inj):
        logits = _image_head(params, cfg, hidden_last)[:, 0]           # [2B, CB]
        cond, uncond = logits[:bsz], logits[bsz:]
        logits = uncond + guidance_scale * (cond - uncond)
        probs = jax.nn.softmax(logits / temperature, axis=-1)
        return S.sample_categorical(k, probs, noise=inj)               # [B]

    k0, key = jax.random.split(key)
    first = sample_from(hidden[:, -1:], k0, None if noise is None else noise[0])

    def step(carry, inj):
        cache_c, valid, tok, k = carry
        k, k_s = jax.random.split(k)
        tok2 = jnp.concatenate([tok, tok], axis=0)                     # [2B, 1] cond+uncond
        emb = _embed_image_tokens(params, cfg, tok2)
        slot = cache_c.index                                           # write position
        valid = valid | (jnp.arange(total) == slot)[None, :]
        mask = valid[:, None, None, :]
        pos_ids = jnp.broadcast_to(slot[None, None], (2 * bsz, 1)).astype(jnp.int32)
        hidden_i, cache_c = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                                          mask=mask, positions=pos_ids, cache=cache_c)
        nxt = sample_from(hidden_i, k_s, inj)
        return (cache_c, valid, nxt[:, None], k), tok[:, 0]

    init = (cache, valid0, first[:, None], key)
    (_, _, last, _), toks = jax.lax.scan(step, init,
                                         None if noise is None else noise[1:],
                                         length=n - 1)
    toks = jnp.moveaxis(toks, 0, 1)                                    # [B, n-1]
    return jnp.concatenate([toks, last], axis=1)
