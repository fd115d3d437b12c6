"""Sampler tests: MaskGIT scan, AR decode, cached mmu decode.

The cached/scanned fast paths are validated against naive full-re-forward loops
(the reference's own algorithm shape, reference models/unigen.py:398-454, 523-581).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.generation import t2i_generate, t2i_generate_ar, mmu_generate, generate_text
from unigen_tpu.models import qwen2, unigen as U
from unigen_tpu.ops import masks as M
from unigen_tpu.ops import sampling as S


@pytest.fixture(scope="module")
def model():
    cfg = U.UniGenConfig.tiny()
    params = U.init(jax.random.key(0), cfg)
    return cfg, params


def _t2i_prompt(cfg, b=2, text_len=6):
    """Prompt: [text tokens][soi][N mask][eoi]; soi=1, eoi=2, pad=0."""
    rng = np.random.default_rng(0)
    n = cfg.num_vq_tokens
    text = rng.integers(3, 100, size=(b, text_len))
    soi = np.full((b, 1), 1)
    eoi = np.full((b, 1), 2)
    img = np.full((b, n), cfg.mask_token_id)
    ids = np.concatenate([text, soi, img, eoi], axis=1)
    return jnp.asarray(ids)


def test_t2i_generate_in_codebook_and_deterministic(model):
    cfg, params = model
    ids = _t2i_prompt(cfg)
    mask = M.create_attention_mask_predict_next(ids, pad_id=0, soi_id=1, eoi_id=2,
                                                rm_pad_in_image=True)
    out1 = t2i_generate(params, cfg, jax.random.key(7), ids, mask, timesteps=4)
    out2 = t2i_generate(params, cfg, jax.random.key(7), ids, mask, timesteps=4)
    out3 = t2i_generate(params, cfg, jax.random.key(8), ids, mask, timesteps=4)
    assert out1.shape == (2, cfg.num_vq_tokens)
    a = np.asarray(out1)
    assert (a >= 0).all() and (a < cfg.codebook_size).all()
    np.testing.assert_array_equal(a, np.asarray(out2))
    assert (a != np.asarray(out3)).any()


def test_t2i_generate_single_step_matches_manual(model):
    """timesteps=1 must equal a hand-computed single forward + categorical sample."""
    cfg, params = model
    ids = _t2i_prompt(cfg)
    mask = M.create_attention_mask_predict_next(ids, pad_id=0, soi_id=1, eoi_id=2,
                                                rm_pad_in_image=True)
    key = jax.random.key(3)
    out = t2i_generate(params, cfg, key, ids, mask, timesteps=1, temperature=1.0)

    n = cfg.num_vq_tokens
    # manual: same key split sequence as inside the scan step
    _, k_sample, _ = jax.random.split(key, 3)
    embeds = U.embed_tokens(params, ids)
    hidden, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=embeds, mask=mask)
    w = qwen2.lm_head_weight(params["llm"], cfg.llm)[:, cfg.text_vocab_len:
                                                     cfg.text_vocab_len + cfg.codebook_size]
    logits = (hidden[:, -(n + 1):-1] @ w).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    manual = S.sample_categorical(k_sample, probs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(manual))


def test_t2i_generate_cfg_path(model):
    cfg, params = model
    ids = _t2i_prompt(cfg)
    uncond = _t2i_prompt(cfg)
    mask = M.create_attention_mask_predict_next(
        jnp.concatenate([ids, uncond], 0), pad_id=0, soi_id=1, eoi_id=2,
        rm_pad_in_image=True)
    out = t2i_generate(params, cfg, jax.random.key(1), ids, mask,
                       uncond_input_ids=uncond, guidance_scale=2.0, timesteps=3)
    a = np.asarray(out)
    assert a.shape == (2, cfg.num_vq_tokens)
    assert (a >= 0).all() and (a < cfg.codebook_size).all()


def test_t2i_generate_gen_projector_path():
    cfg = U.UniGenConfig.tiny(gen_proj_depth=2)
    params = U.init(jax.random.key(4), cfg)
    b, n = 2, cfg.num_vq_tokens
    rng = np.random.default_rng(2)
    text = rng.integers(3, 100, size=(b, 6))
    ids = np.concatenate([text, np.full((b, 1), 1),
                          np.full((b, n), cfg.mask_token_id), np.full((b, 1), 2)], axis=1)
    ids = jnp.asarray(ids)
    mask = M.create_attention_mask_predict_next(ids, pad_id=0, soi_id=1, eoi_id=2)
    out = t2i_generate(params, cfg, jax.random.key(5), ids, mask, timesteps=3)
    a = np.asarray(out)
    assert (a >= 0).all() and (a < cfg.codebook_size).all()


def test_t2i_generate_ar_matches_naive_greedy(model):
    """Near-zero temperature AR with the KV cache == naive full-forward argmax loop."""
    cfg, params = model
    b = 2
    ids = _t2i_prompt(cfg, b=b)
    uncond = jnp.asarray(np.roll(np.asarray(ids), 1, axis=0))
    att = jnp.ones((2 * b, ids.shape[1]), jnp.int32)
    n = cfg.num_vq_tokens
    g = 1.5

    out = t2i_generate_ar(params, cfg, jax.random.key(0), ids, uncond, att,
                          guidance_scale=g, temperature=1e-5,
                          image_token_num_per_image=n)

    # naive loop: full re-forward each step, argmax
    prompt = jnp.concatenate([ids[:, :-(n + 1)], uncond[:, :-(n + 1)]], axis=0)
    toks = []
    cur = prompt
    w = qwen2.lm_head_weight(params["llm"], cfg.llm)[:, cfg.text_vocab_len:
                                                     cfg.text_vocab_len + cfg.codebook_size]
    for _ in range(n):
        emb = U.embed_tokens(params, cur)
        hidden, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb)
        logits = (hidden[:, -1] @ w).astype(jnp.float32)
        cond, unc = logits[:b], logits[b:]
        logits = unc + g * (cond - unc)
        nxt = jnp.argmax(logits, axis=-1)
        toks.append(nxt)
        nxt2 = jnp.concatenate([nxt, nxt], axis=0)[:, None] + cfg.text_vocab_len
        cur = jnp.concatenate([cur, nxt2], axis=1)
    naive = jnp.stack(toks, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(naive))


def test_mmu_generate_matches_naive_greedy(model):
    """Cached greedy decode == the reference-shaped full-re-forward loop."""
    cfg, params = model
    b = 2
    rng = np.random.default_rng(3)
    # mmu layout: [im_start mmu soi img... eoi text...] then right pad
    n_img = 6
    img = rng.integers(cfg.text_vocab_len, cfg.text_vocab_len + cfg.codebook_size,
                       size=(b, n_img))
    text = rng.integers(3, 100, size=(b, 4))
    head = np.tile([90, 91, 1], (b, 1))
    seq = np.concatenate([head, img, np.full((b, 1), 2), text], axis=1)
    L = seq.shape[1]
    pad_to = L + 2
    seq_p = np.concatenate([seq, np.zeros((b, 2), np.int64)], axis=1)
    ids = jnp.asarray(seq_p)
    prompt_len = jnp.asarray([L, L])

    mmu_mask = M.create_attention_mask_for_mmu(ids, eoi_id=2)
    keep = (jnp.arange(pad_to)[None] < prompt_len[:, None])
    mmu_mask = mmu_mask & keep[:, None, None, :] & keep[:, None, :, None]

    max_new = 5
    out = mmu_generate(params, cfg, jax.random.key(0), input_ids=ids,
                       attention_mask=mmu_mask, prompt_len=prompt_len,
                       max_new_tokens=max_new, temperature=0.0)

    # naive: grow the unpadded sequence, full forward with the omni mask each step
    cur = jnp.asarray(seq)
    outs = []
    for _ in range(max_new):
        m = M.create_attention_mask_for_mmu(cur, eoi_id=2)
        emb = U.embed_tokens(params, cur)
        hidden, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb, mask=m)
        logits = qwen2.logits(params["llm"], cfg.llm, hidden[:, -1]).astype(jnp.float32)
        nxt = jnp.argmax(logits, axis=-1)
        outs.append(nxt)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    naive = jnp.stack(outs, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(naive))


def test_mmu_generate_eot_stopping(model):
    cfg, params = model
    ids = jnp.asarray(np.random.default_rng(4).integers(3, 100, size=(1, 8)))
    mask = M.causal_mask_from_attention(jnp.ones((1, 8), jnp.int32))
    out = mmu_generate(params, cfg, jax.random.key(0), input_ids=ids,
                       attention_mask=mask, prompt_len=jnp.asarray([8]),
                       max_new_tokens=6, temperature=0.0, eot_token=None)
    assert out.shape == (1, 6)
    # force eot: whatever argmax emits first becomes the stop token
    first = int(out[0, 0])
    out2 = mmu_generate(params, cfg, jax.random.key(0), input_ids=ids,
                        attention_mask=mask, prompt_len=jnp.asarray([8]),
                        max_new_tokens=6, temperature=0.0, eot_token=first)
    assert (np.asarray(out2)[0] == first).all()


def test_generate_text_ragged_batch(model):
    """Right-padded ragged prompts must decode like their unpadded counterparts."""
    cfg, params = model
    rng = np.random.default_rng(5)
    a = rng.integers(3, 100, size=(1, 5))
    b = rng.integers(3, 100, size=(1, 8))
    ids = np.zeros((2, 8), np.int64)
    ids[0, :5] = a
    ids[1] = b
    out = generate_text(params, cfg, jax.random.key(0), jnp.asarray(ids),
                        prompt_len=jnp.asarray([5, 8]), max_new_tokens=4)
    # row 0 alone, unpadded
    solo = generate_text(params, cfg, jax.random.key(0), jnp.asarray(a),
                         prompt_len=jnp.asarray([5]), max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(out)[0], np.asarray(solo)[0])


def test_t2i_prefix_cached_matches_full_path(model):
    """The prefix-KV-cached sampler must produce the same tokens as the
    reference-shaped full re-forward path (same key, same math)."""
    cfg, params = model
    rng = np.random.default_rng(11)
    n = cfg.num_vq_tokens
    b = 2
    text = rng.integers(3, 100, size=(b, 6))
    ids = np.concatenate([np.zeros((b, 2), np.int64),  # left padding (pad_id=0)
                          text, np.full((b, 1), 1),
                          np.full((b, n), cfg.mask_token_id),
                          np.full((b, 1), 2)], axis=1)
    ids = jnp.asarray(ids)
    uncond = jnp.asarray(np.roll(np.asarray(ids), 1, axis=0))
    mask = M.create_attention_mask_predict_next(
        jnp.concatenate([ids, uncond], 0), pad_id=0, soi_id=1, eoi_id=2,
        rm_pad_in_image=True)
    kwargs = dict(uncond_input_ids=uncond, guidance_scale=2.0, timesteps=4,
                  temperature=1.0)
    full = t2i_generate(params, cfg, jax.random.key(5), ids, mask,
                        reuse_prefix_cache=False, **kwargs)
    cached = t2i_generate(params, cfg, jax.random.key(5), ids, mask,
                          reuse_prefix_cache=True, pad_id=0, **kwargs)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))
    # per-row VMEM chunk-attention kernel (interpret mode off-TPU): same tokens
    kernel = t2i_generate(params, cfg, jax.random.key(5), ids, mask,
                          reuse_prefix_cache=True, pad_id=0, chunk_kernel=True,
                          **kwargs)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(kernel))
