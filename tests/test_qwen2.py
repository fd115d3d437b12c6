"""Parity tests: our JAX Qwen2 backbone vs HuggingFace Qwen2ForCausalLM (torch CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import qwen2 as Q

TINY = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, rope_theta=10000.0)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=TINY["vocab_size"], hidden_size=TINY["hidden_size"],
        intermediate_size=TINY["intermediate_size"],
        num_hidden_layers=TINY["num_hidden_layers"],
        num_attention_heads=TINY["num_attention_heads"],
        num_key_value_heads=TINY["num_key_value_heads"],
        head_dim=TINY["head_dim"],
        max_position_embeddings=256, rope_theta=TINY["rope_theta"],
        rms_norm_eps=1e-6, tie_word_embeddings=True, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Qwen2ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    cfg = Q.Qwen2Config(dtype=jnp.float32, tie_word_embeddings=True,
                        max_position_embeddings=256, **TINY)
    params = Q.convert_hf_state_dict(sd, cfg)
    return hf_model, cfg, params


def test_logits_parity(hf_pair):
    import torch
    hf_model, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    hidden, _ = Q.forward(params, cfg, input_ids=jnp.asarray(ids))
    ours = np.asarray(Q.logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_custom_mask_parity(hf_pair):
    """4D additive masks (the omni mask path) must agree with HF's 4D-mask path."""
    import torch
    hf_model, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    b, l = 2, 10
    ids = rng.integers(0, cfg.vocab_size, size=(b, l))
    vis = rng.random((b, 1, l, l)) > 0.3
    vis |= np.eye(l, dtype=bool)[None, None]  # each token sees itself
    additive = np.where(vis, 0.0, np.finfo(np.float32).min).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids), attention_mask=torch.tensor(additive)).logits.numpy()
    hidden, _ = Q.forward(params, cfg, input_ids=jnp.asarray(ids), mask=jnp.asarray(vis))
    ours = np.asarray(Q.logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_kv_cache_decode_matches_full_forward(hf_pair):
    _, cfg, params = hf_pair
    rng = np.random.default_rng(2)
    b, l = 2, 9
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, l)))

    full_hidden, _ = Q.forward(params, cfg, input_ids=ids)

    cache = Q.init_kv_cache(cfg, b, max_len=16, dtype=jnp.float32)
    prefill_hidden, cache = Q.forward(params, cfg, input_ids=ids[:, :5], cache=cache)
    np.testing.assert_allclose(np.asarray(prefill_hidden), np.asarray(full_hidden[:, :5]),
                               atol=1e-5, rtol=1e-5)
    hs = [prefill_hidden]
    for t in range(5, l):
        h, cache = Q.forward(params, cfg, input_ids=ids[:, t:t + 1], cache=cache)
        hs.append(h)
    stepwise = np.concatenate([np.asarray(h) for h in hs], axis=1)
    np.testing.assert_allclose(stepwise, np.asarray(full_hidden), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("layout", ["skbd", "bhsd"])
def test_kv_layout_matches_batch_major(hf_pair, quantize, layout):
    """Alternate cache storage orders (cfg.kv_layout: seq-major "skbd",
    head-major "bhsd") are pure storage-order changes: prefill + decode must
    match the default batch-major layout (same quantization points, same
    arithmetic — gated at fp32 tolerance)."""
    import dataclasses
    _, cfg, params = hf_pair
    cfg_sm = dataclasses.replace(cfg, kv_layout=layout)
    rng = np.random.default_rng(3)
    b, l = 2, 9
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, l)))

    outs = []
    for c in (cfg, cfg_sm):
        cache = Q.init_kv_cache(c, b, max_len=16, quantize=quantize,
                                dtype=jnp.float32)
        hs, cache = Q.forward(params, c, input_ids=ids[:, :5], cache=cache)
        parts = [hs]
        for t in range(5, l):
            h, cache = Q.forward(params, c, input_ids=ids[:, t:t + 1], cache=cache)
            parts.append(h)
        outs.append(np.concatenate([np.asarray(h) for h in parts], axis=1))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("layout", ["skbd", "bhsd"])
def test_kv_layout_per_row_index_matches(hf_pair, layout):
    """Serving-style per-row cache ages: decode with each row at its own index
    must agree across layouts (the vmapped scatter write path)."""
    import dataclasses
    _, cfg, params = hf_pair
    cfg_sm = dataclasses.replace(cfg, kv_layout=layout)
    rng = np.random.default_rng(4)
    b, smax = 3, 12
    lens = np.array([4, 2, 5])
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, smax)))

    outs = []
    for c in (cfg, cfg_sm):
        cache = Q.init_kv_cache(c, b, max_len=smax, per_row_index=True,
                                dtype=jnp.float32)
        # simulate per-row prefill by writing each row's prompt one token at a
        # time at its own position (rows advance together but from different
        # starting ages after this seed step)
        cache = cache._replace(index=jnp.asarray(lens, jnp.int32))
        steps = []
        tok = ids[:, 0:1]
        for t in range(3):
            h, cache = Q.forward(params, c, input_ids=tok, cache=cache)
            steps.append(np.asarray(h))
            tok = ids[:, t + 1:t + 2]
        outs.append(np.concatenate(steps, axis=1))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5, rtol=1e-5)


def test_logits_vocab_slice(hf_pair):
    _, cfg, params = hf_pair
    ids = jnp.asarray([[1, 2, 3]])
    hidden, _ = Q.forward(params, cfg, input_ids=ids)
    full = Q.logits(params, cfg, hidden)
    part = Q.logits(params, cfg, hidden, vocab_slice=(100, 200))
    np.testing.assert_allclose(np.asarray(part), np.asarray(full[..., 100:200]),
                               atol=1e-6)


def test_remat_matches(hf_pair):
    _, cfg, params = hf_pair
    ids = jnp.asarray([[4, 5, 6, 7]])
    h1, _ = Q.forward(params, cfg, input_ids=ids)
    h2, _ = Q.forward(params, cfg, input_ids=ids, remat=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
