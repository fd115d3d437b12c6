"""Int8 W8A8 quantization tests: error bounds + end-to-end backbone agreement."""
import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.models import qwen2 as Q
from unigen_tpu.ops.quantization import (dense_int8, quantize_dense,
                                         quantize_qwen2_params)


def test_dense_int8_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(rng.normal(size=(32,)),
                                                       jnp.float32)}
    qp = quantize_dense(p)
    assert qp["kernel_int8"].dtype == jnp.int8
    ref = x @ w + np.asarray(p["bias"])
    got = np.asarray(dense_int8(qp, jnp.asarray(x)))
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.max() < 0.1  # 8-bit symmetric quantization noise


def test_quantized_backbone_close_to_bf16():
    cfg = Q.Qwen2Config.tiny(vocab_size=256)
    params = Q.init(jax.random.key(0), cfg)
    qparams = quantize_qwen2_params(params)
    assert qparams["layers"]["attn"]["q"]["kernel_int8"].dtype == jnp.int8
    assert "kernel" not in qparams["layers"]["attn"]["q"]
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, size=(2, 10)))
    h_ref, _ = Q.forward(params, cfg, input_ids=ids)
    h_q, _ = Q.forward(qparams, cfg, input_ids=ids)
    ref, got = np.asarray(h_ref, np.float32), np.asarray(h_q, np.float32)
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.995, cos
    # greedy next-token choice is usually preserved on a tiny random model
    l_ref = np.asarray(Q.logits(params, cfg, h_ref[:, -1:]))
    l_q = np.asarray(Q.logits(qparams, cfg, h_q[:, -1:]))
    agree = (l_ref.argmax(-1) == l_q.argmax(-1)).mean()
    assert agree >= 0.5


def test_quantized_kv_cache_decode_runs():
    cfg = Q.Qwen2Config.tiny(vocab_size=128)
    params = quantize_qwen2_params(Q.init(jax.random.key(0), cfg))
    cache = Q.init_kv_cache(cfg, 1, 8, dtype=jnp.float32)
    h, cache = Q.forward(params, cfg, input_ids=jnp.asarray([[1, 2, 3]]), cache=cache)
    h, cache = Q.forward(params, cfg, input_ids=jnp.asarray([[4]]), cache=cache)
    assert np.isfinite(np.asarray(h)).all()


def test_quantized_kv_cache_close_to_bf16():
    """int8 KV cache decode tracks the exact-cache decode closely."""
    cfg = Q.Qwen2Config.tiny(vocab_size=128)
    params = Q.init(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, size=(2, 6)))

    def run(quant):
        cache = Q.init_kv_cache(cfg, 2, 12, dtype=jnp.float32, quantize=quant)
        h, cache = Q.forward(params, cfg, input_ids=ids, cache=cache)
        hs = [h]
        tok = jnp.argmax(Q.logits(params, cfg, h[:, -1:]), axis=-1)
        for _ in range(3):
            h, cache = Q.forward(params, cfg, input_ids=tok, cache=cache)
            hs.append(h)
            tok = jnp.argmax(Q.logits(params, cfg, h[:, -1:]), axis=-1)
        return np.concatenate([np.asarray(x, np.float32) for x in hs], axis=1)

    exact = run(False)
    q = run(True)
    cos = (exact * q).sum() / (np.linalg.norm(exact) * np.linalg.norm(q))
    assert cos > 0.999, cos


def test_mmu_generate_quantized_cache_runs():
    from unigen_tpu.generation import mmu_generate
    from unigen_tpu.models import unigen as UU
    from unigen_tpu.ops import masks as M
    cfg = UU.UniGenConfig.tiny()
    params = UU.init(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(3, 100, size=(1, 8)))
    mask = M.causal_mask_from_attention(jnp.ones((1, 8), jnp.int32))
    out = mmu_generate(params, cfg, jax.random.key(0), input_ids=ids,
                       attention_mask=mask, prompt_len=jnp.asarray([8]),
                       max_new_tokens=4, temperature=0.0, quantized_cache=True)
    assert out.shape == (1, 4)
    out_ref = mmu_generate(params, cfg, jax.random.key(0), input_ids=ids,
                           attention_mask=mask, prompt_len=jnp.asarray([8]),
                           max_new_tokens=4, temperature=0.0)
    # greedy tokens typically agree on a tiny model; require at least the first
    assert int(out[0, 0]) == int(out_ref[0, 0])


def _t2i_gate_setup(b=2, text_len=6, T=6):
    """Tiny UniGen + CFG prompt pair + pre-drawn shared-noise arrays, so two
    sampler configurations can be compared draw-for-draw."""
    from unigen_tpu.models import unigen as UU
    from unigen_tpu.ops import masks as M
    cfg = UU.UniGenConfig.tiny()
    params = UU.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(17)
    n = cfg.num_vq_tokens
    text = rng.integers(3, 100, size=(b, text_len))
    ids = np.concatenate([text, np.full((b, 1), 1),
                          np.full((b, n), cfg.mask_token_id),
                          np.full((b, 1), 2)], axis=1)
    ids = jnp.asarray(ids)
    uncond = jnp.asarray(np.roll(np.asarray(ids), 1, axis=0))
    mask = M.create_attention_mask_predict_next(
        jnp.concatenate([ids, uncond], 0), pad_id=0, soi_id=1, eoi_id=2,
        rm_pad_in_image=True)
    noise = (jnp.asarray(rng.random((T, b, n, cfg.codebook_size)), jnp.float32),
             jnp.asarray(rng.random((T, b, n)), jnp.float32))
    kwargs = dict(uncond_input_ids=uncond, guidance_scale=6.0, timesteps=T,
                  temperature=1.0, noise=noise)
    return cfg, params, ids, mask, kwargs


def test_t2i_int8_token_agreement_gate():
    """Quality gate for shipping W8A8 as the bench default.

    Per-decision metric: with identical pre-drawn noise and identical context
    (one teacher-forced MaskGIT step), the int8 sampler must pick the same
    token as the fp32 sampler on ≥85% of positions at *flagship layer widths*
    (1536-dim hidden, 8960 MLP, 8192 codebook — quantization SNR scales with
    fan-in, so toy widths exaggerate flip rates). The ~5% that flip are
    borderline draws where two candidates sit within quantization noise —
    seed-equivalent divergence, not a quality regression. Multi-step
    final-token agreement is NOT gated: one early flip changes the context
    for every later step (cascade), which measures divergence, not damage.
    """
    from unigen_tpu.generation import t2i_generate
    from unigen_tpu.models import unigen as UU
    from unigen_tpu.models import qwen2 as Q2
    from unigen_tpu.ops import masks as M
    from unigen_tpu.ops.quantization import quantize_unigen_params

    llm = Q2.Qwen2Config(vocab_size=128 + 8192 + 1, hidden_size=1536,
                         intermediate_size=8960, num_hidden_layers=2,
                         num_attention_heads=12, num_key_value_heads=2,
                         head_dim=128, rope_theta=1e6, dtype=jnp.float32)
    cfg = UU.UniGenConfig(llm=llm, vocab_size=128 + 8192 + 1, llm_vocab_size=112,
                          text_vocab_len=128, codebook_size=8192, num_vq_tokens=16)
    params = UU.init(jax.random.key(0), cfg)
    qparams = quantize_unigen_params(params, cfg)
    assert "img_head_q" in qparams and qparams["img_head_q"]["kernel_int8"].dtype == jnp.int8

    rng = np.random.default_rng(17)
    b, n = 2, cfg.num_vq_tokens
    text = rng.integers(3, 100, size=(b, 6))
    ids = jnp.asarray(np.concatenate(
        [text, np.full((b, 1), 1), np.full((b, n), cfg.mask_token_id),
         np.full((b, 1), 2)], axis=1))
    uncond = jnp.asarray(np.roll(np.asarray(ids), 1, axis=0))
    mask = M.create_attention_mask_predict_next(
        jnp.concatenate([ids, uncond], 0), pad_id=0, soi_id=1, eoi_id=2,
        rm_pad_in_image=True)
    noise = (jnp.asarray(rng.random((1, b, n, cfg.codebook_size)), jnp.float32),
             jnp.asarray(rng.random((1, b, n)), jnp.float32))
    kw = dict(uncond_input_ids=uncond, guidance_scale=6.0, timesteps=1,
              temperature=1.0, noise=noise, pad_id=0)
    ref = np.asarray(t2i_generate(params, cfg, jax.random.key(0), ids, mask, **kw))
    got = np.asarray(t2i_generate(qparams, cfg, jax.random.key(0), ids, mask, **kw))
    agree = (ref == got).mean()
    assert agree >= 0.85, f"int8 per-step token agreement {agree:.2f} below gate"


def test_t2i_int8_cumulative_gate():
    """Cumulative (full 50-step) int8 quality gate — the end-state complement
    to the per-step gate above (VERDICT r2 item 5).

    50 shared-noise MaskGIT steps at flagship layer widths compound per-step
    flips through the context (chaotic cascade), so final-grid agreement is
    far below the 85% per-step gate by construction; the gate asserts the
    cascade stays bounded: a majority of final tokens must still be identical.
    Measured: 0.56 (CPU fp32-sim) / 0.64 (v5e) int8-vs-bf16; bf16-vs-fp32
    cascades to 0.69 on the chip — int8 adds little divergence beyond the
    precision cascade itself (numbers in BENCH.md)."""
    import dataclasses
    from unigen_tpu.generation import t2i_generate
    from unigen_tpu.models import unigen as UU
    from unigen_tpu.models import qwen2 as Q2
    from unigen_tpu.ops import masks as M
    from unigen_tpu.ops.quantization import quantize_unigen_params

    llm = Q2.Qwen2Config(vocab_size=128 + 8192 + 1, hidden_size=1536,
                         intermediate_size=8960, num_hidden_layers=2,
                         num_attention_heads=12, num_key_value_heads=2,
                         head_dim=128, rope_theta=1e6, dtype=jnp.bfloat16)
    cfg = UU.UniGenConfig(llm=llm, vocab_size=128 + 8192 + 1, llm_vocab_size=112,
                          text_vocab_len=128, codebook_size=8192, num_vq_tokens=16)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        UU.init(jax.random.key(0), dataclasses.replace(
            cfg, llm=dataclasses.replace(llm, dtype=jnp.float32))))
    qparams = quantize_unigen_params(params, cfg)

    rng = np.random.default_rng(17)
    b, n, T = 2, cfg.num_vq_tokens, 50
    text = rng.integers(3, 100, size=(b, 6))
    ids = jnp.asarray(np.concatenate(
        [text, np.full((b, 1), 1), np.full((b, n), cfg.mask_token_id),
         np.full((b, 1), 2)], axis=1))
    uncond = jnp.asarray(np.roll(np.asarray(ids), 1, axis=0))
    mask = M.create_attention_mask_predict_next(
        jnp.concatenate([ids, uncond], 0), pad_id=0, soi_id=1, eoi_id=2,
        rm_pad_in_image=True)
    noise = (jnp.asarray(rng.random((T, b, n, cfg.codebook_size)), jnp.float32),
             jnp.asarray(rng.random((T, b, n)), jnp.float32))
    kw = dict(uncond_input_ids=uncond, guidance_scale=6.0, timesteps=T,
              temperature=1.0, noise=noise, pad_id=0)
    g16 = np.asarray(t2i_generate(params, cfg, jax.random.key(0), ids, mask, **kw))
    g8 = np.asarray(t2i_generate(qparams, cfg, jax.random.key(0), ids, mask, **kw))
    agree = (g8 == g16).mean()
    assert agree >= 0.5, f"cumulative int8 final-grid agreement {agree:.3f} < 0.5"


def test_cot_selection_and_rater_agreement_int8():
    """CoT-V machinery under int8 (VERDICT r2 item 5): (a) the self-VQA rater
    must give the SAME yes/no answers as bf16 on identical candidate images
    (isolates rater quantization from generation divergence), and (b) the
    end-to-end top-4 selection under shared keys must overlap bf16's ≥3/4."""
    from test_pipeline import DecodableMockTokenizer, SPECIALS
    from unigen_tpu.models import unigen as UU
    from unigen_tpu.models import magvit as MV
    from unigen_tpu.pipeline import UniGenPipeline
    from unigen_tpu.prompting import UniPrompting
    from unigen_tpu.evaluation import cot as COT
    from unigen_tpu.ops.quantization import quantize_unigen_params

    tok = DecodableMockTokenizer()
    prompting = UniPrompting(tok, special_tokens=SPECIALS, max_seq_len=64,
                             cond_dropout_prob=0.0)
    cfg = UU.UniGenConfig.tiny(text_vocab_len=len(tok))
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    params = UU.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    qparams = quantize_unigen_params(params, cfg)

    # (a) rater agreement on fixed candidates
    px = jax.random.uniform(jax.random.key(7), (8, 8, 8, 3), minval=-1, maxval=1)

    def answers(p):
        pipe = UniGenPipeline(p, cfg, vq_params, vq_cfg, prompting)
        rows = COT.rate_candidates(pipe, px, "a photo of a cup",
                                   jax.random.key(4), style="rule",
                                   max_new_tokens=3)
        return [r["answer"] for r in sorted(rows, key=lambda r: r["image_id"])]

    a, b = answers(params), answers(qparams)
    agree = np.mean([x == y for x, y in zip(a, b)])
    assert agree >= 0.9, f"int8 rater answer agreement {agree:.2f}"

    # (b) end-to-end top-4 selection overlap under shared keys
    def sel_ids(p):
        pipe = UniGenPipeline(p, cfg, vq_params, vq_cfg, prompting)
        _, table, _ = COT.run_cot(pipe, ["a photo of a cup"], jax.random.key(5),
                                  n_samples=8, topk=4, guidance_scale=2.0,
                                  timesteps=4, eval_text_len=8, style="rule",
                                  max_new_tokens=3)
        sel, _ = COT.greedy_samples_byscore(table, topk=4)
        return set(int(s.split("/")[-1].split(".")[0]) for s in sel)

    overlap = len(sel_ids(params) & sel_ids(qparams)) / 4.0
    assert overlap >= 0.75, f"int8 CoT top-4 selection overlap {overlap:.2f}"


def test_t2i_cfg_combine_hidden_matches_logits():
    """The fast hidden-state CFG combine is algebraically identical to the
    reference's logits-side combine (linear head, no bias): token outputs must
    match exactly on an fp32 model with shared noise."""
    from unigen_tpu.generation import t2i_generate
    cfg, params, ids, mask, kwargs = _t2i_gate_setup()
    a = np.asarray(t2i_generate(params, cfg, jax.random.key(0), ids, mask,
                                pad_id=0, cfg_combine="logits", **kwargs))
    b = np.asarray(t2i_generate(params, cfg, jax.random.key(0), ids, mask,
                                pad_id=0, cfg_combine="hidden", **kwargs))
    agree = (a == b).mean()
    assert agree >= 0.95, f"cfg_combine agreement {agree:.2f}"


def test_t2i_int8_confidence_ordering():
    """MaskGIT's re-masking is driven by per-token confidence ordering; int8
    must preserve that ordering (rank correlation on the first step)."""
    from unigen_tpu.models import unigen as UU
    from unigen_tpu.generation import t2i
    from unigen_tpu.ops.quantization import quantize_unigen_params
    cfg, params, ids, mask, kwargs = _t2i_gate_setup()
    qparams = quantize_unigen_params(params, cfg)
    h = jax.random.normal(jax.random.key(9), (2, cfg.num_vq_tokens,
                                              cfg.llm.hidden_size), jnp.float32)
    l_ref = np.asarray(t2i._image_head(params, cfg, h), np.float32)
    l_q = np.asarray(t2i._image_head(qparams, cfg, h), np.float32)
    # per-position softmax-confidence of the argmax token under each model
    p_ref = np.exp(l_ref - l_ref.max(-1, keepdims=True))
    p_ref /= p_ref.sum(-1, keepdims=True)
    conf_ref = p_ref.max(-1).reshape(-1)
    p_q = np.exp(l_q - l_q.max(-1, keepdims=True))
    p_q /= p_q.sum(-1, keepdims=True)
    conf_q = p_q.max(-1).reshape(-1)
    # Spearman rank correlation without scipy
    def ranks(x):
        r = np.empty_like(x)
        r[np.argsort(x)] = np.arange(len(x))
        return r
    rr, rq = ranks(conf_ref), ranks(conf_q)
    rho = np.corrcoef(rr, rq)[0, 1]
    assert rho > 0.95, f"confidence ordering rank corr {rho:.3f}"


def test_int8_lm_head_greedy_agreement():
    """The int8 text head must (a) produce logits close to the bf16 head and
    (b) preserve the greedy decode's argmax on most positions; vocab_slice
    must slice the quantized weights consistently."""
    from unigen_tpu.models import unigen as UU
    from unigen_tpu.ops.quantization import quantize_unigen_params
    cfg = UU.UniGenConfig.tiny()
    params = UU.init(jax.random.key(0), cfg)
    qparams = quantize_unigen_params(params, cfg, lm_head=True)
    assert "lm_head_q" in qparams["llm"]
    h = jax.random.normal(jax.random.key(1), (4, 7, cfg.llm.hidden_size), jnp.float32)
    l_ref = np.asarray(Q.logits(params["llm"], cfg.llm, h), np.float32)
    l_q = np.asarray(Q.logits(qparams["llm"], cfg.llm, h), np.float32)
    agree = (l_ref.argmax(-1) == l_q.argmax(-1)).mean()
    assert agree >= 0.7, agree
    # sliced head path hits the same quantized weights
    sl = (3, 3 + cfg.codebook_size)
    l_slice = np.asarray(Q.logits(qparams["llm"], cfg.llm, h, vocab_slice=sl), np.float32)
    np.testing.assert_allclose(l_slice, l_q[..., sl[0]:sl[1]], rtol=1e-5, atol=1e-5)


def test_ar_sampler_quantized_cache_runs():
    from unigen_tpu.generation import t2i_generate_ar
    from unigen_tpu.models import unigen as UU
    cfg = UU.UniGenConfig.tiny()
    params = UU.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    n, b = cfg.num_vq_tokens, 1
    ids = np.concatenate([rng.integers(3, 100, size=(b, 5)), np.full((b, 1), 1),
                          np.full((b, n), cfg.mask_token_id),
                          np.full((b, 1), 2)], axis=1)
    ids = jnp.asarray(ids)
    att = jnp.ones((2 * b, ids.shape[1]), jnp.int32)
    out = t2i_generate_ar(params, cfg, jax.random.key(0), ids, ids, att,
                          guidance_scale=1.5, temperature=1e-5,
                          quantized_cache=True)
    a = np.asarray(out)
    assert a.shape == (b, n) and (a >= 0).all() and (a < cfg.codebook_size).all()


def test_siglip_int8_feature_agreement():
    """Gate for the int8 W8A8 SigLIP tower (the lmms prefill fast path).

    The tower feeds the MM projector, not a softmax — so the gate is feature
    cosine, mirroring test_quantized_backbone_close_to_bf16's hidden-state gate."""
    from unigen_tpu.models import siglip as S
    from unigen_tpu.ops.quantization import quantize_siglip_params
    cfg = S.SiglipConfig.tiny()
    params = S.init(jax.random.key(0), cfg)
    qparams = quantize_siglip_params(params)
    assert qparams["layers"]["attn"]["q"]["kernel_int8"].dtype == jnp.int8
    assert "kernel" not in qparams["layers"]["mlp"]["fc1"]
    # patch embed + layernorms untouched
    assert "kernel" in qparams["patch_embed"]
    px = jax.random.normal(jax.random.key(1), (2, cfg.image_size, cfg.image_size, 3),
                           jnp.float32)
    ref = np.asarray(S.forward(params, cfg, px), np.float32)
    got = np.asarray(S.forward(qparams, cfg, px), np.float32)
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.99, cos


def test_siglip_flash_bidir_attention_parity():
    """The padded Pallas path (head_dim -> 128 zero-pad, bidir meta) must match
    eager full attention: zero-padded channels contribute nothing to q.k^T and
    the padded output channels are sliced off."""
    from unigen_tpu.models.siglip import _bidir_attention
    from unigen_tpu.ops.attention import dot_product_attention
    b, l, h, dh = 2, 9, 4, 8  # dh=8 pads to 128; l=9 exercises a ragged q block
    key = jax.random.key(0)
    q, k, v = (jax.random.normal(kk, (b, l, h, dh), jnp.float32)
               for kk in jax.random.split(key, 3))
    ref = np.asarray(dot_product_attention(q, k, v, scale=dh ** -0.5))
    got = np.asarray(_bidir_attention(q, k, v, dh ** -0.5, force_flash=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
