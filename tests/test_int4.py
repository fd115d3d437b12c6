"""W4A8 int4-packed decode path (ops/int4.py).

Kernel exactness is testable bit-for-bit: the int8×int4 dots accumulate in
int32 (no rounding), so the Pallas kernel must equal a plain-XLA dequantized
reference to fp32 tolerance. Quality (vs bf16) is gated the same way as the
int8 path: hidden-state cosine on a tiny backbone + decode smoke.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import qwen2 as Q
from unigen_tpu.ops.int4 import (dense_int4, pack_int4, quantize_dense_int4,
                                 quantize_qwen2_params_int4, w4a8_matmul)


def _unpack_reference(packed, scale, group):
    """[K//2, Npad] packed -> [K, Npad] fp32 dequantized."""
    k2, npad = packed.shape
    half = group // 2
    g = (2 * k2) // group
    p = np.asarray(packed).reshape(g, half, npad).astype(np.int8)
    lo = ((p << 4) >> 4).astype(np.float32)
    hi = (p >> 4).astype(np.float32)
    w = np.concatenate([lo, hi], axis=1) * np.asarray(scale)[:, None, :]
    return w.reshape(g * group, npad)


@pytest.mark.parametrize("t,k,n,group", [(5, 128, 96, 32), (32, 512, 512, 256),
                                         (1, 256, 1000, 64)])
def test_w4a8_kernel_matches_dequant_reference(t, k, n, group):
    key = jax.random.key(0)
    w = jax.random.normal(key, (k, n), jnp.float32)
    packed, scale = pack_int4(w, group)
    x8 = jnp.asarray(
        np.random.default_rng(1).integers(-127, 128, size=(t, k)), jnp.int8)
    got = np.asarray(w4a8_matmul(x8, packed, scale, group=group, interpret=True))
    wref = _unpack_reference(packed, scale, group)
    ref = np.asarray(x8, np.float32) @ wref
    # integer math is exact; tolerance covers fp32 cross-group reassociation
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-3)


def test_pack_int4_nibbles_in_range_and_padding():
    w = jax.random.normal(jax.random.key(2), (64, 100), jnp.float32)
    packed, scale = pack_int4(w, group=32)
    assert packed.shape == (32, 512) and scale.shape == (2, 512)
    p = np.asarray(packed)
    lo, hi = (p << 4) >> 4, p >> 4
    assert lo.min() >= -7 and lo.max() <= 7 and hi.min() >= -7 and hi.max() <= 7
    # padded columns quantize zeros exactly
    assert (p[:, 100:] == 0).all()
    # dequantized error bounded by half a quantization step per element
    wref = _unpack_reference(packed, scale, 32)[:, :100]
    step = np.asarray(scale)[:, :100].repeat(32, axis=0)
    assert (np.abs(wref - np.asarray(w)) <= 0.5 * step + 1e-6).all()


def test_dense_int4_close_to_float():
    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    p = {"kernel": jax.random.normal(k1, (128, 96), jnp.float32) * 0.05,
         "bias": jax.random.normal(k2, (96,), jnp.float32) * 0.01}
    x = jax.random.normal(jax.random.key(4), (3, 7, 128), jnp.float32)
    ref = np.asarray(x @ p["kernel"] + p["bias"])
    got = np.asarray(dense_int4(quantize_dense_int4(p, group=64), x))
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.995, cos
    assert got.shape == ref.shape


def test_int4_backbone_hidden_cosine_and_decode():
    """Tiny Qwen2 backbone fully int4-packed: hidden states track bf16 and the
    KV-cached greedy decode stays in-vocab/finite (the serving decode path)."""
    cfg = Q.Qwen2Config(vocab_size=256, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=16)
    params = Q.init(jax.random.key(0), cfg)
    qparams = quantize_qwen2_params_int4(params, group=32)
    assert qparams["layers"]["attn"]["q"]["kernel_int4"].dtype == jnp.int8
    assert "kernel" not in qparams["layers"]["mlp"]["down"]
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 250, size=(2, 10)))
    href, _ = Q.forward(params, cfg, input_ids=ids)
    hgot, _ = Q.forward(qparams, cfg, input_ids=ids)
    a = np.asarray(href, np.float32).ravel()
    b = np.asarray(hgot, np.float32).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    # int4 is lossier than int8 by construction (measured 0.944 on this tiny
    # random backbone vs int8's >0.99); it ships OPT-IN, not default, and the
    # real-weights runbook gates it on benchmark scores (docs/WEIGHTS.md)
    assert cos > 0.9, cos

    from unigen_tpu.ops.int4 import quantize_unigen_params_int4
    from unigen_tpu.models import unigen as U
    ucfg = U.UniGenConfig.tiny()
    up = U.init(jax.random.key(1), ucfg)
    uq = quantize_unigen_params_int4(up, ucfg, group=16)
    assert "kernel_int4" in uq["llm"]["lm_head_q"]
    lg = Q.logits(uq["llm"], ucfg.llm,
                  jnp.ones((1, 2, ucfg.llm.hidden_size), jnp.bfloat16))
    assert lg.shape[-1] == ucfg.vocab_size
    assert np.isfinite(np.asarray(lg, np.float32)).all()
    # vocab_slice through the packed head (the t2i image-head pattern)
    sl = Q.logits(uq["llm"], ucfg.llm,
                  jnp.ones((1, 2, ucfg.llm.hidden_size), jnp.bfloat16),
                  vocab_slice=(ucfg.text_vocab_len,
                               ucfg.text_vocab_len + ucfg.codebook_size))
    assert sl.shape[-1] == ucfg.codebook_size


def test_engine_mixed_precision_decode_params():
    """Serving engine with int8 admission + int4 decode (the production shape:
    prefill hates int4's unpack overhead, decode loves the halved weight
    read). Decode must be deterministic per seed and in-vocab."""
    from unigen_tpu.models import unigen as U
    from unigen_tpu.ops.int4 import quantize_unigen_params_int4
    from unigen_tpu.ops.quantization import quantize_unigen_params
    from unigen_tpu.serving import ServingEngine
    cfg = U.UniGenConfig.tiny()
    params = U.init(jax.random.key(0), cfg)
    p8 = quantize_unigen_params(params, cfg, lm_head=True)
    p4 = quantize_unigen_params_int4(params, cfg, group=16)
    outs = []
    for _ in range(2):
        with ServingEngine(p8, cfg, slots=2, max_len=48, buckets=(16,),
                           chunk=4, decode_params=p4) as eng:
            f1 = eng.submit(list(range(3, 13)), max_new_tokens=6)
            f2 = eng.submit(list(range(5, 17)), max_new_tokens=5,
                            temperature=0.8, seed=11)
            outs.append((f1.result(300), f2.result(300)))
    (a1, b1), (a2, b2) = outs
    assert a1 == a2 and b1 == b2          # schedule-independent determinism
    assert len(a1) == 6 and len(b1) == 5
    assert all(0 <= t < cfg.vocab_size for t in a1 + b1)
