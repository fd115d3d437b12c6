"""UniGen model wrapper tests: unified vocab, losses, projector paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import unigen as U
from unigen_tpu.ops import masks as M


@pytest.fixture(scope="module")
def tiny():
    cfg = U.UniGenConfig.tiny()
    params = U.init(jax.random.key(0), cfg)
    return cfg, params


def test_config_vocab_layout(tiny):
    cfg, _ = tiny
    assert cfg.vocab_size == cfg.text_vocab_len + cfg.codebook_size + 1
    assert cfg.mask_token_id == cfg.vocab_size - 1  # no gen projector


def test_gen_projector_mask_token():
    cfg = U.UniGenConfig.tiny(gen_proj_depth=2)
    assert cfg.mask_token_id == cfg.codebook_size
    params = U.init(jax.random.key(0), cfg)
    assert "gen_embed" in params and "img_head" in params
    emb = U.get_gen_embed(params, jnp.asarray([[0, 5, cfg.codebook_size]]))
    assert emb.shape == (1, 3, cfg.llm.hidden_size)


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 7, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(4, 7))
    labels[0, :3] = -100
    labels[2] = -100
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits).reshape(-1, 11), torch.tensor(labels).reshape(-1),
        ignore_index=-100).item()
    ours = float(U._cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - ref) < 1e-5


def _batch(cfg, bt, bl, bm, L=24):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.text_vocab_len - 20, size=(bt + bl + bm, L))
    labels = rng.integers(0, cfg.text_vocab_len - 20, size=(bt + bl + bm, L))
    labels[labels % 3 == 0] = -100
    return jnp.asarray(ids), jnp.asarray(labels)


def test_forward_three_losses(tiny):
    cfg, params = tiny
    bt, bl, bm = 2, 1, 2
    ids, labels = _batch(cfg, bt, bl, bm)
    logits, lt, ll, lm = U.forward(params, cfg, input_ids=ids, labels=labels,
                                   batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=bm)
    n = cfg.num_vq_tokens
    assert logits.shape == (5, 24, cfg.vocab_size)
    # manual recomputation of each slice
    man_t2i = U._cross_entropy(logits[:bt, -(n + 1):-1], labels[:bt, -(n + 1):-1])
    man_lm = U._cross_entropy(logits[bt:bt + bl, :-1], labels[bt:bt + bl, 1:])
    man_mmu = U._cross_entropy(logits[-bm:, :-1], labels[-bm:, 1:])
    np.testing.assert_allclose(float(lt), float(man_t2i), rtol=1e-6)
    np.testing.assert_allclose(float(ll), float(man_lm), rtol=1e-6)
    np.testing.assert_allclose(float(lm), float(man_mmu), rtol=1e-6)


def test_forward_ar_mode_shift(tiny):
    cfg, params = tiny
    ids, labels = _batch(cfg, 2, 0, 0)
    logits, lt, _, _ = U.forward(params, cfg, input_ids=ids, labels=labels,
                                 batch_size_t2i=2, t2i_mode="ar")
    n = cfg.num_vq_tokens
    man = U._cross_entropy(logits[:2, -(n + 2):-1], labels[:2, -(n + 1):])
    np.testing.assert_allclose(float(lt), float(man), rtol=1e-6)


def test_forward_gen_projector_img_logits():
    cfg = U.UniGenConfig.tiny(gen_proj_depth=2)
    params = U.init(jax.random.key(1), cfg)
    ids, labels = _batch(cfg, 2, 0, 1)
    # gen-projector path: the image block of input_ids AND its labels live in
    # codebook space (ids feed gen_embed, labels feed the codebook-class CE)
    n = cfg.num_vq_tokens
    r9 = np.random.default_rng(9)
    ids = ids.at[:2, -(n + 1):-1].set(jnp.asarray(r9.integers(0, cfg.codebook_size, (2, n))))
    labels = labels.at[:2, -(n + 1):-1].set(
        jnp.asarray(r9.integers(0, cfg.codebook_size, (2, n))))
    out = U.forward(params, cfg, input_ids=ids, labels=labels,
                    batch_size_t2i=2, batch_size_mmu=1)
    img_logits, lt, _, lm = out
    assert img_logits.shape == (2, 24, cfg.codebook_size)
    assert np.isfinite(float(lt)) and np.isfinite(float(lm))


def test_forward_with_omni_mask(tiny):
    cfg, params = tiny
    ids, labels = _batch(cfg, 2, 0, 0)
    mask = M.create_attention_mask_predict_next(ids, pad_id=0, soi_id=1, eoi_id=2,
                                                rm_pad_in_image=True)
    _, lt, _, _ = U.forward(params, cfg, input_ids=ids, labels=labels,
                            attention_mask=mask, batch_size_t2i=2)
    assert np.isfinite(float(lt))


def test_mm_projector():
    cfg = U.UniGenConfig.tiny(w_und_encoder=True, und_proj_depth=2)
    params = U.init(jax.random.key(2), cfg)
    feats = jnp.ones((2, 9, cfg.mm_input_dim))
    out = U.mm_project(params, feats)
    assert out.shape == (2, 9, cfg.llm.hidden_size)


def test_memory_efficient_loss_matches_dense(tiny):
    """Chunked-CE loss path == materialized-logits path exactly."""
    cfg, params = tiny
    bt, bl, bm = 2, 1, 2
    ids, labels = _batch(cfg, bt, bl, bm)
    _, lt1, ll1, lm1 = U.forward(params, cfg, input_ids=ids, labels=labels,
                                 batch_size_t2i=bt, batch_size_lm=bl,
                                 batch_size_mmu=bm)
    none_logits, lt2, ll2, lm2 = U.forward(params, cfg, input_ids=ids, labels=labels,
                                           batch_size_t2i=bt, batch_size_lm=bl,
                                           batch_size_mmu=bm,
                                           memory_efficient_loss=True)
    assert none_logits is None
    for a, b in ((lt1, lt2), (ll1, ll2), (lm1, lm2)):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5, atol=1e-6)
    # gradients flow through the chunked path
    g = jax.grad(lambda p: U.forward(p, cfg, input_ids=ids, labels=labels,
                                     batch_size_t2i=bt, batch_size_lm=bl,
                                     batch_size_mmu=bm,
                                     memory_efficient_loss=True)[1])(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gn) and gn > 0
