"""Pallas omni-mask attention kernel vs the XLA reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.ops import masks as M
from unigen_tpu.ops.attention import dot_product_attention
from unigen_tpu.ops.flash_attention import flash_attention, pack_meta

PAD, SOI, EOI = 900, 901, 902


def _qkv(b=2, l=16, h=4, kvh=2, dh=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, kvh, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, kvh, dh)), jnp.float32)
    return q, k, v


def _compare(meta, seed=0, block_q=8):
    q, k, v = _qkv(b=meta.pad.shape[0], seed=seed, l=meta.pad.shape[1])
    ref = dot_product_attention(q, k, v, meta=meta)
    got = flash_attention(q, k, v, pack_meta(meta), block_q=block_q, interpret=True)
    valid = ~np.asarray(meta.pad)
    for b in range(q.shape[0]):
        np.testing.assert_allclose(np.asarray(got)[b][valid[b]],
                                   np.asarray(ref)[b][valid[b]], atol=1e-5, rtol=1e-5)


def test_causal_only():
    b, l = 2, 16
    meta = M.AttnMeta(pad=jnp.zeros((b, l), bool), bidir_q=jnp.zeros((b, l), bool),
                      bidir_k=jnp.zeros((b, l), bool))
    _compare(meta)


def test_t2i_omni_mask():
    ids = np.array([[PAD, PAD, 5, 6, SOI] + [10] * 9 + [EOI, 7],
                    [3, 4, 5, 6, SOI] + [11] * 9 + [EOI, 8]])
    meta = M.t2i_attn_meta(jnp.asarray(ids), PAD, SOI, EOI)
    _compare(meta, seed=1)


def test_mmu_prefix_mask():
    ids = np.array([[7, 8, SOI, 10, 11, 12, EOI, 20, 21, 22, 23, 24, 25, 26, 27, PAD]])
    meta = M.mmu_attn_meta(jnp.asarray(ids), PAD, SOI, EOI)
    _compare(meta, seed=2)


def test_uneven_q_blocks():
    """Lq=12 with block_q=8 exercises the ragged final block."""
    b, l = 1, 12
    meta = M.AttnMeta(pad=jnp.zeros((b, l), bool),
                      bidir_q=jnp.zeros((b, l), bool).at[:, 4:8].set(True),
                      bidir_k=jnp.zeros((b, l), bool))
    q, k, v = _qkv(b=b, l=l, seed=3)
    ref = dot_product_attention(q, k, v, meta=meta)
    got = flash_attention(q, k, v, pack_meta(meta), block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gqa_head_mapping():
    """h=4 query heads share kvh=2 heads; kernel must map h -> h // 2."""
    b, l = 1, 8
    meta = M.AttnMeta(pad=jnp.zeros((b, l), bool), bidir_q=jnp.zeros((b, l), bool),
                      bidir_k=jnp.zeros((b, l), bool))
    _compare(meta, seed=4)


def test_qwen2_forward_with_flash_kernel():
    """Backbone with the Pallas path (forced) == backbone with the XLA mask path."""
    from unigen_tpu.models import qwen2 as Q
    cfg = Q.Qwen2Config.tiny(vocab_size=256)
    params = Q.init(jax.random.key(0), cfg)
    ids = jnp.asarray(np.array([[9, 8, SOI % 256, 7, 6, 5, 4, 3]]))
    meta = M.AttnMeta(pad=jnp.zeros((1, 8), bool),
                      bidir_q=jnp.zeros((1, 8), bool).at[:, 2:6].set(True),
                      bidir_k=jnp.zeros((1, 8), bool))
    h_flash, _ = Q.forward(params, cfg, input_ids=ids, meta=meta, use_flash=True)
    h_xla, _ = Q.forward(params, cfg, input_ids=ids, meta=meta, use_flash=False)
    np.testing.assert_allclose(np.asarray(h_flash), np.asarray(h_xla),
                               atol=1e-5, rtol=1e-5)


def test_flash_attention_gradients_match_xla():
    """Custom VJP: grads through the kernel == grads through the XLA path."""
    b, l, h, kvh, dh = 1, 8, 4, 2, 8
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, kvh, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, kvh, dh)), jnp.float32)
    meta = M.AttnMeta(pad=jnp.zeros((b, l), bool),
                      bidir_q=jnp.zeros((b, l), bool).at[:, 3:6].set(True),
                      bidir_k=jnp.zeros((b, l), bool))
    bits = pack_meta(meta)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, bits, None, 8, True) ** 2).sum()

    def loss_xla(q, k, v):
        return (dot_product_attention(q, k, v, meta=meta) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5)


def test_segment_packed_mask():
    """AttnMeta.seg confines attention to same-segment pairs (sequence-packed
    SFT rows, training/sft.py::loss_packed): kernel == XLA visibility path."""
    b, l = 2, 16
    # two 8-token segments per row; segment 1 of row 0 has a bidir image block
    seg = jnp.concatenate([jnp.zeros((b, 8), jnp.int32),
                           jnp.ones((b, 8), jnp.int32)], axis=1)
    meta = M.AttnMeta(
        pad=jnp.zeros((b, l), bool).at[0, 14:].set(True),   # tail pad in seg 1
        bidir_q=jnp.zeros((b, l), bool).at[0, 10:13].set(True),
        bidir_k=jnp.zeros((b, l), bool),
        seg=seg)
    # the dense visibility must be block-diagonal
    vis = np.asarray(meta.visibility())[0, 0]
    assert not vis[4, 9] and not vis[12, 3], "cross-segment leak"
    _compare(meta, seed=7)


def test_segment_packed_gradients_match_xla():
    b, l, h, kvh, dh = 1, 16, 4, 2, 8
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(b, l, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, kvh, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, kvh, dh)), jnp.float32)
    seg = jnp.concatenate([jnp.zeros((b, 8), jnp.int32),
                           jnp.ones((b, 8), jnp.int32)], axis=1)
    meta = M.AttnMeta(pad=jnp.zeros((b, l), bool),
                      bidir_q=jnp.zeros((b, l), bool).at[:, 2:6].set(True),
                      bidir_k=jnp.zeros((b, l), bool), seg=seg)
    bits = pack_meta(meta)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, bits, None, 8, True) ** 2).sum()

    def loss_xla(q, k, v):
        return (dot_product_attention(q, k, v, meta=meta) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5,
                                   rtol=1e-5)
