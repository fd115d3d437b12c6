"""Unit tests for the per-row VMEM chunk-attention kernel (interpret mode on
CPU — the same code path Mosaic compiles on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.ops.attention import dot_product_attention
from unigen_tpu.ops.chunk_attention import chunk_attention


def _setup(b=2, lq=6, s=16, h=4, kvh=2, dh=16, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(ks[0], (b, lq, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kvh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kvh, dh), jnp.float32)
    kvalid = jax.random.bernoulli(ks[3], 0.7, (b, s))
    # at least one visible key per row (all-masked rows are undefined)
    kvalid = kvalid.at[:, 0].set(True)
    return q, k, v, kvalid


def test_chunk_attention_matches_dense():
    q, k, v, kvalid = _setup()
    ref = dot_product_attention(
        q, k, v, mask=jnp.broadcast_to(kvalid[:, None, None, :],
                                       (q.shape[0], 1, q.shape[1], k.shape[1])))
    got = chunk_attention(q, k, v, kvalid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_chunk_attention_masked_keys_have_no_influence():
    q, k, v, kvalid = _setup(seed=3)
    got = chunk_attention(q, k, v, kvalid)
    # perturb only the invisible keys/values: output must not change
    noise = 100.0 * (~kvalid)[..., None, None].astype(jnp.float32)
    got2 = chunk_attention(q, k + noise, v, kvalid)
    got3 = chunk_attention(q, k, v + noise, kvalid)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(got), atol=1e-5)


def test_chunk_attention_gqa_groups_use_right_kv_head():
    """Making the two KV heads very different must show up in the matching
    query-head groups only."""
    q, k, v, kvalid = _setup(seed=5)
    v = v.at[:, :, 1, :].set(0.0)      # second KV head contributes zeros
    out = np.asarray(chunk_attention(q, k, v, jnp.ones_like(kvalid)))
    g = q.shape[2] // k.shape[2]
    # heads in the second group attend only zero values -> exactly zero output
    np.testing.assert_allclose(out[:, :, g:, :], 0.0, atol=1e-6)
    assert np.abs(out[:, :, :g, :]).max() > 0.01
