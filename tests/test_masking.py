"""Tests for the MaskGIT training corruption (ops.masking)."""
import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.ops import masking as MK
from unigen_tpu.ops import sampling as S


def test_mask_counts_and_labels():
    key = jax.random.key(0)
    tokens = jnp.arange(4 * 256).reshape(4, 256) % 8192
    out = MK.mask_or_random_replace_tokens(key, tokens, mask_id=8192,
                                           mask_schedule=S.cosine_schedule)
    masked = np.asarray(out.input_ids == 8192)
    expected = np.clip(np.round(256 * np.asarray(out.mask_prob)), 1, None)
    np.testing.assert_array_equal(masked.sum(-1), expected)
    labels = np.asarray(out.labels)
    assert ((labels == -100) == ~masked).all()
    np.testing.assert_array_equal(labels[masked], np.asarray(tokens)[masked])
    assert out.loss_weight is None


def test_min_masking_rate():
    key = jax.random.key(1)
    tokens = jnp.zeros((8, 64), jnp.int32)
    out = MK.mask_or_random_replace_tokens(key, tokens, 99, S.cosine_schedule,
                                           min_masking_rate=0.4)
    assert (np.asarray(out.mask_prob) >= 0.4).all()


def test_contiguous_region_is_rectangle():
    key = jax.random.key(2)
    tokens = jnp.zeros((4, 256), jnp.int32)
    out = MK.mask_or_random_replace_tokens(key, tokens, 99, S.cosine_schedule,
                                           mask_contiguous_region_prob=1.0)
    mask = np.asarray(out.input_ids == 99).reshape(4, 16, 16)
    for b in range(4):
        rows = mask[b].any(axis=1)
        cols = mask[b].any(axis=0)
        r0, r1 = np.flatnonzero(rows)[[0, -1]]
        c0, c1 = np.flatnonzero(cols)[[0, -1]]
        assert mask[b][r0:r1 + 1, c0:c1 + 1].all()


def test_random_replace_mode():
    key = jax.random.key(3)
    tokens = jnp.full((2, 64), 5000, jnp.int32)
    out = MK.mask_or_random_replace_tokens(key, tokens, 8192, S.cosine_schedule,
                                           noise_type="random_replace", codebook_size=8192)
    # labels are all tokens; loss weight present
    np.testing.assert_array_equal(np.asarray(out.labels), np.asarray(tokens))
    assert out.loss_weight is not None
    assert (np.asarray(out.input_ids) < 8192).all()


def test_predict_all_tokens_loss_weight():
    key = jax.random.key(4)
    tokens = jnp.zeros((2, 16), jnp.int32)
    out = MK.mask_or_random_replace_tokens(key, tokens, 99, S.cosine_schedule,
                                           predict_all_tokens=True)
    w = np.asarray(out.loss_weight)
    mask = np.asarray(out.input_ids == 99).astype(np.float32)
    t = np.asarray(out.mask_prob)
    expected = 1 - (1 - mask) * ((1 - t) * 0.7)[:, None]
    np.testing.assert_allclose(w, expected, rtol=1e-6)


def test_eval_mask_ratios():
    key = jax.random.key(5)
    tokens = jnp.zeros((16, 64), jnp.int32)
    out = MK.mask_or_random_replace_tokens(key, tokens, 99, S.cosine_schedule,
                                           eval_mask_ratios=[0.25, 0.5], is_train=False)
    probs = np.unique(np.asarray(out.mask_prob))
    assert set(probs).issubset({0.25, 0.5})
