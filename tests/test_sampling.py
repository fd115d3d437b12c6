"""Golden tests for ops.sampling against the PyTorch reference (models/sampling.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.ops import sampling as S

from _reference import load_reference_module


@pytest.fixture(scope="module")
def ref_sampling():
    return load_reference_module("models/sampling.py", "ref_sampling")


def test_schedules_match_reference(ref_sampling):
    import torch
    t = np.linspace(0.0, 1.0, 33).astype(np.float32)
    tt = torch.tensor(t)
    np.testing.assert_allclose(np.asarray(S.cosine_schedule(jnp.asarray(t))),
                               ref_sampling.cosine_schedule(tt).numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(S.linear_schedule(jnp.asarray(t))),
                               ref_sampling.linear_schedule(tt).numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(S.pow_schedule(jnp.asarray(t), 2.0)),
                               ref_sampling.pow(tt, "pow2").numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(S.sigmoid_schedule(jnp.asarray(t))),
                               ref_sampling.sigmoid_schedule(tt).numpy(), rtol=1e-5)


def test_get_mask_schedule_dispatch():
    t = jnp.asarray(0.3)
    assert S.get_mask_schedule("cosine")(t) == S.cosine_schedule(t)
    assert S.get_mask_schedule("pow2")(t) == S.pow_schedule(t, 2.0)
    with pytest.raises(ValueError):
        S.get_mask_schedule("nope")


def test_mask_by_random_topk_zero_temperature_matches_reference(ref_sampling):
    import torch
    rng = np.random.default_rng(0)
    probs = rng.uniform(0.01, 1.0, size=(4, 16)).astype(np.float32)
    mask_len = np.array([[3], [1], [15], [8]], dtype=np.int64)
    ours = S.mask_by_random_topk(jax.random.key(0), jnp.asarray(mask_len),
                                 jnp.asarray(probs), temperature=0.0)
    theirs = ref_sampling.mask_by_random_topk(torch.tensor(mask_len),
                                              torch.tensor(probs), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ours), theirs.numpy())
    # exactly mask_len positions masked (all probs distinct)
    np.testing.assert_array_equal(np.asarray(ours).sum(-1), mask_len[:, 0])


def test_top_k_top_p_matches_reference(ref_sampling):
    import torch
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 50)).astype(np.float32)
    for top_k, top_p in [(0, 1.0), (5, 1.0), (0, 0.7), (10, 0.9)]:
        ours = S.top_k_top_p_filtering(jnp.asarray(logits), top_k=top_k, top_p=top_p)
        theirs = ref_sampling.top_k_top_p_filtering(
            torch.tensor(logits.copy()), top_k=top_k, top_p=top_p)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5)


def test_gumbel_sample_statistics():
    # Gumbel-max over logits must sample with softmax probabilities.
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]]))
    keys = jax.random.split(jax.random.key(42), 4000)
    draws = jax.vmap(lambda k: S.gumbel_sample(k, logits))(keys)
    freq = np.bincount(np.asarray(draws).ravel(), minlength=3) / 4000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.03)


def test_sample_categorical_statistics():
    probs = jnp.asarray([[0.5, 0.5, 0.0]])
    keys = jax.random.split(jax.random.key(7), 2000)
    draws = jax.vmap(lambda k: S.sample_categorical(k, probs))(keys)
    counts = np.bincount(np.asarray(draws).ravel(), minlength=3)
    assert counts[2] == 0
    assert abs(counts[0] - 1000) < 120
