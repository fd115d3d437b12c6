"""Fused GN+swish+conv3x3 Pallas kernel vs the plain XLA composition.

Runs in interpreter mode on CPU CI — the same kernel code path that compiles
on TPU (ops/fused_conv.py; wired into models/magvit.py resblocks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import magvit
from unigen_tpu.ops import fused_conv as FC


def _mk(key, h, w, c, cout, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (2, h, w, c), dtype)
    conv_p = {"kernel": jax.random.normal(ks[1], (3, 3, c, cout), dtype) * 0.05,
              "bias": jax.random.normal(ks[2], (cout,), dtype) * 0.1}
    gn_p = {"scale": 1.0 + 0.3 * jax.random.normal(ks[3], (c,), dtype),
            "bias": 0.1 * jax.random.normal(ks[4], (c,), dtype)}
    return x, conv_p, gn_p


def test_fused_conv_matches_xla_composition():
    x, conv_p, gn_p = _mk(jax.random.key(0), 32, 128, 128, 128)
    ref = magvit.conv2d(conv_p, magvit.swish(magvit.group_norm(gn_p, x)))
    got = FC.conv3x3_gn_swish(conv_p, gn_p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_conv_plain_matches():
    """gn_p=None: plain SAME conv (the upsample conv path)."""
    x, conv_p, _ = _mk(jax.random.key(1), 16, 128, 128, 256)
    ref = magvit.conv2d(conv_p, x)
    got = FC.conv3x3_gn_swish(conv_p, None, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_conv_channel_change():
    x, conv_p, gn_p = _mk(jax.random.key(2), 16, 128, 256, 128)
    ref = magvit.conv2d(conv_p, magvit.swish(magvit.group_norm(gn_p, x)))
    got = FC.conv3x3_gn_swish(conv_p, gn_p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_conv_gradients_match():
    """custom_vjp backward (XLA recompute) == gradients of the composition."""
    x, conv_p, gn_p = _mk(jax.random.key(3), 16, 128, 128, 128)

    def loss_fused(c, n, xx):
        return (FC.conv3x3_gn_swish(c, n, xx) ** 2).mean()

    def loss_ref(c, n, xx):
        return (magvit.conv2d(c, magvit.swish(magvit.group_norm(n, xx))) ** 2).mean()

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(conv_p, gn_p, x)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(conv_p, gn_p, x)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_supported_gate():
    assert FC.supported((2, 32, 128, 128), 128)
    assert not FC.supported((2, 32, 128, 64), 128)    # C not lane-aligned
    assert not FC.supported((2, 32, 128, 128), 3)     # conv_out to pixels
    assert not FC.supported((2, 4, 128, 128), 128)    # too few rows


def test_magvit_fused_decode_matches_unfused():
    """decode_code with fused_convs=True (interpret) == the XLA graph."""
    import dataclasses
    cfg = magvit.MagvitConfig.tiny(ch=128, resolution=32)  # lane-aligned channels
    params = magvit.init(jax.random.key(0), cfg)
    codes = jax.random.randint(jax.random.key(1), (2, 64), 0, cfg.codebook_size)
    ref = magvit.decode_code(params, dataclasses.replace(cfg, fused_convs=False), codes)
    got = magvit.decode_code(params, dataclasses.replace(cfg, fused_convs=True), codes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_magvit_fused_encode_matches_unfused():
    import dataclasses
    cfg = magvit.MagvitConfig.tiny(ch=128, resolution=32)
    params = magvit.init(jax.random.key(0), cfg)
    img = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    _, idx_ref = magvit.encode(params, dataclasses.replace(cfg, fused_convs=False), img)
    _, idx_got = magvit.encode(params, dataclasses.replace(cfg, fused_convs=True), img)
    np.testing.assert_array_equal(np.asarray(idx_got), np.asarray(idx_ref))
