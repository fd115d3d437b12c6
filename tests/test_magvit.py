"""MAGViTv2 tokenizer tests: torch-primitive oracles + round-trip invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.models import magvit as MV


def test_lfq_roundtrip():
    """indices -> codebook entry -> indices must be the identity."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 8192, size=(2, 256))
    z_q = MV.lfq_codebook_entry(jnp.asarray(idx), z_channels=13)
    assert z_q.shape == (2, 16, 16, 13)
    assert set(np.unique(np.asarray(z_q))) == {-1.0, 1.0}
    back = MV.lfq_indices(z_q, 13).reshape(2, 256)
    np.testing.assert_array_equal(np.asarray(back), idx)


def test_lfq_quantize_ste():
    z = jnp.asarray([[0.3, -0.2, 1.5, -0.001]])
    zq = MV.lfq_quantize(z)
    np.testing.assert_array_equal(np.asarray(zq), [[1, -1, 1, -1]])
    # straight-through: gradient of sum(z_q) wrt z is all-ones
    g = jax.grad(lambda x: MV.lfq_quantize(x).sum())(z)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(g))


def test_lfq_bitpacking_matches_reference_convention():
    """Big-endian bits: index = sum 2^(z-1-i) * (z_i > 0) (reference magvitv2.py:195-215)."""
    z = jnp.asarray([[[[1.0, -1.0, 1.0, 1.0]]]])  # bits 1011 -> 8+0+2+1 = 11
    assert int(MV.lfq_indices(z, 4)[0, 0, 0]) == 11


def test_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    gn = torch.nn.GroupNorm(32, 64, eps=1e-6)
    torch.nn.init.normal_(gn.weight)
    torch.nn.init.normal_(gn.bias)
    with torch.no_grad():
        ref = gn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    p = {"scale": jnp.asarray(gn.weight.detach().numpy()),
         "bias": jnp.asarray(gn.bias.detach().numpy())}
    ours = np.asarray(MV.group_norm(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_downsample_matches_torch_asymmetric_pad():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 9, 9, 4)).astype(np.float32)
    conv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
    with torch.no_grad():
        xt = torch.nn.functional.pad(torch.tensor(x.transpose(0, 3, 1, 2)), (0, 1, 0, 1))
        ref = conv(xt).numpy().transpose(0, 2, 3, 1)
    p = {"conv": {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(conv.bias.detach().numpy())}}
    ours = np.asarray(MV.downsample(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample_matches_torch_nearest():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 5, 5, 4)).astype(np.float32)
    conv = torch.nn.Conv2d(4, 4, 3, stride=1, padding=1)
    with torch.no_grad():
        xt = torch.nn.functional.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                                             scale_factor=2.0, mode="nearest")
        ref = conv(xt).numpy().transpose(0, 2, 3, 1)
    p = {"conv": {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(conv.bias.detach().numpy())}}
    ours = np.asarray(MV.upsample(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_attn_block_matches_torch_oracle():
    """Oracle: 1x1-conv QKV single-head attention, built from torch primitives."""
    torch = pytest.importorskip("torch")
    c = 32
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4, 4, c)).astype(np.float32)
    norm = torch.nn.GroupNorm(32, c, eps=1e-6)
    convs = {n: torch.nn.Conv2d(c, c, 1) for n in ["q", "k", "v", "proj_out"]}
    with torch.no_grad():
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        hn = norm(xt)
        q = convs["q"](hn).flatten(2).transpose(1, 2)   # b, hw, c
        k = convs["k"](hn).flatten(2)                   # b, c, hw
        w = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
        v = convs["v"](hn).flatten(2)                   # b, c, hw
        out = torch.bmm(v, w.transpose(1, 2)).reshape(2, c, 4, 4)
        ref = (xt + convs["proj_out"](out)).numpy().transpose(0, 2, 3, 1)

    def cp(conv):
        return {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(conv.bias.detach().numpy())}
    p = {"norm": {"scale": jnp.asarray(norm.weight.detach().numpy()),
                  "bias": jnp.asarray(norm.bias.detach().numpy())},
         "q": cp(convs["q"]), "k": cp(convs["k"]), "v": cp(convs["v"]),
         "proj_out": cp(convs["proj_out"])}
    ours = np.asarray(MV.attn_block(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_tiny_tokenizer_end_to_end():
    cfg = MV.MagvitConfig.tiny()
    params = MV.init(jax.random.key(0), cfg)
    px = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3), minval=-1, maxval=1)
    codes = MV.get_code(params, cfg, px)
    assert codes.shape == (2, 64)  # 16px / 2 levels -> 8x8 grid
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < cfg.codebook_size).all()
    recon = MV.decode_code(params, cfg, codes)
    assert recon.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(recon)).all()
    # deterministic: same pixels -> same codes
    codes2 = MV.get_code(params, cfg, px)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


def test_full_size_shapes_jit_abstract():
    """Shape-only check of the 256px config without allocating real weights."""
    cfg = MV.MagvitConfig()
    params_shape = jax.eval_shape(lambda k: MV.init(k, cfg), jax.random.key(0))
    px = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
    codes = jax.eval_shape(lambda p, x: MV.get_code(p, cfg, x), params_shape, px)
    assert codes.shape == (1, 256)
    recon = jax.eval_shape(lambda p, c: MV.decode_code(p, cfg, c), params_shape,
                           jax.ShapeDtypeStruct((1, 256), jnp.int32))
    assert recon.shape == (1, 256, 256, 3)


def test_lfq_losses_finite_and_entropy_positive():
    z = jax.random.normal(jax.random.key(2), (2, 4, 4, 13))
    losses = MV.lfq_losses(z)
    assert np.isfinite(float(losses["entropy_loss"]))
    assert float(losses["commit_loss"]) > 0
