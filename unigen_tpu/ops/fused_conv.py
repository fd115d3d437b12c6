"""Fused GroupNorm+swish+conv3x3 Pallas kernel for the MAGViTv2 tokenizer.

The tokenizer's hot path is stacks of ``conv3x3(swish(group_norm(x)))`` at
large spatial extents (reference: common_modules.py:340-360 resblocks inside
magvitv2.py:57-178/286-408). XLA executes that as separate GN-stats, GN-apply
and conv kernels: measured on the v5e chip, the conv alone runs at ~26-30% of
the MXU peak at the dominant [B,256,256,128] shape and every GN costs extra
full-tensor HBM round-trips (BENCH.md tokenizer section).

This kernel does, per row-slab of the image, entirely in VMEM:

  1. DMA the slab plus a 1-row halo from HBM (SAME padding handled in-kernel);
  2. apply GroupNorm as a per-(batch, channel) affine ``x*A + B`` — the group
     statistics are computed by a cheap XLA pre-pass and folded into A/B;
  3. swish on the VPU;
  4. the 3x3 convolution as 9 shifted [TH*W, C] @ [C, Cout] MXU matmuls
     accumulated in fp32.

The input is read from HBM exactly once (plus the stats pre-pass) and the
output written once. Gradients fall back to the XLA composition via
``jax.custom_vjp`` (training uses the same math; only the forward is
hand-scheduled).

**Measured outcome (BENCH.md tokenizer section):** in isolation the kernel's
conv beats XLA's conv at the hot [16,256,256,128] shape (~63 vs ~50 TFLOPS),
but end-to-end the XLA graph wins (decode 59.5ms vs 64.9ms fused at batch 16)
because XLA fuses the GN stats reduction into the *producing* op's epilogue —
zero extra passes — which a kernel fed by a separate stats pre-pass cannot
match. The kernel therefore ships opt-in (``MagvitConfig.fused_convs=True``;
``"auto"`` resolves to off) as the measured reference point for the
fused-tokenizer-kernel north-star item.

Constraints: C and Cout multiples of 128 (MXU lane width), H divisible by the
row-tile. ``supported()`` reports whether a shape qualifies; callers fall back
to plain XLA ops otherwise.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _start_slab_dma(x_hbm, slab, sems, b, i, slot, TH, nI):
    """Start the (up to) 3 DMAs for tile (b, i) into slab slot ``slot``:
    body rows + top/bottom halo rows. Returns nothing; _wait_slab_dma pairs."""
    pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH, TH)],
                          slab.at[slot, pl.ds(1, TH)], sems.at[slot, 0]).start()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH - 1, 1)],
                              slab.at[slot, pl.ds(0, 1)], sems.at[slot, 1]).start()

    @pl.when(i < nI - 1)
    def _():
        pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH + TH, 1)],
                              slab.at[slot, pl.ds(TH + 1, 1)], sems.at[slot, 2]).start()


def _wait_slab_dma(x_hbm, slab, sems, b, i, slot, TH, nI):
    pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH, TH)],
                          slab.at[slot, pl.ds(1, TH)], sems.at[slot, 0]).wait()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH - 1, 1)],
                              slab.at[slot, pl.ds(0, 1)], sems.at[slot, 1]).wait()

    @pl.when(i < nI - 1)
    def _():
        pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH + TH, 1)],
                              slab.at[slot, pl.ds(TH + 1, 1)], sems.at[slot, 2]).wait()


def _kernel(ab_ref, w_ref, bias_ref, x_hbm, out_ref, slab, sems, *, TH, W, C, Cout,
            gn: bool, dtype, RC: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nB = pl.num_programs(0)
    nI = pl.num_programs(1)
    step = b * nI + i
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    # double-buffered slab prefetch: tile (b, i)'s DMA was started by the
    # previous grid step; here we start the NEXT tile's and wait on ours
    @pl.when(step == 0)
    def _():
        _start_slab_dma(x_hbm, slab, sems, b, i, slot, TH, nI)

    nb = jax.lax.select(i == nI - 1, b + 1, b)
    ni = jax.lax.select(i == nI - 1, 0, i + 1)

    @pl.when(step + 1 < nB * nI)
    def _():
        _start_slab_dma(x_hbm, slab, sems, nb, ni, nxt, TH, nI)

    _wait_slab_dma(x_hbm, slab, sems, b, i, slot, TH, nI)

    bias = bias_ref[0].astype(jnp.float32)[None, :]
    zcol = jnp.zeros((RC + 2, 1, C), dtype)
    a = ab_ref[0, 0] if gn else None                     # [C] fp32
    bb = ab_ref[0, 1] if gn else None

    def normalized(rc):
        """GN-affine + swish + SAME-pad masking + dx-tap fold for the window
        of rows [rc, rc+RC+2): returns [RC+2, W, 3C] in the compute dtype."""
        win = slab[slot, rc:rc + RC + 2]
        # SAME padding is zero: out-of-image halo rows carry stale buffer
        # contents (and the GN affine+swish of any value is nonzero) — mask
        # them instead of zero-writing VMEM
        rowid = rc + jax.lax.broadcasted_iota(jnp.int32, (RC + 2, 1, 1), 0)
        valid = ((rowid > 0) | (i > 0)) & ((rowid < TH + 1) | (i < nI - 1))
        if gn:
            wf = win.astype(jnp.float32) * a[None, None, :] + bb[None, None, :]
            wf = wf * jax.nn.sigmoid(wf)
            win = jnp.where(valid, wf, 0.0).astype(dtype)
        else:
            win = jnp.where(valid, win, 0)
        # fold the 3 dx taps into the contraction dim: 3 matmuls of K=3C
        # instead of 9 of K=C — fewer MXU launches, deeper pipeline
        return jnp.concatenate(
            [jnp.concatenate([zcol, win[:, :-1]], axis=1),
             win,
             jnp.concatenate([win[:, 1:], zcol], axis=1)], axis=-1)

    # two-stage software pipeline over the row windows: the (VPU) normalize of
    # window rc+RC has no data dependence on the (MXU) matmuls of window rc,
    # so emitting them adjacently lets the scheduler overlap the two units
    cur = normalized(0)
    for rc in range(0, TH, RC):
        nxt = normalized(rc + RC) if rc + RC < TH else None
        acc = jnp.zeros((RC * W, Cout), jnp.float32)
        for dy in range(3):
            acc = acc + jax.lax.dot_general(
                cur[dy:dy + RC].reshape(RC * W, 3 * C), w_ref[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0, rc:rc + RC] = (acc + bias).reshape(RC, W, Cout).astype(out_ref.dtype)
        cur = nxt


def _row_tile(H: int, W: int, C: int, itemsize: int = 2) -> int:
    """Largest divisor of H keeping one slab slot around <=2.25MB: two slots
    (double buffering) + double-buffered out blocks + per-window temps fit
    the ~16MB VMEM. ``itemsize`` is the compute dtype's byte width (the fp32
    path halves the row budget). Returns the honest budget tile — possibly
    <8 for very wide rows; ``supported()`` rejects those shapes rather than
    letting a floor blow the VMEM budget."""
    TH = max(1, min(H, (2304 * 1024) // (W * C * itemsize) - 2))
    while H % TH:
        TH -= 1
    return TH


def supported(x_shape, cout: int, itemsize: int = 2) -> bool:
    """Shape qualifies for the fused kernel: MXU lane alignment and a row
    tile that isn't degraded below 8 rows by an awkward H (prime heights
    would force tiny tiles and per-step overhead would dominate)."""
    _, h, w, c = x_shape
    return (c % 128 == 0 and cout % 128 == 0 and h >= 8
            and _row_tile(h, w, c, itemsize) >= 8)


def _gn_affine(gn_p, x: Array, num_groups: int, eps: float) -> Array:
    """Fold GroupNorm stats into a per-(batch, channel) affine: returns
    [B, 2, C] fp32 holding A (scale) and B (shift) with x_norm = x*A + B."""
    b, h, w, c = x.shape
    g = min(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4))                       # [B, g]
    var = xf.var(axis=(1, 2, 4))
    inv = jax.lax.rsqrt(var + eps)
    scale = gn_p["scale"].astype(jnp.float32).reshape(g, c // g)
    bias = gn_p["bias"].astype(jnp.float32).reshape(g, c // g)
    A = (scale[None] * inv[..., None]).reshape(b, c)
    B = (bias[None] - mean[..., None] * scale[None] * inv[..., None]).reshape(b, c)
    return jnp.stack([A, B], axis=1)


def _fused_forward(conv_p, gn_p, x, num_groups, eps, interpret):
    B, H, W, C = x.shape
    Cout = conv_p["kernel"].shape[-1]
    TH = _row_tile(H, W, C, jnp.dtype(x.dtype).itemsize)
    RC = 8 if TH % 8 == 0 else TH
    gn = gn_p is not None
    ab = (_gn_affine(gn_p, x, num_groups, eps) if gn
          else jnp.zeros((B, 2, C), jnp.float32))
    kern = functools.partial(_kernel, TH=TH, W=W, C=C, Cout=Cout, gn=gn,
                             dtype=x.dtype, RC=RC)
    return pl.pallas_call(
        kern,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights [3, 3C, Cout]
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bias [1, Cout]
            pl.BlockSpec(memory_space=pltpu.ANY),        # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, TH + 2, W, C), x.dtype),
                        pltpu.SemaphoreType.DMA((2, 3))],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * Cout,
            bytes_accessed=2 * B * H * W * (C + Cout),
            transcendentals=B * H * W * C if gn else 0),
        interpret=interpret,
    )(ab, conv_p["kernel"].reshape(3, 3 * C, Cout), conv_p["bias"].reshape(1, Cout), x)


def _unfused(conv_p, gn_p, x, num_groups, eps):
    """Reference XLA composition — also the backward-pass implementation."""
    if gn_p is not None:
        dtype = x.dtype
        b, h, w, c = x.shape
        g = min(num_groups, c)
        xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
        mean = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = xf.var(axis=(1, 2, 4), keepdims=True)
        xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
        xf = xf * gn_p["scale"].astype(jnp.float32) + gn_p["bias"].astype(jnp.float32)
        x = (xf * jax.nn.sigmoid(xf)).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, conv_p["kernel"].astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + conv_p["bias"].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_gn_swish(conv_p, gn_p, x, num_groups: int = 32, eps: float = 1e-6,
                     interpret: Optional[bool] = None):
    """``conv3x3(swish(group_norm(x)))`` (or plain conv3x3 when ``gn_p`` is
    None) via the fused Pallas kernel; exact-math vs the XLA composition.

    ``interpret=None`` auto-selects interpreter mode off-TPU so CPU CI
    exercises the same code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_forward(conv_p, gn_p, x, num_groups, eps, interpret)


def _fwd(conv_p, gn_p, x, num_groups, eps, interpret):
    out = conv3x3_gn_swish(conv_p, gn_p, x, num_groups, eps, interpret)
    return out, (conv_p, gn_p, x)


def _bwd(num_groups, eps, interpret, res, g):
    conv_p, gn_p, x = res
    _, vjp = jax.vjp(lambda c, n, xx: _unfused(c, n, xx, num_groups, eps),
                     conv_p, gn_p, x)
    return vjp(g)


conv3x3_gn_swish.defvjp(_fwd, _bwd)
