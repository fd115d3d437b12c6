"""MAGViTv2 image tokenizer (VQGAN encoder + LFQ + decoder), TPU-native.

Functional JAX re-implementation of the reference tokenizer
(reference: models/multimodal_encoder/magvitv2.py:57-442 and common_modules.py).
Layout is **NHWC** throughout — TPU convs want channels-last so XLA can tile the
channel dimension onto the MXU lanes; the reference is NCHW torch.

Architecture (reference magvitv2.py:60-67, 287-296):
  * Encoder: ch=128, ch_mult [1,2,2,4,4], res-blocks per level [4,3,4,3,4],
    attention at resolutions {5} (i.e. disabled at 256px — only the mid block has
    attention), z_channels=13, then a 1x1 quant conv.
  * LFQ quantizer: z -> sign(z) in {-1,+1}; token = 13-bit binary code; codebook
    lookup is bit-unpacking, no embedding matmul (magvitv2.py:210-230).
  * Decoder: ch_mult [1,1,2,2,4], res-blocks [4,4,3,4,3], mirrored upsampling.

256x256 px -> 16x16 grid -> 256 tokens from a 2^13 = 8192 codebook.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
PyTree = Any


@dataclasses.dataclass(frozen=True)
class MagvitConfig:
    ch: int = 128
    enc_ch_mult: Sequence[int] = (1, 2, 2, 4, 4)
    enc_num_res_blocks: Sequence[int] = (4, 3, 4, 3, 4)
    dec_ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    dec_num_res_blocks: Sequence[int] = (4, 4, 3, 4, 3)
    attn_resolutions: Sequence[int] = (5,)
    in_ch: int = 3
    out_ch: int = 3
    resolution: int = 256
    z_channels: int = 13
    beta: float = 0.25
    entropy_multiplier: float = 0.1
    commit_loss_multiplier: float = 0.1
    dtype: Any = jnp.float32
    # fused Pallas GN+swish+conv kernels (ops/fused_conv.py). Measured on the
    # v5e chip the in-graph XLA composition is ~10% faster end-to-end (XLA
    # fuses the GN stats into the producing op's epilogue, which the separate
    # stats pre-pass here cannot match — BENCH.md tokenizer section), so
    # "auto" currently resolves to OFF; True forces the kernel (interpret
    # mode off-TPU), False disables.
    fused_convs: Any = "auto"

    @property
    def use_fused_convs(self) -> bool:
        if self.fused_convs == "auto":
            return False
        return bool(self.fused_convs)

    @property
    def codebook_size(self) -> int:
        return 2 ** self.z_channels

    @classmethod
    def tiny(cls, **kw) -> "MagvitConfig":
        defaults = dict(ch=16, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                        dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1),
                        resolution=16, z_channels=4)
        defaults.update(kw)
        return cls(**defaults)


# ---------------------------------------------------------------------------
# Building blocks (reference: common_modules.py:19-93, 171-214, 301-360)
# ---------------------------------------------------------------------------

def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * (fan_in ** -0.5)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def conv2d(p: Dict, x: Array, stride: int = 1, padding="SAME") -> Array:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def _gn_init(channels, dtype):
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def group_norm(p: Dict, x: Array, num_groups: int = 32, eps: float = 1e-6) -> Array:
    """GroupNorm(32, eps=1e-6) in fp32 (reference: common_modules.py:24-27)."""
    dtype = x.dtype
    b, h, w, c = x.shape
    g = min(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dtype)


def _resblock_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin, dtype),
        "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _gn_init(cout, dtype),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(ks[2], 1, 1, cin, cout, dtype)
    return p


def _fused_gn_conv(conv_p: Dict, gn_p: Optional[Dict], x: Array, fused: bool) -> Array:
    """conv3x3(swish(GN(x))) — via the fused Pallas kernel when enabled and the
    shape qualifies (ops/fused_conv.py), else the plain XLA composition."""
    from ..ops import fused_conv as _fc
    if fused and _fc.supported(x.shape, conv_p["kernel"].shape[-1],
                               jnp.dtype(x.dtype).itemsize):
        return _fc.conv3x3_gn_swish(conv_p, gn_p, x)
    if gn_p is not None:
        x = swish(group_norm(gn_p, x))
    return conv2d(conv_p, x)


def resblock(p: Dict, x: Array, fused: bool = False) -> Array:
    """Norm-swish-conv x2 with 1x1 shortcut (reference: common_modules.py:340-360)."""
    h = _fused_gn_conv(p["conv1"], p["norm1"], x, fused)
    h = _fused_gn_conv(p["conv2"], p["norm2"], h, fused)
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {"norm": _gn_init(c, dtype),
            "q": _conv_init(ks[0], 1, 1, c, c, dtype),
            "k": _conv_init(ks[1], 1, 1, c, c, dtype),
            "v": _conv_init(ks[2], 1, 1, c, c, dtype),
            "proj_out": _conv_init(ks[3], 1, 1, c, c, dtype)}


def attn_block(p: Dict, x: Array) -> Array:
    """Single-head full attention over the HxW grid (reference: common_modules.py:190-214).

    At the mid-block resolution (16x16 = 256 positions) this is one small fused
    matmul pair — no flash kernel needed.
    """
    b, h, w, c = x.shape
    hn = group_norm(p["norm"], x)
    q = conv2d(p["q"], hn).reshape(b, h * w, c)
    k = conv2d(p["k"], hn).reshape(b, h * w, c)
    v = conv2d(p["v"], hn).reshape(b, h * w, c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * (c ** -0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", weights, v).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out)


def upsample(p: Dict, x: Array, fused: bool = False) -> Array:
    """Nearest x2 + conv3x3 (reference: common_modules.py:30-43)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
    return _fused_gn_conv(p["conv"], None, x, fused)


def downsample(p: Dict, x: Array) -> Array:
    """Asymmetric (0,1,0,1) pad + stride-2 conv3x3 (reference: common_modules.py:86-93)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, padding="VALID")


# ---------------------------------------------------------------------------
# Encoder / Decoder (reference: magvitv2.py:57-178, 286-408)
# ---------------------------------------------------------------------------

def _init_encoder(key, cfg: MagvitConfig) -> PyTree:
    keys = iter(jax.random.split(key, 256))
    dt = cfg.dtype
    in_ch_mult = (1,) + tuple(cfg.enc_ch_mult)
    num_levels = len(cfg.enc_ch_mult)
    curr_res = cfg.resolution

    p: Dict[str, Any] = {"conv_in": _conv_init(next(keys), 3, 3, cfg.in_ch, cfg.ch, dt)}
    down: List[Dict] = []
    block_in = cfg.ch
    for i_level in range(num_levels):
        level: Dict[str, Any] = {"block": [], "attn": []}
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.enc_ch_mult[i_level]
        for _ in range(cfg.enc_num_res_blocks[i_level]):
            level["block"].append(_resblock_init(next(keys), block_in, block_out, dt))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(_attn_init(next(keys), block_in, dt))
        if i_level != num_levels - 1:
            level["downsample"] = {"conv": _conv_init(next(keys), 3, 3, block_in, block_in, dt)}
            curr_res //= 2
        down.append(level)
    p["down"] = down
    p["mid"] = {"block_1": _resblock_init(next(keys), block_in, block_in, dt),
                "attn_1": _attn_init(next(keys), block_in, dt),
                "block_2": _resblock_init(next(keys), block_in, block_in, dt)}
    p["norm_out"] = _gn_init(block_in, dt)
    p["conv_out"] = _conv_init(next(keys), 3, 3, block_in, cfg.z_channels, dt)
    p["quant_conv"] = _conv_init(next(keys), 1, 1, cfg.z_channels, cfg.z_channels, dt)
    return p


def encoder_forward(p: PyTree, cfg: MagvitConfig, x: Array) -> Array:
    """pixels [B,H,W,3] in [-1,1] -> continuous latents [B,h,w,z]."""
    fused = cfg.use_fused_convs
    h = conv2d(p["conv_in"], x)
    num_levels = len(cfg.enc_ch_mult)
    for i_level in range(num_levels):
        level = p["down"][i_level]
        for i_block, bp in enumerate(level["block"]):
            h = resblock(bp, h, fused=fused)
            if level["attn"]:
                h = attn_block(level["attn"][i_block], h)
        if i_level != num_levels - 1:
            h = downsample(level["downsample"], h)
    h = resblock(p["mid"]["block_1"], h, fused=fused)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resblock(p["mid"]["block_2"], h, fused=fused)
    h = conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))
    return conv2d(p["quant_conv"], h)


def _init_decoder(key, cfg: MagvitConfig) -> PyTree:
    keys = iter(jax.random.split(key, 256))
    dt = cfg.dtype
    num_levels = len(cfg.dec_ch_mult)
    block_in = cfg.ch * cfg.dec_ch_mult[num_levels - 1]
    curr_res = cfg.resolution // 2 ** (num_levels - 1)

    p: Dict[str, Any] = {
        "post_quant_conv": _conv_init(next(keys), 1, 1, cfg.z_channels, cfg.z_channels, dt),
        "conv_in": _conv_init(next(keys), 3, 3, cfg.z_channels, block_in, dt),
    }
    p["mid"] = {"block_1": _resblock_init(next(keys), block_in, block_in, dt),
                "attn_1": _attn_init(next(keys), block_in, dt),
                "block_2": _resblock_init(next(keys), block_in, block_in, dt)}
    up: List[Optional[Dict]] = [None] * num_levels
    for i_level in reversed(range(num_levels)):
        level: Dict[str, Any] = {"block": [], "attn": []}
        block_out = cfg.ch * cfg.dec_ch_mult[i_level]
        for _ in range(cfg.dec_num_res_blocks[i_level]):
            level["block"].append(_resblock_init(next(keys), block_in, block_out, dt))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(_attn_init(next(keys), block_in, dt))
        if i_level != 0:
            level["upsample"] = {"conv": _conv_init(next(keys), 3, 3, block_in, block_in, dt)}
            curr_res *= 2
        up[i_level] = level
    p["up"] = up
    p["norm_out"] = _gn_init(block_in, dt)
    p["conv_out"] = _conv_init(next(keys), 3, 3, block_in, cfg.out_ch, dt)
    return p


def decoder_forward(p: PyTree, cfg: MagvitConfig, z: Array) -> Array:
    """latents [B,h,w,z] (quantized) -> pixels [B,H,W,3]."""
    fused = cfg.use_fused_convs
    z = conv2d(p["post_quant_conv"], z)
    h = conv2d(p["conv_in"], z)
    h = resblock(p["mid"]["block_1"], h, fused=fused)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resblock(p["mid"]["block_2"], h, fused=fused)
    num_levels = len(cfg.dec_ch_mult)
    for i_level in reversed(range(num_levels)):
        level = p["up"][i_level]
        for i_block, bp in enumerate(level["block"]):
            h = resblock(bp, h, fused=fused)
            if level["attn"]:
                h = attn_block(level["attn"][i_block], h)
        if i_level != 0:
            h = upsample(level["upsample"], h, fused=fused)
    return conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))


# ---------------------------------------------------------------------------
# LFQ quantizer (reference: magvitv2.py:181-283)
# ---------------------------------------------------------------------------

def lfq_quantize(z: Array) -> Array:
    """sign-quantize with straight-through gradients: z -> ±1."""
    z_q = jnp.where(z > 0, 1.0, -1.0).astype(z.dtype)
    return z + jax.lax.stop_gradient(z_q - z)


def lfq_indices(z_q: Array, z_channels: int) -> Array:
    """±1 latents [B,h,w,z] -> int tokens [B,h,w] via big-endian bit packing
    (reference: magvitv2.py:210-215: power_vals = 2^(z-1..0))."""
    power_vals = 2 ** jnp.arange(z_channels - 1, -1, -1, dtype=jnp.int32)
    bits = (z_q > 0).astype(jnp.int32)
    return jnp.sum(bits * power_vals, axis=-1)


def lfq_codebook_entry(indices: Array, z_channels: int, dtype=jnp.float32) -> Array:
    """int tokens [B, N] -> ±1 latents [B, sqrt(N), sqrt(N), z] (reference :217-230)."""
    b, n = indices.shape
    side = int(n ** 0.5)
    shifts = jnp.arange(z_channels - 1, -1, -1, dtype=indices.dtype)
    bits = (indices[..., None] >> shifts) & 1
    z_q = (bits.astype(dtype) * 2.0 - 1.0)
    return z_q.reshape(b, side, side, z_channels)


def lfq_losses(z: Array, beta: float = 0.25) -> Dict[str, Array]:
    """Entropy + commitment losses for tokenizer training (reference :255-272)."""
    zf = z.astype(jnp.float32).reshape(-1, z.shape[-1])
    z_q = jnp.where(zf > 0, 1.0, -1.0)
    z_q_ste = zf + jax.lax.stop_gradient(z_q - zf)  # straight-through estimator
    # per-dim two-way categorical over distance to ±1
    logit = jnp.stack([-(zf - 1.0) ** 2, -(zf + 1.0) ** 2], axis=-1)
    logp = jax.nn.log_softmax(logit, axis=-1)
    probs = jnp.exp(logp)
    entropy = (-(probs * logp).sum(-1)).mean()
    mean_prob = probs.mean(0)
    mean_entropy = (-(mean_prob * jnp.log(mean_prob + 1e-12)).sum(-1)).mean()
    # value AND gradient structure match the reference: the first term pulls z
    # toward the codes, the second (scaled by beta) flows through the STE
    commit = (jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2)
              + beta * jnp.mean((z_q_ste - jax.lax.stop_gradient(zf)) ** 2))
    return {"entropy_loss": entropy - mean_entropy, "commit_loss": commit}


# ---------------------------------------------------------------------------
# Top-level tokenizer API (reference: magvitv2.py:411-442)
# ---------------------------------------------------------------------------

def init(key: Array, cfg: MagvitConfig) -> PyTree:
    k_enc, k_dec = jax.random.split(key)
    return {"encoder": _init_encoder(k_enc, cfg), "decoder": _init_decoder(k_dec, cfg)}


def get_code(params: PyTree, cfg: MagvitConfig, pixel_values: Array) -> Array:
    """pixels [B,H,W,3] -> tokens [B, N] (reference: magvitv2.py:432-436)."""
    z = encoder_forward(params["encoder"], cfg, pixel_values)
    z_q = lfq_quantize(z)
    return lfq_indices(z_q, cfg.z_channels).reshape(pixel_values.shape[0], -1)


def decode_code(params: PyTree, cfg: MagvitConfig, codebook_indices: Array) -> Array:
    """tokens [B, N] -> pixels [B,H,W,3] (reference: magvitv2.py:438-442)."""
    z_q = lfq_codebook_entry(codebook_indices, cfg.z_channels, cfg.dtype)
    return decoder_forward(params["decoder"], cfg, z_q)


def encode(params: PyTree, cfg: MagvitConfig, pixel_values: Array) -> Tuple[Array, Array]:
    z = encoder_forward(params["encoder"], cfg, pixel_values)
    z_q = lfq_quantize(z)
    indices = lfq_indices(z_q, cfg.z_channels).reshape(pixel_values.shape[0], -1)
    return z_q, indices


# ---------------------------------------------------------------------------
# Torch weight import (reference checkpoints are NCHW torch state dicts)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd: dict, cfg: MagvitConfig) -> PyTree:
    """Map the reference MAGVITv2 state dict (numpy arrays) to our NHWC pytree."""
    import numpy as np

    def conv(name):
        w = np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0)  # OIHW -> HWIO
        return {"kernel": jnp.asarray(w, cfg.dtype),
                "bias": jnp.asarray(np.asarray(sd[name + ".bias"]), cfg.dtype)}

    def gn(name):
        return {"scale": jnp.asarray(np.asarray(sd[name + ".weight"]), cfg.dtype),
                "bias": jnp.asarray(np.asarray(sd[name + ".bias"]), cfg.dtype)}

    def res(name, cin, cout):
        p = {"norm1": gn(name + ".norm1"), "conv1": conv(name + ".conv1"),
             "norm2": gn(name + ".norm2"), "conv2": conv(name + ".conv2")}
        if cin != cout:
            p["nin_shortcut"] = conv(name + ".nin_shortcut")
        return p

    def attn(name):
        return {"norm": gn(name + ".norm"), "q": conv(name + ".q"), "k": conv(name + ".k"),
                "v": conv(name + ".v"), "proj_out": conv(name + ".proj_out")}

    enc: Dict[str, Any] = {"conv_in": conv("encoder.conv_in"),
                           "quant_conv": conv("encoder.quant_conv"),
                           "conv_out": conv("encoder.conv_out"),
                           "norm_out": gn("encoder.norm_out")}
    in_ch_mult = (1,) + tuple(cfg.enc_ch_mult)
    num_levels = len(cfg.enc_ch_mult)
    curr_res = cfg.resolution
    down = []
    block_in = cfg.ch
    for i in range(num_levels):
        level: Dict[str, Any] = {"block": [], "attn": []}
        block_in = cfg.ch * in_ch_mult[i]
        block_out = cfg.ch * cfg.enc_ch_mult[i]
        for j in range(cfg.enc_num_res_blocks[i]):
            level["block"].append(res(f"encoder.down.{i}.block.{j}", block_in, block_out))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(attn(f"encoder.down.{i}.attn.{j}"))
        if i != num_levels - 1:
            level["downsample"] = {"conv": conv(f"encoder.down.{i}.downsample.conv")}
            curr_res //= 2
        down.append(level)
    enc["down"] = down
    enc["mid"] = {"block_1": res("encoder.mid.block_1", block_in, block_in),
                  "attn_1": attn("encoder.mid.attn_1"),
                  "block_2": res("encoder.mid.block_2", block_in, block_in)}

    num_levels_d = len(cfg.dec_ch_mult)
    block_in = cfg.ch * cfg.dec_ch_mult[num_levels_d - 1]
    curr_res = cfg.resolution // 2 ** (num_levels_d - 1)
    dec: Dict[str, Any] = {"post_quant_conv": conv("decoder.post_quant_conv"),
                           "conv_in": conv("decoder.conv_in"),
                           "conv_out": conv("decoder.conv_out"),
                           "norm_out": gn("decoder.norm_out")}
    dec["mid"] = {"block_1": res("decoder.mid.block_1", block_in, block_in),
                  "attn_1": attn("decoder.mid.attn_1"),
                  "block_2": res("decoder.mid.block_2", block_in, block_in)}
    up: List[Optional[Dict]] = [None] * num_levels_d
    for i in reversed(range(num_levels_d)):
        level = {"block": [], "attn": []}
        block_out = cfg.ch * cfg.dec_ch_mult[i]
        for j in range(cfg.dec_num_res_blocks[i]):
            level["block"].append(res(f"decoder.up.{i}.block.{j}", block_in, block_out))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(attn(f"decoder.up.{i}.attn.{j}"))
        if i != 0:
            level["upsample"] = {"conv": conv(f"decoder.up.{i}.upsample.conv")}
            curr_res *= 2
        up[i] = level
    dec["up"] = up
    return {"encoder": enc, "decoder": dec}
