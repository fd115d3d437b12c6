"""SigLIP vision tower (SigLIP-SO400M-patch14-384), TPU-native.

Functional re-implementation of the reference tower
(reference: models/multimodal_encoder/siglip_encoder.py:76-621). Key behaviors:

* ViT: conv patch embed + learned position embeddings, pre-LN encoder blocks with
  gelu_pytorch_tanh MLPs, fp32 softmax attention (reference :231).
* The tower **drops the final encoder layer** and replaces the pooling head with
  identity (reference :573-574); its output is the hidden state after the remaining
  layers, *without* the post-layernorm (reference :579-590 returns
  ``hidden_states[-1]``) — 729 patch features of width 1152 for 384px/patch14.
* Stacked-layer ``lax.scan`` over depth, NHWC patchification.

Image preprocessing parity (SigLipImageProcessor, reference :37-74): resize to 384
(bicubic), rescale 1/255, normalize mean=std=0.5 — implemented in data/transform.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention

Array = jax.Array
PyTree = Any


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    drop_last_layer: bool = True   # the UniGen tower deletes layer 27 (reference :573)
    dtype: Any = jnp.float32

    @property
    def num_layers_used(self) -> int:
        return self.num_hidden_layers - (1 if self.drop_last_layer else 0)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def so400m(cls, **kw) -> "SiglipConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "SiglipConfig":
        defaults = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                        num_attention_heads=4, image_size=28, patch_size=14)
        defaults.update(kw)
        return cls(**defaults)


def _dense_init(key, din, dout, dtype):
    w = jax.random.normal(key, (din, dout), jnp.float32) * (din ** -0.5)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((dout,), dtype)}


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _layer_init(key, cfg: SiglipConfig):
    d, i = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 6)
    return {
        "ln1": _ln_init(d, cfg.dtype),
        "attn": {"q": _dense_init(ks[0], d, d, cfg.dtype),
                 "k": _dense_init(ks[1], d, d, cfg.dtype),
                 "v": _dense_init(ks[2], d, d, cfg.dtype),
                 "o": _dense_init(ks[3], d, d, cfg.dtype)},
        "ln2": _ln_init(d, cfg.dtype),
        "mlp": {"fc1": _dense_init(ks[4], d, i, cfg.dtype),
                "fc2": _dense_init(ks[5], i, d, cfg.dtype)},
    }


def init(key: Array, cfg: SiglipConfig) -> PyTree:
    k_patch, k_pos, k_layers = jax.random.split(key, 3)
    n_layers = cfg.num_layers_used
    layers = jax.vmap(lambda k: _layer_init(k, cfg))(jax.random.split(k_layers, n_layers))
    fan_in = cfg.patch_size * cfg.patch_size * cfg.num_channels
    patch_w = jax.random.normal(
        k_patch, (cfg.patch_size, cfg.patch_size, cfg.num_channels, cfg.hidden_size),
        jnp.float32) * (fan_in ** -0.5)
    return {
        "patch_embed": {"kernel": patch_w.astype(cfg.dtype),
                        "bias": jnp.zeros((cfg.hidden_size,), cfg.dtype)},
        "pos_embed": {"weight": (jax.random.normal(
            k_pos, (cfg.num_patches, cfg.hidden_size), jnp.float32) * 0.02).astype(cfg.dtype)},
        "layers": layers,
    }


def layer_norm(p, x: Array, eps: float) -> Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dtype)


def _dense(p, x):
    if "kernel_int8" in p:
        from ..ops.quantization import dense_int8
        return dense_int8(p, x)
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _bidir_attention(q: Array, k: Array, v: Array, scale: float,
                     force_flash: Optional[bool] = None) -> Array:
    """Full (unmasked) self-attention over the patch grid.

    On TPU the eager path materializes a [B, H, P, P] fp32 logits tensor in
    HBM per layer (~272MB at batch 8 / 729 patches — the dominant tower HBM
    traffic); route through the Pallas flash kernel instead. SO400M's
    head_dim is 72: zero-pad q/k/v to the kernel's 128-lane tile — exact
    (zeros contribute nothing to the contraction; padded output channels are
    sliced off) at 78% extra attention-matmul FLOPs, a good trade for
    removing the logits round trip. The explicit ``scale`` keeps the real
    1/sqrt(72) under padding. CPU/CI takes the XLA path by default;
    ``force_flash=True`` routes through the kernel anyway (interpret mode off
    TPU) for the parity test in tests/test_quantization.py."""
    on_tpu = jax.default_backend() == "tpu"
    if force_flash if force_flash is not None else on_tpu:
        from ..ops.flash_attention import _BIDIRQ_BIT, flash_attention
        b, l, h, dh = q.shape
        pad = (-dh) % 128
        if pad:
            cfgpad = [(0, 0)] * 3 + [(0, pad)]
            q, k, v = (jnp.pad(t, cfgpad) for t in (q, k, v))
        meta = jnp.full((b, l), _BIDIRQ_BIT, jnp.int32)
        out = flash_attention(q, k, v, meta, scale=scale, interpret=not on_tpu)
        return out[..., :dh] if pad else out
    return dot_product_attention(q, k, v, scale=scale)


def _encoder_layer(p, cfg: SiglipConfig, x: Array) -> Array:
    b, l, d = x.shape
    h = cfg.num_attention_heads
    dh = d // h
    res = x
    x = layer_norm(p["ln1"], x, cfg.layer_norm_eps)
    if "kernel_int8" in p["attn"]["q"]:
        # q/k/v share the input: quantize activations once for all three
        from ..ops.quantization import dense_int8_prequant, quantize_activations
        x8, xs = quantize_activations(x)
        q = dense_int8_prequant(p["attn"]["q"], x8, xs, x.dtype).reshape(b, l, h, dh)
        k = dense_int8_prequant(p["attn"]["k"], x8, xs, x.dtype).reshape(b, l, h, dh)
        v = dense_int8_prequant(p["attn"]["v"], x8, xs, x.dtype).reshape(b, l, h, dh)
    else:
        q = _dense(p["attn"]["q"], x).reshape(b, l, h, dh)
        k = _dense(p["attn"]["k"], x).reshape(b, l, h, dh)
        v = _dense(p["attn"]["v"], x).reshape(b, l, h, dh)
    attn = _bidir_attention(q, k, v, dh ** -0.5).reshape(b, l, d)
    x = res + _dense(p["attn"]["o"], attn)
    res = x
    x = layer_norm(p["ln2"], x, cfg.layer_norm_eps)
    x = _dense(p["mlp"]["fc1"], x)
    x = jax.nn.gelu(x, approximate=True)  # gelu_pytorch_tanh
    x = res + _dense(p["mlp"]["fc2"], x)
    return x


def forward(params: PyTree, cfg: SiglipConfig, pixel_values: Array) -> Array:
    """pixels [B, H, W, 3] (normalized ±1) -> patch features [B, P, D].

    Matches the tower output: embeddings through the first (num_layers-1) encoder
    layers, no post-layernorm, no pooling head.
    """
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(cfg.dtype), params["patch_embed"]["kernel"].astype(cfg.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["bias"].astype(cfg.dtype)
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    x = x + params["pos_embed"]["weight"].astype(cfg.dtype)[None]

    def body(carry, layer_params):
        return _encoder_layer(layer_params, cfg, carry), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def convert_hf_state_dict(sd: dict, cfg: SiglipConfig,
                          prefix: str = "vision_model.") -> PyTree:
    """Map a HF SiglipVisionModel state dict (numpy) to our pytree, dropping the
    final encoder layer when configured (reference tower surgery, :573-574)."""
    import numpy as np

    def get(name):
        return np.asarray(sd[prefix + name])

    def stack(fmt, transpose=False):
        ws = [get(fmt.format(i)) for i in range(cfg.num_layers_used)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]), cfg.dtype)

    def stack_dense(fmt):
        return {"kernel": stack(fmt + ".weight", transpose=True),
                "bias": stack(fmt + ".bias")}

    patch_w = get("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0)  # OIHW->HWIO
    return {
        "patch_embed": {"kernel": jnp.asarray(patch_w, cfg.dtype),
                        "bias": jnp.asarray(get("embeddings.patch_embedding.bias"), cfg.dtype)},
        "pos_embed": {"weight": jnp.asarray(get("embeddings.position_embedding.weight"),
                                            cfg.dtype)},
        "layers": {
            "ln1": {"scale": stack("encoder.layers.{}.layer_norm1.weight"),
                    "bias": stack("encoder.layers.{}.layer_norm1.bias")},
            "attn": {"q": stack_dense("encoder.layers.{}.self_attn.q_proj"),
                     "k": stack_dense("encoder.layers.{}.self_attn.k_proj"),
                     "v": stack_dense("encoder.layers.{}.self_attn.v_proj"),
                     "o": stack_dense("encoder.layers.{}.self_attn.out_proj")},
            "ln2": {"scale": stack("encoder.layers.{}.layer_norm2.weight"),
                    "bias": stack("encoder.layers.{}.layer_norm2.bias")},
            "mlp": {"fc1": stack_dense("encoder.layers.{}.mlp.fc1"),
                    "fc2": stack_dense("encoder.layers.{}.mlp.fc2")},
        },
    }
