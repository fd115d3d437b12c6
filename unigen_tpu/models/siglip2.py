"""SigLIP2-NaFlex vision tower: variable-aspect-ratio images, TPU-native.

Reference: models/multimodal_encoder/siglip2_encoder.py — patchified pixels enter
through a Linear patch embed (:118-121), position embeddings are bilinearly
resized per image to its (h, w) grid (:127-184), and padding is carried via
``pixel_attention_mask`` + ``spatial_shapes``; the UniGen tower drops the last
encoder layer and runs headless (:952-955).

TPU-first split: the per-image position-embedding resize has *dynamic* target
shapes, so it runs on host with a per-shape cache (bucketing keeps jit from
retracing — SURVEY.md §7 hard part 4) and the fixed-shape result rides into the
jitted encoder as a plain input array.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from .siglip import _dense_init, _layer_init, _ln_init, layer_norm, _dense

Array = jax.Array
PyTree = Any


@dataclasses.dataclass(frozen=True)
class Siglip2Config:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    num_patches: int = 256           # 16x16 base position grid
    patch_size: int = 16
    layer_norm_eps: float = 1e-6
    drop_last_layer: bool = True
    dtype: Any = jnp.float32

    @property
    def num_layers_used(self) -> int:
        return self.num_hidden_layers - (1 if self.drop_last_layer else 0)

    @property
    def patch_dim(self) -> int:
        return self.num_channels * self.patch_size * self.patch_size

    @classmethod
    def naflex(cls, **kw) -> "Siglip2Config":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "Siglip2Config":
        defaults = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                        num_attention_heads=4, num_patches=16, patch_size=4)
        defaults.update(kw)
        return cls(**defaults)


def init(key: Array, cfg: Siglip2Config) -> PyTree:
    k_patch, k_pos, k_layers = jax.random.split(key, 3)
    # reuse the SigLIP encoder layer structure; only the embedding differs
    from .siglip import SiglipConfig
    layer_cfg = SiglipConfig(hidden_size=cfg.hidden_size,
                             intermediate_size=cfg.intermediate_size,
                             num_attention_heads=cfg.num_attention_heads,
                             layer_norm_eps=cfg.layer_norm_eps, dtype=cfg.dtype)
    layers = jax.vmap(lambda k: _layer_init(k, layer_cfg))(
        jax.random.split(k_layers, cfg.num_layers_used))
    return {
        "patch_embed": _dense_init(k_patch, cfg.patch_dim, cfg.hidden_size, cfg.dtype),
        "pos_embed": {"weight": (jax.random.normal(
            k_pos, (cfg.num_patches, cfg.hidden_size), jnp.float32) * 0.02
        ).astype(cfg.dtype)},
        "layers": layers,
    }


class _PosEmbedCache:
    """Host-side per-(h, w) cache of resized position grids."""

    def __init__(self):
        self._cache: Dict[Tuple, np.ndarray] = {}

    def get(self, pos: np.ndarray, h: int, w: int) -> np.ndarray:
        # key includes the table contents: different towers share this cache
        key = (h, w, pos.shape[-1], hash(pos.tobytes()))
        if key not in self._cache:
            side = int(pos.shape[0] ** 0.5)
            grid = pos.reshape(side, side, -1).astype(np.float32)
            resized = jax.image.resize(jnp.asarray(grid), (h, w, grid.shape[-1]),
                                       method="bilinear", antialias=True)
            self._cache[key] = np.asarray(resized).reshape(h * w, -1)
        return self._cache[key]


_POS_CACHE = _PosEmbedCache()


def resize_positional_embeddings(pos_weight, spatial_shapes: np.ndarray,
                                 max_length: int) -> np.ndarray:
    """Per-image bilinear-resized position embeddings, padded to max_length
    (reference: siglip2_encoder.py:127-184; padding slots repeat entry 0 as there,
    they are masked out downstream)."""
    pos = np.asarray(pos_weight)
    b = spatial_shapes.shape[0]
    out = np.empty((b, max_length, pos.shape[-1]), np.float32)
    for i in range(b):
        h, w = int(spatial_shapes[i, 0]), int(spatial_shapes[i, 1])
        r = _POS_CACHE.get(pos, h, w)
        out[i, : h * w] = r
        out[i, h * w:] = r[0]
    return out


def encoder_forward(params: PyTree, cfg: Siglip2Config, embeddings: Array,
                    pixel_attention_mask: Array) -> Array:
    """Padded-sequence encoder (reference Siglip2Encoder, :369+): standard pre-LN
    blocks with a key-side padding mask, last layer dropped."""
    from .siglip import SiglipConfig
    layer_cfg = SiglipConfig(hidden_size=cfg.hidden_size,
                             intermediate_size=cfg.intermediate_size,
                             num_attention_heads=cfg.num_attention_heads,
                             layer_norm_eps=cfg.layer_norm_eps, dtype=cfg.dtype)
    keep = pixel_attention_mask.astype(bool)
    mask = keep[:, None, None, :]  # queries may be pads; their outputs are ignored

    def layer(p, x):
        b, l, d = x.shape
        h = cfg.num_attention_heads
        dh = d // h
        res = x
        x = layer_norm(p["ln1"], x, cfg.layer_norm_eps)
        q = _dense(p["attn"]["q"], x).reshape(b, l, h, dh)
        k = _dense(p["attn"]["k"], x).reshape(b, l, h, dh)
        v = _dense(p["attn"]["v"], x).reshape(b, l, h, dh)
        attn = dot_product_attention(q, k, v, mask=mask).reshape(b, l, d)
        x = res + _dense(p["attn"]["o"], attn)
        res = x
        x = layer_norm(p["ln2"], x, cfg.layer_norm_eps)
        x = _dense(p["mlp"]["fc1"], x)
        x = jax.nn.gelu(x, approximate=True)
        return res + _dense(p["mlp"]["fc2"], x), None

    x, _ = jax.lax.scan(lambda c, p: layer(p, c), embeddings, params["layers"])
    return x


def forward(params: PyTree, cfg: Siglip2Config, pixel_values: Array,
            pixel_attention_mask: Array, spatial_shapes) -> Array:
    """NaFlex forward. ``pixel_values``: [B, maxN, patch_dim] pre-patchified;
    ``spatial_shapes``: [B, 2] (h, w) per image (host numpy)."""
    pos = resize_positional_embeddings(params["pos_embed"]["weight"],
                                       np.asarray(spatial_shapes),
                                       pixel_values.shape[1])
    return forward_with_pos(params, cfg, pixel_values, pixel_attention_mask,
                            jnp.asarray(pos, cfg.dtype))


def forward_with_pos(params: PyTree, cfg: Siglip2Config, pixel_values: Array,
                     pixel_attention_mask: Array, pos_embeds: Array) -> Array:
    """NaFlex forward with pre-resized position embeddings [B, maxN, D].

    The jit-safe entry: ``resize_positional_embeddings`` runs host-side (a
    python loop over a cache), so jitted consumers (the NaFlex SFT step,
    training/sft.py) precompute ``pos_embeds`` per batch and pass them in."""
    x = _dense(params["patch_embed"], pixel_values.astype(cfg.dtype))
    x = x + pos_embeds.astype(cfg.dtype)
    return encoder_forward(params, cfg, x, pixel_attention_mask)


def patchify(image: np.ndarray, patch_size: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """[H, W, 3] -> ([h*w, 3*p*p], (h, w)); H/W must be multiples of patch_size."""
    h, w = image.shape[0] // patch_size, image.shape[1] // patch_size
    x = image[: h * patch_size, : w * patch_size]
    x = x.reshape(h, patch_size, w, patch_size, -1).transpose(0, 2, 1, 3, 4)
    return x.reshape(h * w, -1), (h, w)


def convert_hf_state_dict(sd: dict, cfg: Siglip2Config,
                          prefix: str = "vision_model.") -> PyTree:
    """Map HF Siglip2VisionModel weights (numpy) to our pytree (drop-last-layer)."""
    def get(name):
        return np.asarray(sd[prefix + name])

    def stack(fmt, transpose=False):
        ws = [get(fmt.format(i)) for i in range(cfg.num_layers_used)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]), cfg.dtype)

    def stack_dense(fmt):
        return {"kernel": stack(fmt + ".weight", transpose=True),
                "bias": stack(fmt + ".bias")}

    return {
        "patch_embed": {"kernel": jnp.asarray(get("embeddings.patch_embedding.weight").T,
                                              cfg.dtype),
                        "bias": jnp.asarray(get("embeddings.patch_embedding.bias"),
                                            cfg.dtype)},
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
