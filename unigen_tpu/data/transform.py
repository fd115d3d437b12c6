"""Image preprocessing (reference: data/transform.py:13-39 and the SigLIP
processor, models/multimodal_encoder/siglip_encoder.py:37-74).

NumPy/PIL host-side; outputs NHWC float32 (TPU layout), not torch NCHW.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _to_pil(image):
    from PIL import Image
    if isinstance(image, Image.Image):
        return image
    return Image.fromarray(np.asarray(image))


def image_transform(image, resolution: int = 256, normalize: bool = True) -> np.ndarray:
    """Resize (bicubic, short side) + center crop + scale to [-1, 1]
    (reference: data/transform.py:13-19: Resize -> CenterCrop -> Normalize(0.5, 0.5)).
    Returns [H, W, 3] float32.
    """
    from PIL import Image
    img = _to_pil(image).convert("RGB")
    w, h = img.size
    scale = resolution / min(w, h)
    img = img.resize((max(resolution, round(w * scale)), max(resolution, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left, top = (w - resolution) // 2, (h - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    x = np.asarray(img, np.float32) / 255.0
    if normalize:
        x = (x - 0.5) / 0.5
    return x


def pad_image(image, target_resolution: Tuple[int, int]) -> np.ndarray:
    """Aspect-preserving resize + symmetric zero padding (reference: transform.py:21-39)."""
    from PIL import Image
    img = _to_pil(image).convert("RGB")
    w, h = img.size
    tw, th = target_resolution
    scale = min(tw / w, th / h)
    nw, nh = int(w * scale), int(h * scale)
    img = img.resize((nw, nh), Image.BICUBIC)
    canvas = np.zeros((th, tw, 3), np.uint8)
    top, left = (th - nh) // 2, (tw - nw) // 2
    canvas[top:top + nh, left:left + nw] = np.asarray(img)
    return canvas


def naflex_target_dims(w: int, h: int, patch_size: int = 16,
                       max_num_patches: int = 256) -> tuple:
    """(target_h, target_w) of the NaFlex aspect-preserving resize: the largest
    patch-multiple dims within the patch budget. Pure arithmetic — lets callers
    (e.g. the lmms adapter's shape-bucketing) predict the prepared pixel shape
    from image header dims without decoding/resizing the pixels."""
    p = patch_size
    scale = (max_num_patches * p * p / (w * h)) ** 0.5
    th = max(p, int(round(h * scale / p)) * p)
    tw = max(p, int(round(w * scale / p)) * p)
    # rounding can overshoot the patch budget; shrink the longer side until it fits
    while (th // p) * (tw // p) > max_num_patches:
        if th >= tw and th > p:
            th -= p
        elif tw > p:
            tw -= p
        else:
            break
    return th, tw


def naflex_resize(image, patch_size: int = 16, max_num_patches: int = 256) -> np.ndarray:
    """Aspect-preserving resize to ≤ max_num_patches patches with
    patch-multiple dims + rescale + normalize(0.5, 0.5) — the image-space half
    of ``naflex_preprocess``, for callers that patchify later (the pipeline's
    NaFlex request path)."""
    from PIL import Image
    img = _to_pil(image).convert("RGB")
    w, h = img.size
    th, tw = naflex_target_dims(w, h, patch_size, max_num_patches)
    img = img.resize((tw, th), Image.BICUBIC)
    return (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5


def naflex_preprocess(image, patch_size: int = 16, max_num_patches: int = 256):
    """SigLIP2-NaFlex processor: aspect-preserving resize to ≤ max_num_patches
    patches with patch-multiple dims, rescale + normalize(0.5, 0.5), patchify,
    pad to max_num_patches (the HF Siglip2ImageProcessorFast semantics the
    reference loads at llava_data_unified.py:316-321).

    Returns {'pixel_values': [maxP, 3*p*p] f32, 'pixel_attention_mask': [maxP]
    int32, 'spatial_shapes': [2] int32 (h, w in patches)}.
    """
    x = naflex_resize(image, patch_size, max_num_patches)
    p = patch_size
    th, tw = x.shape[0], x.shape[1]
    hp, wp = th // p, tw // p
    patches = x.reshape(hp, p, wp, p, 3).transpose(0, 2, 1, 3, 4).reshape(hp * wp, -1)
    out = np.zeros((max_num_patches, patches.shape[-1]), np.float32)
    out[: patches.shape[0]] = patches
    mask = np.zeros((max_num_patches,), np.int32)
    mask[: patches.shape[0]] = 1
    return {"pixel_values": out, "pixel_attention_mask": mask,
            "spatial_shapes": np.asarray([hp, wp], np.int32)}


def siglip_preprocess(image, image_size: int = 384,
                      as_uint8: bool = False) -> np.ndarray:
    """SigLIP processor: resize to (size, size) bicubic, rescale 1/255,
    normalize mean=std=0.5 (reference: siglip_encoder.py:37-74).
    Returns [H, W, 3] float32 — or, with ``as_uint8``, the resized uint8
    pixels BEFORE normalization: the pipeline's vision forward normalizes
    integer inputs on device with the identical fp32 op sequence, so the
    two paths are bit-equal while the uint8 one ships 4x fewer bytes
    across the host->device link.
    """
    from PIL import Image
    img = _to_pil(image).convert("RGB").resize((image_size, image_size), Image.BICUBIC)
    if as_uint8:
        return np.asarray(img, np.uint8)
    x = np.asarray(img, np.float32) / 255.0
    return (x - 0.5) / 0.5
