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


def siglip_preprocess(image, image_size: int = 384) -> np.ndarray:
    """SigLIP processor: resize to (size, size) bicubic, rescale 1/255,
    normalize mean=std=0.5 (reference: siglip_encoder.py:37-74).
    Returns [H, W, 3] float32.
    """
    from PIL import Image
    img = _to_pil(image).convert("RGB").resize((image_size, image_size), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    return (x - 0.5) / 0.5
