"""In-training visual checks.

Reference: train.py:847-875 — periodic image generation (`generate_images`,
:969-1084) and [original | VQ reconstruction | model prediction] triptychs
(`visualize_predictions`, :892-967) logged to wandb. These are the reference's
de-facto tests (SURVEY.md §4); here they return uint8 arrays for any sink
(MetricLogger image dir, wandb, disk).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import magvit, unigen
from ..ops import masks as M
from ..pipeline import UniGenPipeline, pixels_to_uint8

Array = jax.Array


def generate_images(pipeline: UniGenPipeline, validation_prompts: Sequence[str],
                    key, *, guidance_scale: float = 2.0, timesteps: int = 16,
                    max_text_len: int = 128) -> np.ndarray:
    """Training-time sample generation at the train-time protocol (guidance 2.0,
    16 steps — reference configs/unigen_1_5b/unigen_pt1.yaml:99-100)."""
    px = pipeline.generate_images(list(validation_prompts), key,
                                  guidance_scale=guidance_scale,
                                  timesteps=timesteps, max_text_len=max_text_len)
    return pixels_to_uint8(px)


def visualize_predictions(
    params,
    cfg: unigen.UniGenConfig,
    vq_params,
    vq_cfg: magvit.MagvitConfig,
    pixels: Array,           # [B, H, W, 3] the training batch images
    input_ids: Array,        # [B, L] the (masked) t2i training sequences
    pad_id: int, soi_id: int, eoi_id: int,
) -> np.ndarray:
    """[original | VQ reconstruction | model argmax prediction] triptychs
    (reference: train.py:892-967). Returns [B, H, 3W, 3] uint8."""
    n = cfg.num_vq_tokens
    codes = magvit.get_code(vq_params, vq_cfg, pixels)
    recon = magvit.decode_code(vq_params, vq_cfg, codes)

    attn = M.create_attention_mask_predict_next(input_ids, pad_id, soi_id, eoi_id,
                                                rm_pad_in_image=True)
    logits = unigen.forward(params, cfg, input_ids=input_ids, attention_mask=attn,
                            batch_size_t2i=input_ids.shape[0])
    img_logits = logits[:, -(n + 1):-1]
    if not cfg.use_gen_projector:
        img_logits = img_logits[..., cfg.text_vocab_len:
                                cfg.text_vocab_len + cfg.codebook_size]
    pred = jnp.argmax(img_logits, axis=-1)
    # keep already-known tokens; predict only the masked ones (reference :930-940)
    block = input_ids[:, -(n + 1):-1]
    known_cb = jnp.where(block == cfg.mask_token_id, pred,
                         jnp.clip(block - cfg.text_vocab_len, 0, cfg.codebook_size - 1)
                         if not cfg.use_gen_projector else block)
    predicted = magvit.decode_code(vq_params, vq_cfg, known_cb)

    trip = jnp.concatenate([pixels, recon.astype(pixels.dtype),
                            predicted.astype(pixels.dtype)], axis=2)
    return pixels_to_uint8(trip)


def masked_t2i_inputs(vq_params, vq_cfg: magvit.MagvitConfig, cfg: unigen.UniGenConfig,
                      template: Array, pixels: Array, key, *,
                      mask_schedule: str = "cosine",
                      min_masking_rate: float = 0.0) -> Array:
    """Rebuild the train-step's masked t2i sequence for visualization: VQ-encode
    the batch images, MaskGIT-corrupt them, splice into the prompt template at
    the image slot (same layout as training/train_step.py::build_inputs)."""
    from ..ops import masking as MK
    from ..ops import sampling as S

    n = cfg.num_vq_tokens
    codes = magvit.get_code(vq_params, vq_cfg, pixels)
    masked = MK.mask_or_random_replace_tokens(
        key, codes, cfg.codebook_size, S.get_mask_schedule(mask_schedule),
        min_masking_rate=min_masking_rate, codebook_size=cfg.codebook_size)
    if cfg.use_gen_projector:
        img = masked.input_ids
    else:
        img = jnp.where(masked.input_ids == cfg.codebook_size, cfg.mask_token_id,
                        masked.input_ids + cfg.text_vocab_len)
    return jax.lax.dynamic_update_slice(
        template, img.astype(template.dtype), (0, template.shape[1] - n - 1))


def save_image_grid(images: np.ndarray, path: str, cols: Optional[int] = None) -> None:
    """uint8 [B, H, W, 3] -> one grid PNG."""
    from PIL import Image
    b, h, w, _ = images.shape
    cols = cols or min(b, 4)
    rows = (b + cols - 1) // cols
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(b):
        r, c = divmod(i, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = images[i]
    Image.fromarray(canvas).save(path)
