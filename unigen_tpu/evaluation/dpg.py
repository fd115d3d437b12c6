"""DPG-bench text-to-image entry point.

Mirrors evaluation/inference_dpg.py (reference :139-277): guidance 6, 50 steps,
4 samples, eval_text_len 256; output is one 2x2 grid PNG per prompt
(reference :264-266 uses torchvision make_grid), named ``<prompt_id>.png``.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..pipeline import UniGenPipeline, pixels_to_uint8
from .geneval import save_png, shard_for_process


def make_grid_2x2(imgs: np.ndarray) -> np.ndarray:
    """[4, H, W, 3] uint8 -> [2H, 2W, 3] grid (reference :264-266)."""
    top = np.concatenate([imgs[0], imgs[1]], axis=1)
    bottom = np.concatenate([imgs[2], imgs[3]], axis=1)
    return np.concatenate([top, bottom], axis=0)


def run_dpg(
    pipeline: UniGenPipeline,
    prompts: List[Dict],       # [{"item_id": ..., "text": ...}]
    output_dir: str,
    key,
    *,
    n_samples: int = 4,
    guidance_scale: float = 6.0,
    timesteps: int = 50,
    temperature: float = 1.0,
    eval_text_len: int = 256,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[str]:
    os.makedirs(output_dir, exist_ok=True)
    written = []

    # one-deep pipeline: host grid/PNG work for item i overlaps the device's
    # sampler run for item i+1 (same discipline as geneval.run_geneval)
    def _flush(item, pixels):
        grid = make_grid_2x2(pixels_to_uint8(pixels))
        path = os.path.join(output_dir, f"{item['item_id']}.png")
        save_png(grid, path)
        written.append(path)

    pending = None
    for item in shard_for_process(prompts, process_index, process_count):
        key, sub = jax.random.split(key)
        pixels = pipeline.generate_images(
            [item["text"]] * n_samples, sub, guidance_scale=guidance_scale,
            timesteps=timesteps, temperature=temperature, max_text_len=eval_text_len)
        if pending is not None:
            _flush(*pending)
        pending = (item, pixels)
    if pending is not None:
        _flush(*pending)
    return written
