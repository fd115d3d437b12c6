"""GenEval-protocol text-to-image generation entry point.

Mirrors evaluation/inference_geneval.py (reference :148-292): for each metadata
line, generate ``n_samples`` images at guidance 6 / 50 steps / 256px / text len
128 (reference scripts/run_evaluation.sh:122-131) and write
``<outdir>/<idx:05d>/samples/<i:04d>.png`` + ``metadata.jsonl``.

Prompts are sharded across hosts by ``jax.process_index`` (the reference uses
accelerate PartialState.split_between_processes, inference_geneval.py:190-192);
candidates for one prompt ride as one device batch.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from ..pipeline import UniGenPipeline, pixels_to_uint8


def save_png(arr: np.ndarray, path: str) -> None:
    from PIL import Image
    # device fetches can be F-contiguous on TPU backends; PIL needs C order
    Image.fromarray(np.ascontiguousarray(arr)).save(path)


def shard_for_process(items: Sequence, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> List:
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]


def run_geneval(
    pipeline: UniGenPipeline,
    metadata: List[Dict],
    output_dir: str,
    key,
    *,
    n_samples: int = 4,
    guidance_scale: float = 6.0,
    timesteps: int = 50,
    temperature: float = 1.0,
    eval_text_len: int = 128,
    mode: str = "mask",
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[str]:
    """Returns the list of written sample directories (this process's shard).

    One-deep pipelined: generation of prompt i+1 is dispatched (async) before
    prompt i's pixels are fetched, so the host-side uint8 convert + PNG writes
    overlap the device's next sampler run instead of stranding it — the
    reference evaluates strictly synchronously (inference_geneval.py:229-270).
    Identical outputs: per-prompt RNG keys are split in the same order."""
    written = []

    def _flush(item):
        idx, md, pixels = item
        imgs = pixels_to_uint8(pixels)   # host fetch: device already runs i+1
        outpath = os.path.join(output_dir, f"{idx:0>5}")
        sample_dir = os.path.join(outpath, "samples")
        os.makedirs(sample_dir, exist_ok=True)
        with open(os.path.join(outpath, "metadata.jsonl"), "w") as f:
            json.dump(md, f)
        for i in range(n_samples):
            save_png(imgs[i], os.path.join(sample_dir, f"{i:05}.png"))
        written.append(outpath)

    pending = None
    indexed = list(enumerate(metadata))
    for idx, md in shard_for_process(indexed, process_index, process_count):
        prompt = md.get("prompt", md.get("text"))
        key, sub = jax.random.split(key)
        pixels = pipeline.generate_images(
            [prompt] * n_samples, sub, guidance_scale=guidance_scale,
            timesteps=timesteps, temperature=temperature,
            max_text_len=eval_text_len, mode=mode)
        if pending is not None:
            _flush(pending)
        pending = (idx, md, pixels)
    if pending is not None:
        _flush(pending)
    return written


def load_metadata_jsonl(path: str) -> List[Dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
