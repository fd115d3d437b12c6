"""Portable model persistence: config.json + (sharded) safetensors.

The diffusers-style ModelMixin format the reference uses for stage handoff
(reference: models/modeling_utils.py:257-401 save_pretrained with 10GB shards,
:403-855 from_pretrained with shard-index resolution). Our params are flat
pytrees; tensors are stored under '/'-joined tree paths so checkpoints are
self-describing and framework-neutral. ``import/export`` interoperates with the
reference's torch key layout through utils/hf_import.py.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

PyTree = Any

MAX_SHARD_BYTES = 10 * 1024 ** 3  # reference shards at 10GB (modeling_utils.py:257)
WEIGHTS_NAME = "model.safetensors"
INDEX_NAME = "model.safetensors.index.json"
CONFIG_NAME = "config.json"


def _flatten(params: PyTree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        # ascontiguousarray is load-bearing: on TPU backends np.asarray can
        # return a zero-copy F-contiguous view of the device layout, and
        # safetensors serializes the raw buffer assuming C order — without the
        # copy, checkpoints written on hardware come back silently TRANSPOSED
        # (caught by a hardware drive of save_pretrained on the v5e).
        flat[key] = np.ascontiguousarray(np.asarray(leaf))
    return flat


def _unflatten(flat: Dict[str, np.ndarray], template: PyTree) -> PyTree:
    leaves_with_path = jax.tree_util.tree_leaves_with_path(template)
    out = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing tensor {key}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"{key}: shape {arr.shape} != expected {leaf.shape}")
        out.append(jax.numpy.asarray(arr, leaf.dtype))
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, out)


def save_pretrained(params: PyTree, save_dir: str,
                    config: Optional[Any] = None,
                    max_shard_bytes: int = MAX_SHARD_BYTES) -> None:
    """Write config.json + safetensors (sharded over max_shard_bytes)."""
    from safetensors.numpy import save_file
    os.makedirs(save_dir, exist_ok=True)
    if config is not None:
        cfg = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
        cfg = {k: (str(v) if not isinstance(v, (int, float, bool, str, list, dict,
                                                tuple, type(None))) else v)
               for k, v in _flatten_cfg(cfg).items()}
        with open(os.path.join(save_dir, CONFIG_NAME), "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    flat = _flatten(params)
    shards, current, size = [], {}, 0
    for key, arr in flat.items():
        if current and size + arr.nbytes > max_shard_bytes:
            shards.append(current)
            current, size = {}, 0
        current[key] = arr
        size += arr.nbytes
    if current:
        shards.append(current)

    if len(shards) == 1:
        save_file(shards[0], os.path.join(save_dir, WEIGHTS_NAME))
        return
    weight_map = {}
    for i, shard in enumerate(shards):
        name = f"model-{i + 1:05d}-of-{len(shards):05d}.safetensors"
        save_file(shard, os.path.join(save_dir, name))
        for k in shard:
            weight_map[k] = name
    with open(os.path.join(save_dir, INDEX_NAME), "w") as f:
        json.dump({"metadata": {"total_size": sum(a.nbytes for a in flat.values())},
                   "weight_map": weight_map}, f, indent=2)


def _flatten_cfg(cfg: Dict, prefix: str = "") -> Dict:
    out = {}
    for k, v in cfg.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_cfg(v, key))
        else:
            out[key] = v
    return out


def from_pretrained(save_dir: str, template: PyTree) -> Tuple[PyTree, Optional[Dict]]:
    """Load params into the structure of ``template``; returns (params, config)."""
    from .hf_import import load_state_dict
    flat = load_state_dict(save_dir)
    cfg = None
    cfg_path = os.path.join(save_dir, CONFIG_NAME)
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    return _unflatten(flat, template), cfg
