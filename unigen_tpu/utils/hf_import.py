"""Checkpoint interop: import reference/HF torch weights into our pytrees.

Covers the reference's persistence formats (reference: models/modeling_utils.py
:257-401 save / :403-855 load): single or sharded ``*.safetensors`` with a
``*.index.json``, or ``pytorch_model*.bin``. Importers exist for every model:
Qwen2 backbone, full UniGen (incl. projectors/heads), MAGViTv2, SigLIP(2) towers —
including the vocab-resize fixup applied on load (reference train.py:247-255).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

PyTree = Any


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Directory (or file) -> {name: np.ndarray}, resolving sharded safetensors
    (reference shard resolution, modeling_utils.py:520-620)."""
    if os.path.isfile(path):
        files = [path]
    else:
        index = glob.glob(os.path.join(path, "*.index.json"))
        if index:
            with open(index[0]) as f:
                weight_map = json.load(f)["weight_map"]
            files = sorted({os.path.join(path, fn) for fn in weight_map.values()})
        else:
            files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
            if not files:
                files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
        if not files:
            raise FileNotFoundError(f"no weight files under {path}")

    sd: Dict[str, np.ndarray] = {}
    for fn in files:
        if fn.endswith(".safetensors"):
            from safetensors.numpy import load_file
            sd.update(load_file(fn))
        else:
            import torch
            chunk = torch.load(fn, map_location="cpu", weights_only=True)
            sd.update({k: v.numpy() for k, v in chunk.items()})
    return sd


def resize_embedding(weight: np.ndarray, new_vocab: int) -> np.ndarray:
    """Grow/shrink a [V, D] table; new rows init from the mean embedding
    (the on-load vocab fixup, reference train.py:247-255)."""
    v, d = weight.shape
    if new_vocab == v:
        return weight
    if new_vocab < v:
        return weight[:new_vocab]
    mean = weight.mean(axis=0, keepdims=True)
    extra = np.broadcast_to(mean, (new_vocab - v, d)).copy()
    return np.concatenate([weight, extra], axis=0)


def import_qwen2(path_or_sd, cfg, prefix: str = "model.") -> PyTree:
    from ..models import qwen2
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_state_dict(path_or_sd)
    embed_key = prefix + "embed_tokens.weight"
    if sd[embed_key].shape[0] != cfg.vocab_size:
        sd = dict(sd)
        sd[embed_key] = resize_embedding(np.asarray(sd[embed_key]), cfg.vocab_size)
        if "lm_head.weight" in sd:
            sd["lm_head.weight"] = resize_embedding(np.asarray(sd["lm_head.weight"]),
                                                    cfg.vocab_size)
    return qwen2.convert_hf_state_dict(sd, cfg, prefix=prefix)


def _mlp_from_sd(sd: Dict[str, np.ndarray], prefix: str, dtype) -> list:
    """torch nn.Sequential([Linear, GELU, Linear, ...]) -> our layer list.
    Sequential indices skip the activations (0, 2, 4, ...)."""
    layers = []
    idx = 0
    while f"{prefix}.{idx}.weight" in sd:
        layers.append({"kernel": jnp.asarray(np.asarray(sd[f"{prefix}.{idx}.weight"]).T,
                                             dtype),
                       "bias": jnp.asarray(np.asarray(sd[f"{prefix}.{idx}.bias"]), dtype)})
        idx += 2
    return layers


def import_unigen(path_or_sd, cfg) -> PyTree:
    """Full UniGen 'unwrapped_model' checkpoint -> our params pytree.

    Reference layout: llm.model.* / llm.lm_head.* plus gen_embed, gen_projector,
    img_head, mm_projector, vision_tower.* (reference: models/unigen.py:56-128).
    """
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_state_dict(path_or_sd)
    dt = cfg.llm.dtype
    params: Dict[str, Any] = {"llm": import_qwen2(sd, cfg.llm, prefix="llm.model.")}
    if "llm.lm_head.weight" in sd and not cfg.llm.tie_word_embeddings:
        params["llm"]["lm_head"] = {"kernel": jnp.asarray(
            resize_embedding(np.asarray(sd["llm.lm_head.weight"]), cfg.llm.vocab_size).T, dt)}
    if "gen_embed.weight" in sd:
        params["gen_embed"] = {"weight": jnp.asarray(sd["gen_embed.weight"], dt)}
        params["gen_projector"] = _mlp_from_sd(sd, "gen_projector", dt)
        params["img_head"] = {"kernel": jnp.asarray(np.asarray(sd["img_head.weight"]).T, dt)}
    if any(k.startswith("mm_projector.") for k in sd):
        params["mm_projector"] = _mlp_from_sd(sd, "mm_projector", dt)
    return params


def import_magvit(path_or_sd, cfg) -> PyTree:
    from ..models import magvit
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_state_dict(path_or_sd)
    return magvit.convert_torch_state_dict(sd, cfg)


def import_siglip(path_or_sd, cfg, prefix: str = "vision_model.") -> PyTree:
    from ..models import siglip
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_state_dict(path_or_sd)
    # tower checkpoints may nest under vision_tower.vision_model.*
    if not any(k.startswith(prefix) for k in sd):
        for cand in ("vision_tower.vision_model.", "vision_model.", ""):
            if any(k.startswith(cand + "encoder.layers.0.") for k in sd):
                prefix = cand
                break
    return siglip.convert_hf_state_dict(sd, cfg, prefix=prefix)
