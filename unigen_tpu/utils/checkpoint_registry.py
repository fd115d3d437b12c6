"""Checkpoint alias registry (reference: utils/checkpoint_registry.py:12-54).

Maps short model aliases to checkpoint paths; ``real_checkpoint`` resolves an
alias (or passthrough path) under a local checkpoint root.
"""
from __future__ import annotations

import os
from typing import Dict

CHECKPOINT_REGISTRY: Dict[str, str] = {
    "magvitv2": "showlab/magvitv2",
    "siglip": "google/siglip-so400m-patch14-384",
    "siglip2": "google/siglip2-so400m-patch16-naflex",
    "qwen2.5-1_5b": "Qwen/Qwen2.5-1.5B-Instruct",
    "qwen2.5-1.5b": "Qwen/Qwen2.5-1.5B-Instruct",
    "vq_16": "showlab/magvitv2",
}


def register_checkpoint(alias: str, path: str) -> None:
    CHECKPOINT_REGISTRY[alias.lower()] = path


def real_checkpoint(name: str, base_path: str = "") -> str:
    """Alias -> concrete path, rooted under base_path when given
    (reference: checkpoint_registry.py:40-54)."""
    resolved = CHECKPOINT_REGISTRY.get(name.lower(), name)
    if base_path:
        local = os.path.join(base_path, resolved)
        if os.path.exists(local):
            return local
        local_alias = os.path.join(base_path, name)
        if os.path.exists(local_alias):
            return local_alias
    return resolved
