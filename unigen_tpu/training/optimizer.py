"""Optimizer construction: AdamW with no-decay parameter groups.

Matches the reference's setup (reference: training/train.py:289-332): AdamW only,
with weight decay disabled for biases, norm scales, and embeddings
(train.py:291-303's no_decay list), plus optional per-module LR multipliers
(the SFT trainer's lr_mapper, train_w_clip_vit.py:332-344) and tunable-part
freezing (train_w_clip_vit.py:296-312) — all expressed as optax transforms over
the parameter pytree instead of torch param groups.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import optax

PyTree = Any

NO_DECAY_PATTERNS = ("bias", "ln/scale", "final_ln", "embed/weight", "pos_embed",
                     # LoRA leaves never decay: decaying lora_a while its grad is
                     # zero (b=0) would silently shrink the adapter, and
                     # lora_scale is a fixed alpha/r constant, not a weight
                     "lora_")


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def decay_mask(params: PyTree) -> PyTree:
    """True where weight decay applies (reference no-decay groups, train.py:291-303)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(pat in _path_str(path) for pat in NO_DECAY_PATTERNS),
        params)


def trainable_mask(params: PyTree, tunable_parts: Optional[Sequence[str]]) -> PyTree:
    """True where gradients flow; mirrors mm_tunable_parts substring matching
    (reference: train.py:263-280)."""
    if not tunable_parts:
        return jax.tree_util.tree_map(lambda _: True, params)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(tp in _path_str(path) for tp in tunable_parts), params)


def lr_multiplier_mask(params: PyTree, lr_mapper: Dict[str, float]) -> PyTree:
    """Per-module LR multipliers by path substring (reference lr_mapper,
    train_w_clip_vit.py:332-344). Unmatched params get multiplier 1.0."""
    def mult(path, _):
        s = _path_str(path)
        for key, m in lr_mapper.items():
            if key in s:
                return m
        return 1.0
    return jax.tree_util.tree_map_with_path(mult, params)


def make_optimizer(
    params: PyTree,
    learning_rate: float,
    lr_schedule: Callable,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    weight_decay: float = 0.01,
    max_grad_norm: Optional[float] = None,
    tunable_parts: Optional[Sequence[str]] = None,
    lr_mapper: Optional[Dict[str, float]] = None,
) -> optax.GradientTransformation:
    """AdamW + schedule + clipping + freezing, one optax chain."""
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=epsilon))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, mask=decay_mask(params)))
    if lr_mapper:
        def _scale_init(_):
            return optax.EmptyState()

        def _scale_update(updates, state, params=None):
            # multipliers resolved from the update tree's own paths (not a
            # captured full-params tree) so the transform also works inside
            # multi_transform's masked subtrees, where frozen leaves become
            # childless MaskedNode placeholders (LoRA + lr_mapper together)
            del params

            def mult(path, u):
                s = _path_str(path)
                for key, m in lr_mapper.items():
                    if key in s:
                        return u * m
                return u
            return jax.tree_util.tree_map_with_path(mult, updates), state

        chain.append(optax.GradientTransformation(_scale_init, _scale_update))
    chain.append(optax.scale_by_schedule(lambda step: -learning_rate * lr_schedule(step)))
    tx = optax.chain(*chain)
    if tunable_parts:
        mask = trainable_mask(params, tunable_parts)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask))
    return tx
