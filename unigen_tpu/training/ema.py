"""Exponential moving average of parameters.

Reference: models/training_utils.py:59-295 (EMA with warmup-ramped decay:
decay_t = min(max_decay, (1+t)/(10+t)) by default; the reference imports it
nowhere — it ships as available infrastructure, reproduced here functionally).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

PyTree = Any


class EMAState(NamedTuple):
    params: PyTree
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    decay: float = 0.9999
    min_decay: float = 0.0
    update_after_step: int = 0
    use_ema_warmup: bool = True
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def ema_init(params: PyTree) -> EMAState:
    # real copies, not aliases: the EMA tree lives in a donated TrainState next
    # to the params tree, and donation rejects the same buffer appearing twice
    return EMAState(jax.tree_util.tree_map(lambda p: jnp.asarray(p).copy(), params),
                    jnp.zeros((), jnp.int32))


def ema_decay_at(cfg: EMAConfig, step) -> jnp.ndarray:
    """Warmup-ramped decay schedule (reference: training_utils.py:150-170)."""
    s = jnp.maximum(step - cfg.update_after_step - 1, 0).astype(jnp.float32)
    if cfg.use_ema_warmup:
        decay = 1.0 - (1.0 + s / cfg.inv_gamma) ** -cfg.power
    else:
        decay = (1.0 + s) / (10.0 + s)
    decay = jnp.where(s <= 0, 0.0, decay)
    return jnp.clip(decay, cfg.min_decay, cfg.decay)


def ema_update(cfg: EMAConfig, state: EMAState, params: PyTree) -> EMAState:
    decay = ema_decay_at(cfg, state.step + 1)
    new = jax.tree_util.tree_map(
        lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype), state.params, params)
    return EMAState(new, state.step + 1)
