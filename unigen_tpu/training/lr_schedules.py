"""Learning-rate schedules, numerically identical to the reference's HF-style set
(reference: models/lr_schedulers.py:24-285) but as pure step->scale functions usable
with optax (scale, not absolute lr — multiply by the base learning rate).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable


def constant_schedule(**_):
    return lambda step: jnp.ones_like(jnp.asarray(step, jnp.float32))


def constant_with_warmup(num_warmup_steps: int, **_):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < num_warmup_steps, step / max(1.0, num_warmup_steps), 1.0)
    return fn


def linear_with_warmup(num_warmup_steps: int, num_training_steps: int, **_):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        decay = jnp.maximum(0.0, (num_training_steps - step)
                            / max(1, num_training_steps - num_warmup_steps))
        return jnp.where(step < num_warmup_steps, warm, decay)
    return fn


def cosine_with_warmup(num_warmup_steps: int, num_training_steps: int,
                       num_cycles: float = 0.5, min_scale: float = 0.0, **_):
    """Half-cosine decay with a min_scale floor (reference :105-135)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cos = min_scale + 0.5 * (1.0 - min_scale) * (
            1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        return jnp.where(step < num_warmup_steps, warm, jnp.maximum(min_scale, cos))
    return fn


def cosine_with_hard_restarts(num_warmup_steps: int, num_training_steps: int,
                              num_cycles: int = 1, **_):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cyc = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * ((num_cycles * progress) % 1.0))))
        decay = jnp.where(progress >= 1.0, 0.0, cyc)
        return jnp.where(step < num_warmup_steps, warm, decay)
    return fn


def polynomial_with_warmup(num_warmup_steps: int, num_training_steps: int,
                           lr_init: float, lr_end: float = 1e-7, power: float = 1.0, **_):
    if not lr_init > lr_end:
        raise ValueError(f"lr_end ({lr_end}) must be smaller than initial lr ({lr_init})")

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        lr_range = lr_init - lr_end
        decay_steps = num_training_steps - num_warmup_steps
        pct_remaining = 1 - (step - num_warmup_steps) / decay_steps
        decay = (lr_range * pct_remaining ** power + lr_end) / lr_init
        out = jnp.where(step > num_training_steps, lr_end / lr_init, decay)
        return jnp.where(step < num_warmup_steps, warm, out)
    return fn


_SCHEDULES = {
    "constant": constant_schedule,
    "constant_with_warmup": constant_with_warmup,
    "linear": linear_with_warmup,
    "cosine": cosine_with_warmup,
    "cosine_with_restarts": cosine_with_hard_restarts,
    "polynomial": polynomial_with_warmup,
}


def get_scheduler(name: str, num_warmup_steps: Optional[int] = None,
                  num_training_steps: Optional[int] = None, **kwargs) -> Schedule:
    """Unified dispatch (reference: models/lr_schedulers.py:231-285)."""
    if name not in _SCHEDULES:
        raise ValueError(f"Unknown scheduler {name}")
    if name == "constant":
        return constant_schedule()
    if num_warmup_steps is None:
        raise ValueError(f"{name} requires num_warmup_steps")
    if name == "constant_with_warmup":
        return constant_with_warmup(num_warmup_steps, **kwargs)
    if num_training_steps is None:
        raise ValueError(f"{name} requires num_training_steps")
    return _SCHEDULES[name](num_warmup_steps=num_warmup_steps,
                            num_training_steps=num_training_steps, **kwargs)
