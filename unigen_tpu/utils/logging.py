"""Metrics and logging: meters, JSONL metric sink, grad-norm dumps.

Reference equivalents: utils/logger.py:6-29 (AverageMeter, log_grad_norm),
components/core.py:14-30 (stdout/stderr-split std logger), train.py:800-838
(scalar metric logging to wandb). wandb is optional here; the always-on sink is a
JSONL file any dashboard can tail.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def get_logger(name: str = "unigen_tpu") -> logging.Logger:
    """stdout for <=INFO, stderr for >=WARNING (reference: components/core.py:14-30)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    out = logging.StreamHandler(sys.stdout)
    out.setLevel(logging.INFO)
    out.addFilter(lambda r: r.levelno < logging.WARNING)
    out.setFormatter(fmt)
    err = logging.StreamHandler(sys.stderr)
    err.setLevel(logging.WARNING)
    err.setFormatter(fmt)
    logger.addHandler(out)
    logger.addHandler(err)
    logger.propagate = False
    return logger


def set_verbosity(level: int) -> None:
    """HF-style library-wide verbosity control (reference: models/logging.py:102+)."""
    get_logger().setLevel(level)


def set_verbosity_info() -> None:
    set_verbosity(logging.INFO)


def set_verbosity_warning() -> None:
    set_verbosity(logging.WARNING)


def set_verbosity_error() -> None:
    set_verbosity(logging.ERROR)


def set_verbosity_debug() -> None:
    set_verbosity(logging.DEBUG)


class AverageMeter:
    """Running value/avg/count (reference: utils/logger.py:6-21)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MetricLogger:
    """Scalar metric sink: JSONL file + optional wandb (reference wandb logging,
    train.py:135-139,820)."""

    def __init__(self, output_dir: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict] = None):
        self._file = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._file = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                get_logger().warning("wandb requested but not installed; JSONL only")

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        clean = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float))
                     else v) for k, v in metrics.items()}
        clean["step"] = step
        clean["time"] = time.time()
        if self._file:
            self._file.write(json.dumps(clean) + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(clean, step=step)

    def close(self):
        if self._file:
            self._file.close()


def grad_norms_by_param(grads) -> Dict[str, float]:
    """Per-parameter grad norms (reference: utils/logger.py:24-29)."""
    out = {}

    def path_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)

    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        out[f"grad_norm/{path_str(path)}"] = float(np.linalg.norm(np.asarray(leaf)))
    return out
