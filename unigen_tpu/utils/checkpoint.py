"""Checkpoint save/restore with rotation, on Orbax.

TPU-native counterpart of the reference's two-format scheme
(reference: utils/checkpoint.py:15-69 and SURVEY.md §5):

1. *Trainer state* — full TrainState (params + optimizer state + step) saved as
   ``checkpoint-<step>/state`` every save interval, rotated by
   ``checkpoints_total_limit`` (reference :20-37), resumed from the latest
   ``checkpoint-*`` dir (reference train.py:205-226).
2. *Portable model* — params only, under ``checkpoint-<step>/unwrapped_model``
   (reference :48-59), for stage handoff (PT1→PT2→SFT→DPO→CoT-V).

Orbax writes sharded arrays natively, so multi-chip checkpoints need no
gather/unshard step (the reference stops evaluation under FSDP to avoid exactly
that problem, train.py:846).
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional

import jax
import orbax.checkpoint as ocp

PyTree = Any


def _ckpt_dirs(output_dir: str) -> List[str]:
    if not os.path.isdir(output_dir):
        return []
    dirs = [d for d in os.listdir(output_dir) if re.match(r"checkpoint-\d+$", d)]
    return sorted(dirs, key=lambda d: int(d.split("-")[1]))


def rotate_checkpoints(output_dir: str, total_limit: Optional[int]) -> None:
    """Delete oldest checkpoints beyond the limit (reference: checkpoint.py:20-37)."""
    if not total_limit:
        return
    dirs = _ckpt_dirs(output_dir)
    if len(dirs) >= total_limit:
        for d in dirs[: len(dirs) - total_limit + 1]:
            shutil.rmtree(os.path.join(output_dir, d), ignore_errors=True)


def save_checkpoint(state: PyTree, output_dir: str, step: int,
                    total_limit: Optional[int] = None,
                    unwrapped_params: Optional[PyTree] = None) -> str:
    """Save trainer state (and optionally a portable params-only copy)."""
    rotate_checkpoints(output_dir, total_limit)
    path = os.path.join(output_dir, f"checkpoint-{step}")
    if os.path.isdir(path):  # overwrite semantics (re-save at the same step)
        shutil.rmtree(path, ignore_errors=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(os.path.join(path, "state")), state)
        if unwrapped_params is not None:
            ckptr.save(os.path.abspath(os.path.join(path, "unwrapped_model")),
                       unwrapped_params)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    dirs = _ckpt_dirs(output_dir)
    return os.path.join(output_dir, dirs[-1]) if dirs else None


def restore_checkpoint(path: str, target: PyTree, kind: str = "state") -> PyTree:
    """Restore into the structure/shardings of ``target`` (abstract or concrete)."""
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(os.path.abspath(os.path.join(path, kind)), abstract)


def resume_step(path: str) -> int:
    """checkpoint-<step> -> step (reference train.py:217)."""
    return int(os.path.basename(path).split("-")[1])
