"""Multi-host collectives for host-side objects.

TPU-native replacement for the reference's raw torch.distributed calls:
``dist.all_gather_object`` merging CoT-V rating tables across ranks
(reference: evaluation/inference_unigen_cot.py:417-427) and the broadcast helper
(models/misc.py:25-28). Single-host runs degrade to identity.
"""
from __future__ import annotations

import json
from typing import Any, List

import jax
import numpy as np


def gather_objects(obj: Any) -> List[Any]:
    """All-gather a picklable (JSON-serializable) object across hosts; returns the
    list ordered by process index. Identity wrapper on a single host."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = json.dumps(obj).encode("utf-8")
    n = np.zeros((jax.process_count(),), np.int32)
    n[jax.process_index()] = len(payload)
    sizes = np.asarray(multihost_utils.process_allgather(
        jax.numpy.asarray(n))).sum(axis=0)
    maxlen = int(sizes.max())
    buf = np.zeros((jax.process_count(), maxlen), np.uint8)
    buf[jax.process_index(), :len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(
        jax.numpy.asarray(buf))).sum(axis=0)  # one-hot rows: sum merges
    gathered = gathered.astype(np.uint8)      # sum promotes to int64; re-narrow
    out = []
    for i in range(jax.process_count()):
        raw = bytes(gathered[i, : int(sizes[i])])
        out.append(json.loads(raw.decode("utf-8")))
    return out


def broadcast_object(obj: Any, source: int = 0) -> Any:
    """Broadcast a JSON-serializable object from ``source`` to all hosts
    (reference misc.py:25-28)."""
    gathered = gather_objects(obj if jax.process_index() == source else None)
    return gathered[source]


def sync_hosts() -> None:
    """Barrier across hosts (the reference's accelerator.wait_for_everyone)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("unigen_tpu_barrier")
