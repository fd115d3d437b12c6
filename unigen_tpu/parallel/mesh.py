"""Device-mesh construction over ICI/DCN.

The TPU-native replacement for the reference's Accelerate/DeepSpeed/NCCL stack
(reference: configs/accelerate_configs/*, SURVEY.md §2.7). One logical mesh with
axes (data, fsdp, model):

* ``data``  — batch sharding: plain data parallelism (= the reference's DDP).
* ``fsdp``  — parameter/optimizer-state sharding along the batch-replica group
              (= DeepSpeed ZeRO-2/3 / torch FSDP, reference 8_gpus_deepspeed_zero2.yaml).
* ``model`` — tensor parallelism (absent in the reference; exposed here so DP
              today becomes DP×TP without API change, SURVEY.md §2.7).

XLA inserts all collectives (psum/all-gather/reduce-scatter) from shardings; no
explicit NCCL-style calls anywhere.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    fsdp: str = "fsdp"
    model: str = "model"


AXES = MeshAxes()


def make_mesh(data: int = -1, fsdp: int = 1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, fsdp, model) mesh. ``data=-1`` absorbs remaining devices.

    On multi-host slices, call jax.distributed.initialize() first; jax.devices()
    then spans the full slice and the mesh rides ICI within hosts / DCN across.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        denom = fsdp * model
        if n % denom:
            raise ValueError(f"{n} devices not divisible by fsdp*model={denom}")
        data = n // denom
    if data * fsdp * model != n:
        raise ValueError(f"mesh {data}x{fsdp}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(dev_array, (AXES.data, AXES.fsdp, AXES.model))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (the reference's torch.distributed/Accelerate init,
    train.py:75-82). No-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)
