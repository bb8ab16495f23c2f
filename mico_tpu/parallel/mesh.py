"""Device mesh construction.

The TPU-native replacement for the reference's torchrun/NCCL process layout
(data/utils/initialize.py:8-36, data/utils/distributed.py): one process, one
`jax.sharding.Mesh`, pjit programs with sharding annotations, XLA inserts the
ICI/DCN collectives.

Axes:
  data  — data parallel (the reference's only strategy; DDP equivalent)
  model — tensor parallel (no reference equivalent; TPU headroom)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_parallel_mesh(devices: Optional[Sequence] = None) -> Mesh:
    return create_mesh(data=-1, model=1, devices=devices)
