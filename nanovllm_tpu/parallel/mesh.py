"""Device mesh construction.

Axes:
  data  — replica axis (data parallelism / batch sharding)
  model — tensor-parallel axis (heads / ffn / vocab sharding over ICI)

The reference caps tensor_parallel_size at 8 and never spawns processes
(SURVEY §2.12); here the mesh scales to whatever `jax.devices()` offers,
including multi-host when `jax.distributed` is initialized.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_MODEL = "model"


def build_mesh(
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = tensor_parallel_size * data_parallel_size
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices (tp={tensor_parallel_size} x "
            f"dp={data_parallel_size}), only {len(devices)} available"
        )
    grid = np.array(devices[:need]).reshape(data_parallel_size, tensor_parallel_size)
    return Mesh(grid, (AXIS_DATA, AXIS_MODEL))
