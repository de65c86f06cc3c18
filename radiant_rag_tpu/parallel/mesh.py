"""Device mesh construction.

Axes:
  data   - shards the corpus row dimension (retrieval) and the batch (train)
  model  - shards weight matrices (tensor parallelism) for models that exceed
           per-chip HBM (not needed for MiniLM-class; the axis exists so the
           design scales — SURVEY.md §2.8 TP row)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 -> all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model <= 0:
        model = 1
    if data <= 0:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def mesh_info(mesh: Mesh) -> Dict[str, int]:
    return {name: size for name, size in zip(mesh.axis_names, mesh.devices.shape)}
