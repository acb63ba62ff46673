"""Device mesh construction.

Axes: 'data' (batch / FSDP) x 'model' (tensor parallel). On a v5e-8
slice the default for Vicuna-13B inference is (1, 8) — all chips in
tensor parallel over ICI; training uses (data>1, model) grids.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. model=None uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
