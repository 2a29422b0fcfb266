"""Device-mesh helpers for multi-chip sharding.

The reference has no distributed story (SURVEY.md §5: single process, external
services). Scaling here is TPU-native: a ``jax.sharding.Mesh`` over the slice,
`pjit`/GSPMD for the training path and ``shard_map`` + explicit ICI
collectives for the sharded retrieval path (:mod:`ragfin_tpu.parallel.sharded`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    With no ``shape``, all devices go on the first axis (1-D corpus-sharding
    mesh). For multi-axis meshes pass an explicit shape, e.g.
    ``make_mesh(("dp", "tp"), (4, 2))``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def factor_mesh_shape(n_devices: int, n_axes: int = 2) -> tuple[int, ...]:
    """Split ``n_devices`` into a near-balanced n_axes-dim mesh shape.

    E.g. 8 → (4, 2); 4 → (2, 2); 6 → (3, 2); 1 → (1, 1). Favors putting the
    larger factor on the first (data) axis.
    """
    if n_axes == 1:
        return (n_devices,)
    best = (n_devices, 1)
    for a in range(1, int(n_devices**0.5) + 1):
        if n_devices % a == 0:
            best = (n_devices // a, a)
    return best + (1,) * (n_axes - 2)



