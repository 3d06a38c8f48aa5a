"""Device-mesh helpers — the TPU stand-in for MPI_COMM_WORLD.

The reference's communicator bootstrap (MPI_Comm_rank/size,
edm_bias.cpp:63-66) maps to a 1-D ``jax.sharding.Mesh`` over the data
axis; collectives ride ICI via psum/all_gather inside shard_map.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "dp"
BRICK_X_AXIS = "bx"
BRICK_Y_AXIS = "by"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_brick_mesh(
    px: int, py: int, axes: tuple = (BRICK_X_AXIS, BRICK_Y_AXIS)
) -> Mesh:
    """(px, py) 2-D device grid for brick decomposition — on real hardware
    lay px x py onto the physical ICI torus (v5e/v6 slices are 2-D tori,
    so a matching logical grid keeps halo/psum traffic on nearest-neighbor
    links)."""
    devs = jax.devices()
    if len(devs) < px * py:
        raise ValueError(f"need {px * py} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[: px * py]).reshape(px, py), tuple(axes))
