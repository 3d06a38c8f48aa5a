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


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
