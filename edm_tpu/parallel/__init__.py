from .mesh import make_brick_mesh, make_mesh
from .pair import make_sharded_pair_step, shard_pair_state
from .coord import make_sharded_coord_step, shard_coord_state
from .cells import (
    make_brick_cell_step,
    make_sharded_cell_step,
    make_slab_cell_step,
)
from .spatial import (
    gather_spatial_grid,
    init_spatial_state,
    make_spatial_coord_step,
    rebin_spatial_atoms,
    spatial_subdivide,
    stitch_spatial_grid,
)

__all__ = [
    "make_mesh",
    "make_brick_mesh",
    "make_sharded_pair_step",
    "shard_pair_state",
    "make_sharded_coord_step",
    "shard_coord_state",
    "make_sharded_cell_step",
    "make_slab_cell_step",
    "make_brick_cell_step",
    "spatial_subdivide",
    "init_spatial_state",
    "make_spatial_coord_step",
    "rebin_spatial_atoms",
    "gather_spatial_grid",
    "stitch_spatial_grid",
]
