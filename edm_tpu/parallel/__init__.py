from .mesh import make_mesh
from .pair import make_sharded_pair_step, shard_pair_state
from .coord import make_sharded_coord_step, shard_coord_state
from .cells import make_sharded_cell_step

__all__ = [
    "make_mesh",
    "make_sharded_pair_step",
    "shard_pair_state",
    "make_sharded_coord_step",
    "shard_coord_state",
    "make_sharded_cell_step",
]
