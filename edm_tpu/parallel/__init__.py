from .mesh import make_mesh
from .pair import make_sharded_pair_step, shard_pair_state

__all__ = ["make_mesh", "make_sharded_pair_step", "shard_pair_state"]
