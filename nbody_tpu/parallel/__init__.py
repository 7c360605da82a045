from .sharding import AXIS, ShardedWorld, make_mesh
from . import multihost

__all__ = ["AXIS", "ShardedWorld", "make_mesh", "multihost"]
