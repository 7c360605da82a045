from .sharding import AXIS, ShardedWorld, make_mesh

__all__ = ["AXIS", "ShardedWorld", "make_mesh"]
