from .checkpoint import (
    load_particles,
    load_world,
    save_particles,
    save_world,
    save_world_atomic,
)

__all__ = ["load_particles", "load_world", "save_particles", "save_world",
           "save_world_atomic"]
