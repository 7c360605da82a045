"""State checkpoint / resume (.npz) and trajectory export.

The reference has no persistence at all (SURVEY.md §5: state lives only in
RAM/VRAM); this is the cheap superset needed anyway for golden-trajectory
parity tests.
"""

from __future__ import annotations

import numpy as np

from ..types import Particles, make_particles


def save_particles(path: str, particles: Particles, **extra) -> None:
    """Save particle state (+ optional metadata scalars) to an .npz file."""
    np.savez_compressed(
        path,
        pos=np.asarray(particles.pos),
        vel=np.asarray(particles.vel),
        acc=np.asarray(particles.acc),
        mass=np.asarray(particles.mass),
        radius=np.asarray(particles.radius),
        **extra,
    )


def load_particles(path: str) -> tuple[Particles, dict]:
    """Load particle state; returns (particles, extra_metadata)."""
    with np.load(path) as data:
        p = make_particles(
            data["pos"], vel=data["vel"], acc=data["acc"],
            mass=data["mass"], radius=data["radius"],
        )
        extra = {k: data[k] for k in data.files
                 if k not in ("pos", "vel", "acc", "mass", "radius")}
    return p, extra


def save_world(path: str, world, step: int = 0) -> None:
    """Checkpoint a World (single-chip or sharded): unpadded state + counters."""
    save_particles(path, world.particles, step=np.int64(step),
                   mass_len=np.int64(world.mass_len))


def load_world(path: str, world_cls=None, **world_kwargs):
    """Resume a World from a checkpoint. Returns (world, step)."""
    if world_cls is None:
        from ..world import World as world_cls  # noqa: N813
    p, extra = load_particles(path)
    return world_cls(p, **world_kwargs), int(extra.get("step", 0))
