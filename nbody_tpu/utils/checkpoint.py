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


# --- Orbax-backed checkpointing (sharded-array native, async-capable) -----
#
# The .npz path above gathers state to the host, which is fine up to a few
# million particles. For pod-scale sharded worlds, Orbax writes each shard
# from its own device without a global gather.

def save_world_orbax(path: str, world, step: int = 0) -> None:
    """Checkpoint a World/ShardedWorld with Orbax (per-shard writes)."""
    import orbax.checkpoint as ocp

    state = world.state
    tree = {
        "pos": state.pos, "vel": state.vel, "acc": state.acc,
        "mass": state.mass, "radius": state.radius,
        "step": np.int64(step), "total_len": np.int64(world.total_len),
        "mass_len": np.int64(world.mass_len),
    }
    import os

    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(os.path.abspath(path), tree, force=True)


def load_world_orbax(path: str, world_cls=None, **world_kwargs):
    """Resume from an Orbax checkpoint. Returns (world, step).

    Note: restores to host arrays before rebuilding the world (adequate for
    single-host scales; a pod-scale restore should pass a sharded abstract
    target to ckpt.restore so each device reads only its shard)."""
    import os

    import orbax.checkpoint as ocp

    if world_cls is None:
        from ..world import World as world_cls  # noqa: N813
    with ocp.StandardCheckpointer() as ckpt:
        tree = ckpt.restore(os.path.abspath(path))
    n = int(tree["total_len"])
    p = make_particles(
        tree["pos"][:n], vel=tree["vel"][:n], acc=tree["acc"][:n],
        mass=tree["mass"][:n], radius=tree["radius"][:n],
    )
    return world_cls(p, **world_kwargs), int(tree["step"])
