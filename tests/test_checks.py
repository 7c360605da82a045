"""NaN/divergence guard tests (validation-layer analogue, SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np
from helpers import TINY
import pytest

from nbody_tpu import create_world, make_galaxies, make_particles
from nbody_tpu.types import SimConfig
from nbody_tpu.utils.checks import (
    CheckedWorld,
    SimulationDiverged,
    check_state,
    validate_world_invariants,
)


def test_healthy_state_passes():
    w = create_world(make_galaxies(200, 1, seed=1), config=TINY)
    w.update(0.01, 3, backend="jnp")
    check_state(w.state)
    validate_world_invariants(w)


def test_nan_detected():
    p = make_particles(np.array([[np.nan, 0.0]], np.float32))
    w = create_world(p, config=TINY)
    with pytest.raises(SimulationDiverged, match="pos"):
        check_state(w.state)


def test_checked_world_catches_divergence():
    # a NaN entering the state through the real update path must trip the
    # post-update validator (the coincident radius-0 corner that used to be
    # the NaN source is now guarded by types.SOFTENING_FLOOR, so inject one
    # via the user force hook instead)
    p = make_particles(
        np.zeros((2, 2), np.float32),
        mass=np.array([10.0, 10.0], np.float32),
        radius=np.array([1.0, 1.0], np.float32),
    )
    cw = CheckedWorld(create_world(p, config=TINY))
    with pytest.raises(SimulationDiverged):
        cw.update(0.01, 1, backend="jnp",
                  extra_force=lambda pos, vel: jnp.full_like(pos, jnp.nan))


def test_checked_world_passthrough():
    cw = CheckedWorld(create_world(make_galaxies(200, 1, seed=2), config=TINY))
    cw.update(0.01, 2, backend="jnp")
    assert cw.total_len == 200
    assert np.isfinite(np.asarray(cw.particles.pos)).all()


def test_checked_world_adaptive_is_validated():
    # update_adaptive runs under the same post-step validation as update
    cw = CheckedWorld(create_world(make_galaxies(200, 1, seed=2), config=TINY))
    n = cw.update_adaptive(0.05, dt_max=0.01)
    assert n >= 5
    assert np.isfinite(np.asarray(cw.particles.pos)).all()
    with pytest.raises(SimulationDiverged):
        cw.update_adaptive(
            0.02, dt_max=0.01,
            extra_force=lambda pos, vel: jnp.full_like(pos, jnp.nan))


def test_validator_accepts_sharded_worlds():
    # validate_world_invariants reads .gm on World and .gm_src on
    # ShardedWorld; both layouts share the prefix invariants
    import dataclasses

    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = make_galaxies(300, 1, seed=8)
    sw = ShardedWorld(scene, make_mesh(4), config=TINY)
    sw.update(0.01, 4)
    validate_world_invariants(sw)
    merged = ShardedWorld(
        scene, make_mesh(4),
        config=dataclasses.replace(TINY, merge_collisions=True))
    merged.update(0.01, 8)
    validate_world_invariants(merged)
