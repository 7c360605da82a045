"""NaN/divergence guard tests (validation-layer analogue, SURVEY.md §5)."""

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
    # radius 0 + coincident massive particles -> 0/0 -> NaN (the documented
    # corner the reference also dies on, SURVEY §5 quirk #4)
    p = make_particles(
        np.zeros((2, 2), np.float32),
        mass=np.array([10.0, 10.0], np.float32),
        radius=np.array([0.0, 0.0], np.float32),
    )
    cw = CheckedWorld(create_world(p, config=TINY))
    with pytest.raises(SimulationDiverged):
        cw.update(0.01, 1, backend="jnp")


def test_checked_world_passthrough():
    cw = CheckedWorld(create_world(make_galaxies(200, 1, seed=2), config=TINY))
    cw.update(0.01, 2, backend="jnp")
    assert cw.total_len == 200
    assert np.isfinite(np.asarray(cw.particles.pos)).all()
