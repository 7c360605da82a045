"""Shared test fixtures: tile configs sized for fast CPU/interpret runs and
the canonical random-particle generator used across suites."""

import numpy as np

from nbody_tpu import make_particles
from nbody_tpu.types import SimConfig

# Small tiles keep interpret-mode Pallas and the CPU mesh fast.
TINY = SimConfig(tile_targets=8, tile_sources=128)
# Same tiles, exact sqrt+divide force math (the reference shader semantics).
PRECISE = SimConfig(tile_targets=8, tile_sources=128, precise=True)

# Grid-backend golden configs, shared with scripts/make_golden_grid.py so
# the committed pm/p3m golden trajectories and the tests that check them
# can never drift apart. A silent numerical shift inside the CIC/FFT/PP
# pipelines across jax versions fails test_golden, even while the
# error-envelope tests (test_pm_forces/test_p3m_forces) still pass.
GOLDEN_GRID = SimConfig(pm_grid=64, pm_softening=2.0, p3m_rc_cells=4,
                        p3m_cell_capacity=96, p3m_exact_targets=64)


def load_hex_dump(path):
    """Parse a scripts/ref_scene_dump.c hex-float file (one particle per
    line: ``pos.x pos.y vel.x vel.y mass radius`` as C ``%a`` floats, in
    generation order) into an (N, 6) float32 array."""
    with open(path) as f:
        rows = [[np.float32(float.fromhex(tok)) for tok in line.split()]
                for line in f]
    return np.array(rows, np.float32)


def particles_as_rows(p):
    """Particles pytree -> (N, 6) float32 in ref_scene_dump column order."""
    return np.concatenate(
        [np.asarray(p.pos), np.asarray(p.vel),
         np.asarray(p.mass)[:, None], np.asarray(p.radius)[:, None]], axis=1)


def random_particles(n, seed=0, massless_frac=0.3):
    rng = np.random.default_rng(seed)
    pos = (100 * rng.normal(size=(n, 2))).astype(np.float32)
    vel = rng.normal(size=(n, 2)).astype(np.float32)
    massless = rng.uniform(size=n) < massless_frac
    radius = np.where(massless, 0.5, rng.uniform(1.5, 9.5, n)).astype(np.float32)
    mass = np.where(massless, 0.0, rng.uniform(10, 1e4, n)).astype(np.float32)
    return make_particles(pos, vel=vel, mass=mass, radius=radius)
