"""Native C++ scene generator: structural invariants must match the Python
generators' (same algorithm, independent implementation + RNG)."""

import numpy as np
import pytest

from nbody_tpu import G, create_world
from nbody_tpu.types import GalaxyConfig
from nbody_tpu.utils import cpp_galaxy
from helpers import TINY

pytestmark = pytest.mark.skipif(
    not cpp_galaxy.available(), reason="cpp generator not buildable"
)

CFG = GalaxyConfig()


@pytest.fixture(scope="module")
def scene():
    return cpp_galaxy.make_galaxies_native(800, 2, seed=11037)


def test_counts_and_finiteness(scene):
    assert scene.n == 800
    for arr in (scene.pos, scene.vel, scene.mass, scene.radius):
        assert np.isfinite(np.asarray(arr)).all()


def test_structural_invariants(scene):
    mass = np.asarray(scene.mass)
    radius = np.asarray(scene.radius)
    cores = mass >= CFG.min_gc_mass
    assert cores.sum() == 2
    np.testing.assert_allclose(
        mass[cores], CFG.r_to_m(radius[cores].astype(np.float64), CFG.gc_density),
        rtol=1e-4,
    )
    tracers = mass == 0
    assert tracers.any()
    np.testing.assert_array_equal(radius[tracers], 0.5)
    normal = (mass > 0) & ~cores
    assert ((radius[normal] >= CFG.np_min_r) & (radius[normal] <= CFG.np_max_r)).all()


def test_orbital_velocity(scene):
    pos = np.asarray(scene.pos, np.float64)
    vel = np.asarray(scene.vel, np.float64)
    mass = np.asarray(scene.mass, np.float64)
    # check particles of the first (origin) galaxy orbit its core
    ci = int(np.argmax(mass == mass[mass >= CFG.min_gc_mass][0]))
    # particles belonging to galaxy 0 are the block starting at its core
    cores = np.flatnonzero(mass >= CFG.min_gc_mass)
    end = cores[1] if len(cores) > 1 and cores[1] > cores[0] else len(mass)
    sl = slice(cores[0] + 1, end)
    rel = pos[sl] - pos[cores[0]]
    relv = vel[sl] - vel[cores[0]]
    d = np.hypot(rel[:, 0], rel[:, 1])
    speed = np.hypot(relv[:, 0], relv[:, 1])
    np.testing.assert_allclose(speed, np.sqrt(G * mass[cores[0]] / d), rtol=1e-3)


def test_deterministic_and_seed_sensitive():
    a = cpp_galaxy.make_galaxies_native(300, 1, seed=5)
    b = cpp_galaxy.make_galaxies_native(300, 1, seed=5)
    c = cpp_galaxy.make_galaxies_native(300, 1, seed=6)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert not np.array_equal(np.asarray(a.pos), np.asarray(c.pos))


def test_validation():
    with pytest.raises(ValueError):
        cpp_galaxy.make_galaxies_native(150, 2)


def test_feeds_simulation(scene):
    w = create_world(scene, config=TINY)
    w.update(0.01, 3, backend="jnp")
    assert np.isfinite(np.asarray(w.particles.pos)).all()
