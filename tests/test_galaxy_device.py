"""Device-side galaxy generator: same structural invariants as the host one,
plus jit/determinism properties."""

import jax
from helpers import TINY
import numpy as np
import pytest

from nbody_tpu import G, create_world
from nbody_tpu.models import make_galaxies_device
from nbody_tpu.types import GalaxyConfig, SimConfig

CFG = GalaxyConfig()


@pytest.fixture(scope="module")
def scene():
    return make_galaxies_device(jax.random.key(11037), 1000, 3)


def test_counts_and_finiteness(scene):
    assert scene.n == 1000
    for arr in (scene.pos, scene.vel, scene.mass, scene.radius):
        assert np.all(np.isfinite(np.asarray(arr)))


def test_cores(scene):
    mass = np.asarray(scene.mass)
    radius = np.asarray(scene.radius)
    cores = mass >= CFG.min_gc_mass
    assert cores.sum() == 3
    np.testing.assert_allclose(
        mass[cores], CFG.r_to_m(radius[cores].astype(np.float64), CFG.gc_density),
        rtol=1e-4,
    )


def test_tracers_and_bodies(scene):
    mass = np.asarray(scene.mass)
    radius = np.asarray(scene.radius)
    tracers = mass == 0
    assert tracers.any()
    np.testing.assert_array_equal(radius[tracers], 0.5)
    normal = (mass > 0) & (mass < CFG.min_gc_mass)
    assert np.all((radius[normal] >= CFG.np_min_r) & (radius[normal] <= CFG.np_max_r))


def test_orbital_velocity_single_galaxy():
    scene = make_galaxies_device(jax.random.key(3), 500, 1)
    pos = np.asarray(scene.pos, np.float64)
    vel = np.asarray(scene.vel, np.float64)
    mass = np.asarray(scene.mass, np.float64)
    ci = int(np.argmax(mass))
    rel = np.delete(pos, ci, axis=0) - pos[ci]
    relv = np.delete(vel, ci, axis=0) - vel[ci]
    d = np.hypot(rel[:, 0], rel[:, 1])
    speed = np.hypot(relv[:, 0], relv[:, 1])
    np.testing.assert_allclose(speed, np.sqrt(G * mass[ci] / d), rtol=1e-3)
    dots = np.abs(np.sum(relv * rel, axis=1)) / (speed * d)
    np.testing.assert_allclose(dots, 0.0, atol=1e-3)


def test_deterministic_per_key():
    a = make_galaxies_device(jax.random.key(5), 400, 2)
    b = make_galaxies_device(jax.random.key(5), 400, 2)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    c = make_galaxies_device(jax.random.key(6), 400, 2)
    assert not np.array_equal(np.asarray(a.pos), np.asarray(c.pos))


def test_feeds_world(scene):
    w = create_world(scene, config=TINY)
    w.update(0.01, 3, backend="jnp")
    assert np.all(np.isfinite(np.asarray(w.particles.pos)))


def test_validates_minimum():
    with pytest.raises(ValueError):
        make_galaxies_device(jax.random.key(0), 150, 2)
