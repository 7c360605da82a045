"""Galaxy generator invariants (structure of galaxy.c:31-221 output)."""

import numpy as np
import pytest

from nbody_tpu import G, make_galaxies
from nbody_tpu.types import GalaxyConfig

CFG = GalaxyConfig()


@pytest.fixture(scope="module")
def scene():
    return make_galaxies(1000, 3, seed=11037)


def test_counts_and_finiteness(scene):
    assert scene.n == 1000
    for arr in (scene.pos, scene.vel, scene.mass, scene.radius):
        assert np.all(np.isfinite(np.asarray(arr)))


def test_min_particles_validation():
    with pytest.raises(ValueError):
        make_galaxies(150, 2)  # needs >= 200


def test_cores_count_and_mass(scene):
    mass = np.asarray(scene.mass)
    radius = np.asarray(scene.radius)
    cores = mass >= CFG.min_gc_mass
    assert cores.sum() == 3
    # core mass follows m = (4 pi rho/3) r^3 with core density
    np.testing.assert_allclose(
        mass[cores], CFG.r_to_m(radius[cores].astype(np.float64), CFG.gc_density), rtol=1e-5
    )
    assert np.all(radius[cores] >= CFG.gc_min_r) and np.all(radius[cores] <= CFG.gc_max_r)


def test_massless_tracers(scene):
    mass = np.asarray(scene.mass)
    radius = np.asarray(scene.radius)
    tracers = mass == 0
    assert tracers.any()  # distance-proportional rule produces some
    # tracer radius is exactly 0.5 (galaxy.c:205-206)
    np.testing.assert_array_equal(radius[tracers], 0.5)


def test_normal_particle_mass_and_radius(scene):
    mass = np.asarray(scene.mass)
    radius = np.asarray(scene.radius)
    normal = (mass > 0) & (mass < CFG.min_gc_mass)
    assert np.all(radius[normal] >= CFG.np_min_r) and np.all(radius[normal] <= CFG.np_max_r)
    np.testing.assert_allclose(
        mass[normal], CFG.r_to_m(radius[normal].astype(np.float64), CFG.np_density), rtol=1e-5
    )


def test_first_core_at_origin(scene):
    # galaxy 0 is stationary at (0,0) before velocity kicks (galaxy.c:82);
    # kicks move velocity, not position.
    pos = np.asarray(scene.pos)
    mass = np.asarray(scene.mass)
    core_idx = np.flatnonzero(mass >= CFG.min_gc_mass)[0]
    np.testing.assert_array_equal(pos[core_idx], [0.0, 0.0])


def test_galaxy_separation():
    scene = make_galaxies(600, 3, seed=7)
    pos = np.asarray(scene.pos, np.float64)
    mass = np.asarray(scene.mass)
    cores = np.flatnonzero(mass >= CFG.min_gc_mass)
    # cores must be pairwise farther than the *minimum possible* min_sep
    # (1.4x the sum of two smallest max_dists; we just check they're far apart)
    for i in range(len(cores)):
        for j in range(i):
            d = np.hypot(*(pos[cores[i]] - pos[cores[j]]))
            assert d > 2 * CFG.gc_min_r * CFG.min_particle_dist_cr_f


def test_particles_orbit_their_core():
    # single galaxy: all particles within [min_dist-ish, max_dist+jitter] of
    # core, with tangential speed sqrt(G M / d) relative to the core.
    scene = make_galaxies(500, 1, seed=3)
    pos = np.asarray(scene.pos, np.float64)
    vel = np.asarray(scene.vel, np.float64)
    mass = np.asarray(scene.mass, np.float64)
    radius = np.asarray(scene.radius, np.float64)
    ci = int(np.argmax(mass))
    core_r = radius[ci]
    min_dist = core_r * CFG.min_particle_dist_cr_f
    max_dist = core_r * CFG.max_particle_dist_cr_f + np.sqrt(500.0) * CFG.max_particle_dist_pc_f

    rel = np.delete(pos, ci, axis=0) - pos[ci]
    d = np.hypot(rel[:, 0], rel[:, 1])
    # r_offset^2 <= 0.36*b can push slightly below min_dist? No: dist >=
    # r - 0.36*(r - min_dist) > min_dist. Jitter above max_dist is bounded by
    # 0.36*b.
    b = max_dist / (2 * CFG.pi)
    assert np.all(d >= min_dist - 1e-3)
    assert np.all(d <= max_dist + 0.36 * b + 1e-3)

    relv = np.delete(vel, ci, axis=0) - vel[ci]
    speed = np.hypot(relv[:, 0], relv[:, 1])
    np.testing.assert_allclose(speed, np.sqrt(G * mass[ci] / d), rtol=1e-4)
    # velocity is tangential: v . r == 0
    dots = np.abs(np.sum(relv * rel, axis=1)) / (speed * d)
    np.testing.assert_allclose(dots, 0.0, atol=1e-4)


def test_seed_reproducibility():
    a = make_galaxies(400, 2, seed=123)
    b = make_galaxies(400, 2, seed=123)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
    c = make_galaxies(400, 2, seed=124)
    assert not np.array_equal(np.asarray(a.pos), np.asarray(c.pos))


def test_total_budget_distribution():
    # every galaxy gets >= MIN_PARTICLES_PER_GALAXY
    for g in (1, 2, 4):
        scene = make_galaxies(450, g, seed=9)
        mass = np.asarray(scene.mass)
        assert (mass >= CFG.min_gc_mass).sum() == g
