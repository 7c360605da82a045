import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import G, Particles, make_particles, zeros_particles, concat_particles
from nbody_tpu.types import GalaxyConfig, round_up


def test_constants():
    # NB_G = 10.0 (nbody.h:8)
    assert G == 10.0


def test_make_particles_defaults():
    p = make_particles(np.zeros((5, 2)))
    assert p.n == 5
    assert p.pos.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(p.vel), 0)
    np.testing.assert_array_equal(np.asarray(p.mass), 0)
    np.testing.assert_array_equal(np.asarray(p.radius), 1.0)


def test_make_particles_shape_errors():
    with pytest.raises(ValueError):
        make_particles(np.zeros((5, 3)))
    with pytest.raises(ValueError):
        make_particles(np.zeros((5, 2)), mass=np.zeros(4))


def test_particles_is_pytree():
    p = zeros_particles(4)
    doubled = jax.tree.map(lambda x: x * 2, p)
    assert isinstance(doubled, Particles)
    # jit-compatible
    f = jax.jit(lambda q: q.pos.sum())
    assert f(p) == 0.0


def test_concat_and_slice():
    a = zeros_particles(3)
    b = zeros_particles(2)
    c = concat_particles(a, b)
    assert c.n == 5
    assert c.slice_to(3).n == 3


def test_mass_from_radius():
    # m = (4*pi*rho/3) r^3 (galaxy.h:21-24)
    cfg = GalaxyConfig()
    r = 2.0
    expected = 4.0 * cfg.pi * cfg.np_density / 3.0 * 8.0
    assert np.isclose(cfg.r_to_m(r, cfg.np_density), expected)
    assert cfg.min_gc_mass == pytest.approx(4.0 * cfg.pi * cfg.gc_density / 3.0 * 200.0**3)


def test_round_up():
    assert round_up(0, 8) == 0
    assert round_up(1, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(129, 128) == 256


def test_sim_config_validation():
    # integrator names outside {euler, leapfrog} must fail loudly, not fall
    # through to the Euler branch (ADVICE r1)
    from nbody_tpu.types import SimConfig

    SimConfig(integrator="euler")
    SimConfig(integrator="leapfrog")
    with pytest.raises(ValueError, match="integrator"):
        SimConfig(integrator="verlet")
    with pytest.raises(ValueError, match="integrator"):
        SimConfig(integrator="Leapfrog")
    with pytest.raises(ValueError, match="tile"):
        SimConfig(tile_targets=7)
    with pytest.raises(ValueError, match="tile"):
        SimConfig(tile_sources=100)
    # 0 satisfies the % alignment checks but would break the kernels
    with pytest.raises(ValueError, match="tile"):
        SimConfig(tile_sources=0)
    with pytest.raises(ValueError, match="tile"):
        SimConfig(tile_targets=0)
    with pytest.raises(ValueError, match="tile"):
        SimConfig(kernel_tile_targets=0)
