"""Plummer-disk scene family: profile invariants + all-massive simulation."""

import jax
import numpy as np

from nbody_tpu import create_world
from nbody_tpu.models.plummer import make_plummer_disk
from helpers import TINY


def test_profile_and_shapes():
    p = make_plummer_disk(jax.random.key(0), 2000, scale=400.0)
    assert p.n == 2000
    r = np.hypot(*np.asarray(p.pos).T)
    # half-mass radius of the sampled profile is the scale radius a
    # (u=0.5 -> r = a), up to truncation + sampling noise
    np.testing.assert_allclose(np.median(r), 400.0, rtol=0.1)
    assert (np.asarray(p.mass) > 0).all()  # all-massive family


def test_velocities_tangential_and_bound():
    p = make_plummer_disk(jax.random.key(1), 1000)
    pos = np.asarray(p.pos, np.float64)
    vel = np.asarray(p.vel, np.float64)
    r = np.hypot(pos[:, 0], pos[:, 1])
    v = np.hypot(vel[:, 0], vel[:, 1])
    # mostly tangential: |v.r| / (|v||r|) small on average (5% jitter)
    cosang = np.abs(np.sum(vel * pos, axis=1)) / np.maximum(v * r, 1e-9)
    assert np.mean(cosang) < 0.1


def test_all_massive_simulation_stable():
    p = make_plummer_disk(jax.random.key(2), 300)
    w = create_world(p, config=TINY)
    assert w.mass_len == 300  # mass_len == N stress case
    r0 = np.median(np.hypot(*np.asarray(w.particles.pos).T))
    w.update(0.005, 200, backend="jnp")
    host = w.particles
    assert np.isfinite(np.asarray(host.pos)).all()
    # disk doesn't explode or collapse catastrophically within the window
    r1 = np.median(np.hypot(*np.asarray(host.pos).T))
    assert 0.3 * r0 < r1 < 3.0 * r0


def test_deterministic():
    a = make_plummer_disk(jax.random.key(5), 100)
    b = make_plummer_disk(jax.random.key(5), 100)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
