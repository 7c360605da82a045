"""Kepler-disk and cold-collapse scene families (models/disks.py)."""

import jax
import numpy as np
import pytest

import nbody_tpu as nb
from nbody_tpu.models import make_cold_disk, make_kepler_disk
from helpers import TINY


def test_kepler_disk_structure():
    p = make_kepler_disk(jax.random.PRNGKey(0), 256)
    mass = np.asarray(p.mass)
    assert mass[0] == pytest.approx(1e7)
    assert np.all(mass[1:] == 1.0)
    # zero net momentum by construction
    mom = (mass[:, None] * np.asarray(p.vel)).sum(0)
    assert np.abs(mom).max() < 1e-2
    # bodies inside the sampled annulus
    r = np.linalg.norm(np.asarray(p.pos)[1:], axis=1)
    assert r.min() >= 200.0 - 1e-3 and r.max() <= 1200.0 + 1e-3
    # circular speed matches the analytic rotation curve
    v = np.linalg.norm(np.asarray(p.vel)[1:], axis=1)
    np.testing.assert_allclose(v, np.sqrt(10.0 * 1e7 / r), rtol=1e-5)


def test_kepler_orbits_stay_circular():
    # a fraction of an inner orbit under the exact backend: orbital radii
    # must hold to ~1% (the analytic circular speed is the right one)
    p = make_kepler_disk(jax.random.PRNGKey(1), 128)
    r0 = np.linalg.norm(np.asarray(p.pos)[1:], axis=1)
    w = nb.create_world(p, config=TINY)
    w.update(0.001, 300, backend="jnp")
    out = w.particles
    # identify rows by mass (partition is stable: central first)
    r1 = np.linalg.norm(np.asarray(out.pos)[1:], axis=1)
    np.testing.assert_allclose(r1, r0, rtol=1e-2)


def test_cold_disk_collapses_with_zero_momentum():
    p = make_cold_disk(jax.random.PRNGKey(2), 256)
    assert np.all(np.asarray(p.vel) == 0.0)
    w = nb.create_world(p, config=TINY)
    w.update(0.01, 50, backend="jnp")
    out = w.particles
    mom = (np.asarray(out.mass)[:, None] * np.asarray(out.vel)).sum(0)
    # momentum conservation at fp32 scale, relative to the momentum content
    scale = np.abs(np.asarray(out.mass)[:, None] * np.asarray(out.vel)).sum()
    assert np.abs(mom).max() / scale < 1e-5
    # infall signature: the mass-weighted radial velocity is inward and the
    # system has gained kinetic energy from rest (mean radius is NOT a good
    # metric — the 2D collapse rebounds through the central caustic fast)
    pos, vel = np.asarray(out.pos), np.asarray(out.vel)
    r = np.linalg.norm(pos, axis=1)
    v_rad = (pos * vel).sum(1) / np.maximum(r, 1e-6)
    assert v_rad.mean() < -1.0
    assert 0.5 * (np.asarray(out.mass) * (vel**2).sum(1)).sum() > 0
    assert np.isfinite(pos).all()


def test_cold_disk_drives_adaptive_dt_down():
    # the collapse must push the criterion below dt_max at some point, so
    # the adaptive span takes MORE substeps than the force-free bound
    p = make_cold_disk(jax.random.PRNGKey(3), 128)
    w = nb.create_world(p, config=TINY)
    t_span, dt_max = 0.5, 0.05
    k = w.update_adaptive(t_span, dt_max=dt_max)
    assert k > int(t_span / dt_max) + 1
    assert np.isfinite(np.asarray(w.particles.pos)).all()
