"""Physics invariants over long horizons (SURVEY.md §4c): momentum
conservation, bounded energy drift for symplectic Euler, NaN-freedom."""

import numpy as np
from helpers import TINY
import pytest

from nbody_tpu import G, create_world, make_galaxies
from nbody_tpu.types import SimConfig


def momentum(host):
    m = np.asarray(host.mass, np.float64)[:, None]
    return (m * np.asarray(host.vel, np.float64)).sum(axis=0)


def energy(host, mass_len):
    """Total energy with the reference's softened potential.

    Note: the softening r2 = d^2 + radius_target is asymmetric, so 'energy' is
    only approximately conserved even in exact arithmetic; we use it as a
    drift *bound*, not an equality.
    """
    pos = np.asarray(host.pos, np.float64)
    vel = np.asarray(host.vel, np.float64)
    m = np.asarray(host.mass, np.float64)
    rad = np.asarray(host.radius, np.float64)
    ke = 0.5 * (m * (vel**2).sum(axis=1)).sum()
    src = pos[:mass_len]
    sm = m[:mass_len]
    dx = src[None, :, 0] - pos[:, None, 0]
    dy = src[None, :, 1] - pos[:, None, 1]
    r = np.sqrt(dx * dx + dy * dy + rad[:, None])
    pot = -G * (m[:, None] * sm[None, :] / r)
    np.fill_diagonal(pot[:mass_len, :], 0.0)
    pe = 0.5 * pot[:mass_len].sum() + pot[mass_len:].sum()
    return ke + pe


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_momentum_conserved(backend):
    """Newton's third law holds pairwise in the force law (up to the
    asymmetric softening), so total momentum drifts only slowly."""
    scene = make_galaxies(200, 1, seed=42)
    w = create_world(scene, config=TINY)
    p0 = momentum(w.particles)
    scale = np.abs(np.asarray(w.particles.mass, np.float64)).sum() * np.abs(
        np.asarray(w.particles.vel, np.float64)
    ).max()
    w.update(0.01, 100, backend=backend)
    p1 = momentum(w.particles)
    # relative to the total |m||v| scale of the system
    assert np.all(np.abs(p1 - p0) / scale < 1e-3)


def test_long_horizon_nan_free():
    scene = make_galaxies(300, 2, seed=11037)
    w = create_world(scene, config=TINY)
    w.update(0.01, 1000, backend="jnp")
    host = w.particles
    assert np.all(np.isfinite(np.asarray(host.pos)))
    assert np.all(np.isfinite(np.asarray(host.vel)))
    assert np.all(np.isfinite(np.asarray(host.acc)))


def test_energy_drift_bounded():
    scene = make_galaxies(150, 1, seed=5)
    w = create_world(scene, config=TINY)
    e0 = energy(w.particles, w.mass_len)
    w.update(0.005, 500, backend="jnp")
    e1 = energy(w.particles, w.mass_len)
    # symplectic Euler: bounded oscillation, no secular blowup at small dt
    assert abs(e1 - e0) / abs(e0) < 0.05


def test_two_body_circular_orbit():
    """A tracer in circular orbit around a heavy core stays at radius (the
    classic integrator sanity check)."""
    import nbody_tpu as nb

    m = 1e6
    core_radius = 1.0
    d = 100.0
    # account for softening in the circular speed: a = G m d / (d^2+rho)^1.5
    rho = 0.5
    speed = np.sqrt(G * m * d * d / (d * d + rho) ** 1.5)
    p = nb.make_particles(
        np.array([[0.0, 0.0], [d, 0.0]], np.float32),
        vel=np.array([[0.0, 0.0], [0.0, speed]], np.float32),
        mass=np.array([m, 0.0], np.float32),
        radius=np.array([core_radius, rho], np.float32),
    )
    w = create_world(p, config=TINY)
    # one full period T = 2 pi d / speed, in 2000 steps
    period = 2 * np.pi * d / speed
    w.update(period / 2000, 2000, backend="jnp")
    host = w.particles
    tracer = np.asarray(host.mass) == 0
    r_final = np.hypot(*np.asarray(host.pos, np.float64)[tracer][0])
    assert r_final == pytest.approx(d, rel=0.02)
