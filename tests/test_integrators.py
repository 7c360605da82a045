"""Integrator options beyond the reference's semi-implicit Euler (quirk #2):
leapfrog (position-Verlet, order 2) and yoshida4 (4th-order symplectic DKD
composition) — measured convergence orders, energy-drift ordering, and
backend/sharded parity for each. Default stays Euler."""

import numpy as np
import pytest

from nbody_tpu import G, create_world, make_galaxies, make_particles
from nbody_tpu.diagnostics import total_energy
from nbody_tpu.integrators import YOSHIDA4_W0, YOSHIDA4_W1, stage_weights
from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
from nbody_tpu.types import SimConfig
from helpers import TINY

LEAP = SimConfig(tile_targets=8, tile_sources=128, integrator="leapfrog")
YOSH = SimConfig(tile_targets=8, tile_sources=128, integrator="yoshida4")


def two_body():
    m = 1e6
    d = 100.0
    rho = 0.5
    speed = np.sqrt(G * m * d * d / (d * d + rho) ** 1.5)
    return make_particles(
        np.array([[0.0, 0.0], [d, 0.0]], np.float32),
        vel=np.array([[0.0, 0.0], [0.0, speed]], np.float32),
        mass=np.array([m, 0.0], np.float32),
        radius=np.array([1.0, rho], np.float32),
    ), speed, d


def test_default_is_euler_reference_semantics():
    assert SimConfig().integrator == "euler"


def test_leapfrog_orbit_radius_more_stable_than_euler():
    p, speed, d = two_body()
    period = 2 * np.pi * d / speed
    dt = period / 300  # coarse on purpose

    def final_radius(config):
        w = create_world(p, config=config)
        w.update(dt, 600, backend="jnp")  # two periods
        tracer = np.asarray(w.particles.mass) == 0
        return float(np.hypot(*np.asarray(w.particles.pos, np.float64)[tracer][0]))

    err_euler = abs(final_radius(TINY) - d)
    err_leap = abs(final_radius(LEAP) - d)
    assert err_leap < 0.5 * err_euler, (err_leap, err_euler)


def test_energy_drift_lower_than_euler():
    scene = make_galaxies(150, 1, seed=5)
    drifts = {}
    for name, cfg in (("euler", TINY), ("leapfrog", LEAP)):
        w = create_world(scene, config=cfg)
        e0 = float(total_energy(w.state.slice_to(w.total_len), w.mass_len))
        w.update(0.02, 300, backend="jnp")  # deliberately coarse dt
        e1 = float(total_energy(w.state.slice_to(w.total_len), w.mass_len))
        drifts[name] = abs(e1 - e0) / abs(e0)
    assert drifts["leapfrog"] < drifts["euler"]


def test_backend_parity_leapfrog():
    scene = make_galaxies(200, 1, seed=9)
    w1 = create_world(scene, config=LEAP)
    w2 = create_world(scene, config=LEAP)
    w1.update(0.01, 5, backend="jnp")
    w2.update(0.01, 5, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(w1.particles.pos), np.asarray(w2.particles.pos),
        rtol=2e-4, atol=2e-3,
    )


def test_sharded_leapfrog_matches_single_device():
    scene = make_galaxies(250, 1, seed=11)
    sw = ShardedWorld(scene, make_mesh(4), config=LEAP, force_backend="jnp")
    w = create_world(scene, config=LEAP)
    sw.update(0.01, 4)
    w.update(0.01, 4, backend="jnp")
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos),
        rtol=3e-4, atol=3e-3,
    )


def test_fused_kernel_leapfrog_matches_jnp():
    # the fused kernel integrates leapfrog in-kernel (kick + half-drift with
    # the caller pre-drifting); must match the jnp DKD trajectory
    scene = make_galaxies(200, 1, seed=1)
    wp = create_world(scene, config=LEAP, default_backend="pallas")
    wj = create_world(scene, config=LEAP, default_backend="jnp")
    wp.update(0.01, 20)
    wj.update(0.01, 20)
    np.testing.assert_allclose(
        np.asarray(wp.particles.pos), np.asarray(wj.particles.pos),
        rtol=3e-4, atol=3e-3,
    )
    np.testing.assert_allclose(
        np.asarray(wp.particles.vel), np.asarray(wj.particles.vel),
        rtol=3e-4, atol=3e-3,
    )


def test_ring_backend_leapfrog_matches_jnp():
    # in-kernel kick + half-drift (pos_dt=0.5) with the caller pre-drifting;
    # must match the sharded jnp DKD trajectory
    scene = make_galaxies(240, 1, seed=1)
    swr = ShardedWorld(scene, make_mesh(2), config=LEAP,
                       force_backend="pallas_ring")
    swj = ShardedWorld(scene, make_mesh(2), config=LEAP, force_backend="jnp")
    swr.update(0.01, 8)
    swj.update(0.01, 8)
    np.testing.assert_allclose(
        np.asarray(swr.particles.pos), np.asarray(swj.particles.pos),
        rtol=3e-4, atol=3e-3,
    )


def test_p3m_leapfrog_tracks_jnp():
    """p3m + position-Verlet: the bins-loop (bins built at the pre-drift
    positions, force at the midpoint — a half-substep-stale candidate set
    at most) must track the exact jnp leapfrog trajectory."""
    import nbody_tpu as nb

    scene = nb.make_galaxies(800, 1, seed=6)
    cfg = SimConfig(tile_targets=128, pm_grid=256, p3m_cell_capacity=32,
                    integrator="leapfrog")
    w_ref = nb.create_world(scene, config=cfg)
    w_p3m = nb.create_world(scene, config=cfg)
    w_ref.update(0.01, 16, backend="jnp")
    w_p3m.update(0.01, 16, backend="p3m")
    a = np.asarray(w_ref.particles.pos)
    b = np.asarray(w_p3m.particles.pos)
    scale = np.abs(a).max()
    assert np.max(np.abs(a - b)) / scale < 5e-4


# ---------------------------------------------------------------- yoshida4


def test_stage_weights_table():
    assert stage_weights("euler") is None
    assert stage_weights("leapfrog") == (1.0,)
    w = stage_weights("yoshida4")
    assert w == (YOSHIDA4_W1, YOSHIDA4_W0, YOSHIDA4_W1)
    # the composition must advance time by exactly one dt, with the middle
    # stage running backward (Yoshida 1990)
    assert abs(sum(w) - 1.0) < 1e-15
    assert YOSHIDA4_W0 < 0 < YOSHIDA4_W1
    with pytest.raises(ValueError):
        stage_weights("rk4")


def test_convergence_orders_on_circular_orbit():
    """Measured order of every integrator on an equal-mass circular binary
    (dt-halving error ratios vs a fine-dt yoshida4 reference): euler -> ~2x,
    leapfrog -> ~4x, yoshida4 -> ~16x per halving. Coarse dt keeps yoshida4
    well above the fp32 floor (measured ratios 14.6 / 13.9 at these dts)."""
    import jax.numpy as jnp

    from nbody_tpu.autodiff import rollout

    m, d, rad = 100.0, 20.0, 1e-3
    a = G * m * d / (d * d + rad) ** 1.5
    v = np.sqrt(a * d / 2)
    pos = jnp.array([[-d / 2, 0.0], [d / 2, 0.0]], jnp.float32)
    vel = jnp.array([[0.0, -v], [0.0, v]], jnp.float32)
    mass = jnp.array([m, m], jnp.float32)
    radius = jnp.array([rad, rad], jnp.float32)
    T = 4.0

    def final(integrator, k):
        p, _ = rollout(pos, vel, mass, radius, jnp.float32(T / k),
                       n_steps=k, mass_len=2, precise=True, remat=False,
                       integrator=integrator)
        return np.asarray(p, np.float64)

    ref = final("yoshida4", 4096)
    for integ, lo, hi in (("euler", 1.6, 2.6), ("leapfrog", 3.0, 5.3),
                          ("yoshida4", 9.0, 24.0)):
        errs = [np.abs(final(integ, k) - ref).max() for k in (8, 16, 32)]
        for ratio in (errs[0] / errs[1], errs[1] / errs[2]):
            assert lo < ratio < hi, (integ, errs)


def test_yoshida4_energy_drift_lower_than_leapfrog():
    scene = make_galaxies(150, 1, seed=5)
    drifts = {}
    for name, cfg in (("leapfrog", LEAP), ("yoshida4", YOSH)):
        w = create_world(scene, config=cfg)
        e0 = float(total_energy(w.state.slice_to(w.total_len), w.mass_len))
        w.update(0.02, 300, backend="jnp")  # deliberately coarse dt
        e1 = float(total_energy(w.state.slice_to(w.total_len), w.mass_len))
        drifts[name] = abs(e1 - e0) / abs(e0)
    assert drifts["yoshida4"] < drifts["leapfrog"], drifts


def test_fused_kernel_yoshida4_matches_jnp():
    # three weighted DKD kernel launches per substep (world._step) must
    # match the jnp composition
    scene = make_galaxies(200, 1, seed=1)
    wp = create_world(scene, config=YOSH, default_backend="pallas")
    wj = create_world(scene, config=YOSH, default_backend="jnp")
    wp.update(0.01, 20)
    wj.update(0.01, 20)
    np.testing.assert_allclose(
        np.asarray(wp.particles.pos), np.asarray(wj.particles.pos),
        rtol=3e-4, atol=3e-3,
    )
    np.testing.assert_allclose(
        np.asarray(wp.particles.vel), np.asarray(wj.particles.vel),
        rtol=3e-4, atol=3e-3,
    )


def test_sharded_yoshida4_matches_single_device():
    scene = make_galaxies(250, 1, seed=11)
    sw = ShardedWorld(scene, make_mesh(4), config=YOSH, force_backend="jnp")
    w = create_world(scene, config=YOSH)
    sw.update(0.01, 4)
    w.update(0.01, 4, backend="jnp")
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos),
        rtol=3e-4, atol=3e-3,
    )


def test_ring_backend_yoshida4_matches_jnp():
    scene = make_galaxies(240, 1, seed=1)
    swr = ShardedWorld(scene, make_mesh(2), config=YOSH,
                       force_backend="pallas_ring")
    swj = ShardedWorld(scene, make_mesh(2), config=YOSH, force_backend="jnp")
    swr.update(0.01, 8)
    swj.update(0.01, 8)
    np.testing.assert_allclose(
        np.asarray(swr.particles.pos), np.asarray(swj.particles.pos),
        rtol=3e-4, atol=3e-3,
    )


def test_p3m_yoshida4_tracks_jnp():
    """p3m + yoshida4: all three DKD stages of a substep share the frozen
    bins (built at the substep's entry positions); the stage drift is
    covered by the same rc-boundary argument as p3m_rebin_interval."""
    import nbody_tpu as nb

    scene = nb.make_galaxies(800, 1, seed=6)
    cfg = SimConfig(tile_targets=128, pm_grid=256, p3m_cell_capacity=32,
                    integrator="yoshida4")
    w_ref = nb.create_world(scene, config=cfg)
    w_p3m = nb.create_world(scene, config=cfg)
    w_ref.update(0.01, 16, backend="jnp")
    w_p3m.update(0.01, 16, backend="p3m")
    a = np.asarray(w_ref.particles.pos)
    b = np.asarray(w_p3m.particles.pos)
    scale = np.abs(a).max()
    assert np.max(np.abs(a - b)) / scale < 5e-4


def test_sharded_pm_yoshida4_matches_single_device():
    import nbody_tpu as nb

    scene = nb.make_galaxies(400, 1, seed=3)
    cfg = SimConfig(tile_targets=64, pm_grid=128, integrator="yoshida4")
    sw = ShardedWorld(scene, make_mesh(4), config=cfg, force_backend="pm")
    w = nb.create_world(scene, config=cfg)
    sw.update(0.01, 4)
    w.update(0.01, 4, backend="pm")
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos),
        rtol=3e-4, atol=3e-3,
    )


def test_autodiff_yoshida4_matches_world_and_differentiates():
    """rollout(integrator='yoshida4') primal == World trajectory, and grad
    through the composition (incl. the negative middle stage) is finite."""
    import jax
    import jax.numpy as jnp

    from nbody_tpu.autodiff import rollout

    scene = make_galaxies(120, 1, seed=2)
    cfg = SimConfig(tile_targets=8, tile_sources=128, integrator="yoshida4",
                    precise=True)
    w = create_world(scene, config=cfg)
    n, ml = w.total_len, w.mass_len
    st = w.state.slice_to(n)
    pos, vel = st.pos, st.vel
    mass, radius = st.mass, st.radius
    w.update(0.01, 10, backend="jnp")
    p_roll, _ = rollout(pos, vel, mass, radius, jnp.float32(0.01),
                        n_steps=10, mass_len=ml, precise=True,
                        integrator="yoshida4")
    np.testing.assert_allclose(
        np.asarray(w.particles.pos), np.asarray(p_roll)[:len(w.particles.pos)],
        rtol=2e-4, atol=2e-3,
    )

    def loss(v0):
        p, _ = rollout(pos, v0, mass, radius, jnp.float32(0.01),
                       n_steps=10, mass_len=ml, precise=True,
                       integrator="yoshida4")
        return jnp.sum(p ** 2)

    g = jax.grad(loss)(vel)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_symmetric_integrators_are_time_reversible():
    """Leapfrog and yoshida4 are symmetric compositions: stepping n substeps
    at +dt then n at -dt must return to the initial state up to fp32
    round-off. Semi-implicit Euler is NOT symmetric (its inverse needs the
    updated velocity to undo the position first), so its reversal error is
    orders of magnitude larger — a sharp structural test of the integrator
    compositions that energy-drift bounds can't provide.

    Uses the regular two-body orbit: on a chaotic galaxy scene fp32
    round-off amplifies along the reversed path and washes out the
    structural signal (measured: yoshida4 reverses to 1.5e-3 there, barely
    under euler). In fp64 both compositions reverse to ~1e-10 on any scene.
    yoshida4's fp32 floor sits ~10x leapfrog's: its stages traverse
    |w1|+|w0|+|w1| ≈ 4.4 dt of excursion per substep with 3 force evals."""
    scene, _, d = two_body()
    err = {}
    for name in ("euler", "leapfrog", "yoshida4"):
        w = create_world(
            scene, config=SimConfig(tile_targets=8, tile_sources=128,
                                    integrator=name))
        p0 = np.asarray(w.particles.pos).copy()
        w.update(0.005, 64)
        w.update(-0.005, 64)
        err[name] = float(np.abs(np.asarray(w.particles.pos) - p0).max()) / d
    assert err["leapfrog"] < 1e-4, err
    assert err["yoshida4"] < 2e-3, err
    assert err["euler"] > 50 * err["leapfrog"], err
    assert err["euler"] > 10 * err["yoshida4"], err
