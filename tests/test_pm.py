"""Particle-mesh far-field solver (ops/pm_forces.py) — beyond-reference
approximate backend. Accuracy envelopes vs the exact direct sum, grid
convergence, and World integration."""

import numpy as np
import pytest

import jax.numpy as jnp

import nbody_tpu as nb
from nbody_tpu import forces
from nbody_tpu.ops.pm_forces import pm_acc
from nbody_tpu.types import SimConfig


def test_two_body_far_field_exact():
    # well-separated point masses: PM must reproduce 1/r^2 to sub-percent
    pos = jnp.array([[-5000.0, 0.0], [5000.0, 0.0]], jnp.float32)
    gm = jnp.array([1e6, 1e6], jnp.float32)
    acc = np.asarray(pm_acc(pos, pos, gm, softening=1.0, grid=512))
    exact = 1e6 / 10000.0**2
    np.testing.assert_allclose(acc[0, 0], exact, rtol=0.01)
    np.testing.assert_allclose(acc[1, 0], -exact, rtol=0.01)
    # antisymmetry: spurious transverse force only at FFT round-off level
    # (TPU fp32 FFTs are noisier than CPU's: ~4e-4 of the radial term vs
    # ~2e-5 — both far inside the documented PM error envelope)
    np.testing.assert_allclose(acc[:, 1], 0.0, atol=6e-2 * exact)


def _galaxy_errors(grid):
    scene = nb.make_galaxies(2048, 2, seed=11037)
    w = nb.create_world(scene)
    pos = w.state.pos[: w.total_len]
    src = pos[: w.mass_len]
    gm = w.gm[: w.mass_len]
    ref = np.asarray(forces.direct_sum_acc(
        pos, w.state.radius[: w.total_len], src, gm, chunk=None, precise=True))
    got = np.asarray(pm_acc(pos, src, gm, softening=2.0, grid=grid))
    mag = np.hypot(ref[:, 0], ref[:, 1])
    return np.hypot(*(got - ref).T) / (mag + 0.01 * mag.mean())


def test_galaxy_scene_error_envelope():
    err = _galaxy_errors(512)
    assert np.median(err) < 0.005
    assert np.percentile(err, 90) < 0.02
    assert np.percentile(err, 99) < 0.08


def test_grid_convergence():
    # finer mesh -> smaller far-field error (p90 over a real scene)
    e256 = np.percentile(_galaxy_errors(256), 90)
    e1024 = np.percentile(_galaxy_errors(1024), 90)
    assert e1024 < e256


def test_world_pm_backend_matches_jnp_trajectory():
    # short-horizon trajectory agreement on a smooth scene
    scene = nb.make_galaxies(1500, 1, seed=5)
    cfg = SimConfig(tile_targets=128, pm_grid=512)
    wp = nb.create_world(scene, config=cfg, default_backend="pm")
    wj = nb.create_world(scene, config=cfg, default_backend="jnp")
    wp.update(0.01, 20)
    wj.update(0.01, 20)
    a = np.asarray(wp.particles.pos)
    b = np.asarray(wj.particles.pos)
    scale = np.abs(b).max()
    per_particle = np.abs(a - b).max(axis=1) / scale
    # bulk trajectory agrees tightly; a handful of sub-cell close encounters
    # see the smoothed force (that is the PM approximation, by design)
    assert np.percentile(per_particle, 99) < 1e-3
    assert per_particle.max() < 5e-2
    assert np.all(np.isfinite(a))


def test_pm_momentum_approximately_conserved():
    # the odd convolution kernel gives pairwise antisymmetric mesh forces;
    # total momentum of the massive set drifts only at discretization level
    scene = nb.make_galaxies(1500, 1, seed=7)
    w = nb.create_world(scene, default_backend="pm")
    m = np.asarray(w.particles.mass, np.float64)
    p0 = (m[:, None] * np.asarray(w.particles.vel, np.float64)).sum(0)
    w.update(0.01, 50)
    p1 = (m[:, None] * np.asarray(w.particles.vel, np.float64)).sum(0)
    vscale = float(m.sum() * max(1.0, np.abs(np.asarray(w.particles.vel)).max()))
    # CPU measures ~3e-6; TPU ~4.5e-4 (noisier fp32 FFT) — both bounded at
    # mesh/FFT round-off level
    assert np.linalg.norm(p1 - p0) / vscale < 2e-3


def test_pm_rollout_gradients_match_direct():
    # PM is pure jnp, so jax.grad flows natively; on a smooth scene its
    # gradient w.r.t. initial positions tracks the exact solver's
    import jax
    from nbody_tpu.autodiff import rollout

    scene = nb.make_galaxies(300, 1, seed=2)
    w = nb.create_world(scene)
    host = w.particles
    pos = jnp.asarray(host.pos)
    vel = jnp.asarray(host.vel)
    mass = jnp.asarray(host.mass)
    radius = jnp.asarray(host.radius)

    def loss(p0, backend):
        p, v = rollout(p0, vel, mass, radius, 0.01, n_steps=5,
                       mass_len=w.mass_len, backend=backend)
        return jnp.sum(p**2)

    g_pm = np.asarray(jax.grad(lambda p: loss(p, "pm"))(pos))
    g_ref = np.asarray(jax.grad(lambda p: loss(p, "jnp"))(pos))
    scale = np.abs(g_ref).max()
    err = np.percentile(np.abs(g_pm - g_ref).max(axis=1) / scale, 95)
    assert err < 2e-2, f"p95 gradient mismatch {err:.3f}"


def test_pm_box_ignores_padding_rows():
    """World padding rows are pinned at the origin; the adaptive PM box must
    not include them (code-review r2 finding: a cluster far from the origin
    silently got a ~20x coarser mesh). Property: the padded world's PM force
    equals PM evaluated on the tightly-sliced real rows."""
    rng = np.random.RandomState(0)
    pos = rng.randn(1000, 2).astype(np.float32) * 50 + 5000.0
    mass = np.abs(rng.randn(1000)).astype(np.float32) + 0.5
    p = nb.make_particles(pos, mass=mass)
    w = nb.create_world(p, default_backend="pm")
    assert w.n_pad > w.total_len  # padding rows exist at (0, 0)
    tight = np.asarray(pm_acc(
        w.state.pos[: w.total_len], w.state.pos[: w.mass_len],
        w.gm[: w.mass_len], softening=2.0, grid=512))
    w.update(0.0, 1)  # dt=0: pure force evaluation into acc
    got = np.asarray(w.particles.acc)
    scale = np.abs(tight).max()
    np.testing.assert_allclose(got / scale, tight / scale, atol=1e-5)


def test_pm_softening_validation_and_zero_guard():
    from nbody_tpu.types import SimConfig as SC

    with pytest.raises(ValueError, match="pm_softening"):
        SC(pm_softening=0.0)
    # direct call with softening=0 must stay finite (kernel-center guard)
    pos = jnp.array([[-100.0, 0.0], [100.0, 0.0]], jnp.float32)
    gm = jnp.array([1e4, 1e4], jnp.float32)
    acc = np.asarray(pm_acc(pos, pos, gm, softening=0.0, grid=64))
    assert np.all(np.isfinite(acc))


def test_sharded_pm_matches_single_device():
    """Collective PM (per-shard CIC scatter + one psum of the mass grid +
    replicated solve + local gather) must reproduce the single-device PM."""
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(1024, 2, seed=11037)
    cfg = SimConfig(tile_targets=64, pm_grid=256)
    for d in (2, 8):
        sw = ShardedWorld(scene, make_mesh(d), config=cfg, force_backend="pm")
        w = nb.create_world(scene, config=cfg, default_backend="pm")
        sw.update(0.01, 3)
        w.update(0.01, 3)
        a = np.asarray(sw.particles.pos)
        b = np.asarray(w.particles.pos)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-6)


def test_sharded_pm_leapfrog():
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(512, 1, seed=3)
    cfg = SimConfig(tile_targets=64, pm_grid=256, integrator="leapfrog")
    sw = ShardedWorld(scene, make_mesh(4), config=cfg, force_backend="pm")
    w = nb.create_world(scene, config=cfg, default_backend="pm")
    sw.update(0.01, 4)
    w.update(0.01, 4)
    np.testing.assert_allclose(
        np.asarray(sw.particles.pos), np.asarray(w.particles.pos),
        rtol=3e-4, atol=3e-3)


def test_patch_row_gather_matches_naive_corner_gather():
    """The (G^2, 8) patch-row CIC gather (one index per target — TPU gather
    costs per index, scripts/ablations/tune_r3d_cic.py) must be BIT-identical to the
    naive per-corner element gather it replaced: same corners, same weights,
    same corner order. Equal to fp32 contraction-order noise: XLA fuses
    (and fma's) the jitted patch form differently than the eager reference
    ops, so exact bit equality only holds within one compiled program —
    the in-production check is the pm trajectory parity tests above."""
    import jax
    from nbody_tpu.ops.pm_forces import _cic_gather, _cic_weights

    rng = np.random.default_rng(5)
    grid = 64
    a_grid = jnp.asarray(rng.normal(size=(grid, grid, 2)).astype(np.float32))
    lo = jnp.asarray([-3.0, -4.0], jnp.float32)
    h = 0.25
    # targets spanning the interior AND the clamped boundary (i0 = grid-2)
    pos = rng.uniform(-3.0, -3.0 + grid * h, size=(512, 2)).astype(np.float32)
    pos[:8] = [-3.0 + grid * h - 1e-4, -4.0 + grid * h - 1e-4]  # far corner
    pos[8:16] = [-3.0 + 1e-4, -4.0 + 1e-4]                      # near corner
    pos = jnp.asarray(pos)

    got = jax.jit(lambda a, p: _cic_gather(a, p, lo, 1.0 / h, grid))(a_grid, pos)

    i0, j0, wx, wy = _cic_weights(pos, lo, 1.0 / h, grid)
    n = pos.shape[0]
    rows = jnp.stack(
        [a_grid[i0, j0], a_grid[i0 + 1, j0],
         a_grid[i0, j0 + 1], a_grid[i0 + 1, j0 + 1]], axis=1)  # (N, 4, 2)
    w = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                   (1 - wx) * wy, wx * wy], axis=-1)
    want = (rows * w[..., None]).sum(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=3e-7)
