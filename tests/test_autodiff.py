"""Differentiable rollouts: gradient flow, correctness vs finite differences,
and a small shooting-problem optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import create_world, make_particles
from nbody_tpu.autodiff import rollout, trajectory_loss
from nbody_tpu.types import SimConfig



def sun_and_probe():
    """Heavy stationary body + light probe."""
    pos = np.array([[0.0, 0.0], [100.0, 0.0]], np.float32)
    vel = np.array([[0.0, 0.0], [0.0, 5.0]], np.float32)
    mass = np.array([1e5, 0.0], np.float32)
    radius = np.array([1.0, 0.5], np.float32)
    return pos, vel, mass, radius


def test_rollout_matches_world():
    pos, vel, mass, radius = sun_and_probe()
    p, v = rollout(jnp.array(pos), jnp.array(vel), jnp.array(mass), jnp.array(radius),
                   jnp.float32(0.01), n_steps=50, mass_len=1)
    w = create_world(make_particles(pos, vel=vel, mass=mass, radius=radius),
                     config=SimConfig(tile_targets=8, tile_sources=128, precise=True))
    w.update(0.01, 50, backend="jnp")
    np.testing.assert_allclose(np.asarray(p), np.asarray(w.particles.pos),
                               rtol=1e-5, atol=1e-4)


def test_grad_matches_finite_difference():
    pos, vel, mass, radius = sun_and_probe()
    target = jnp.array([0.0, 120.0], jnp.float32)
    loss = trajectory_loss(target, index=1)

    def f(vy):
        v = jnp.array(vel).at[1, 1].set(vy)
        return loss(jnp.array(pos), v, jnp.array(mass), jnp.array(radius),
                    jnp.float32(0.01), n_steps=30, mass_len=1)

    g = jax.grad(f)(jnp.float32(5.0))
    eps = 1e-2
    fd = (f(5.0 + eps) - f(5.0 - eps)) / (2 * eps)
    assert float(g) == pytest.approx(float(fd), rel=0.05)


def test_remat_equals_no_remat():
    pos, vel, mass, radius = sun_and_probe()

    def run(remat):
        p, v = rollout(jnp.array(pos), jnp.array(vel), jnp.array(mass),
                       jnp.array(radius), jnp.float32(0.01),
                       n_steps=20, mass_len=1, remat=remat)
        return np.asarray(p)

    np.testing.assert_array_equal(run(True), run(False))


def test_shooting_optimization_converges():
    """Gradient-descend the probe's initial velocity so it lands near a
    target after 40 steps — end-to-end adjoint through gravity."""
    pos, vel, mass, radius = sun_and_probe()
    target = jnp.array([80.0, 60.0], jnp.float32)
    loss = trajectory_loss(target, index=1)

    @jax.jit
    def step(v0):
        def f(v):
            return loss(jnp.array(pos), v, jnp.array(mass), jnp.array(radius),
                        jnp.float32(0.01), n_steps=40, mass_len=1)
        l, g = jax.value_and_grad(f)(v0)
        return l, v0 - 0.05 * g

    v = jnp.array(vel)
    l0 = None
    for k in range(150):
        l, v = step(v)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.02 * l0, f"loss {float(l):.3f} vs initial {l0:.3f}"


def test_pallas_backend_rollout_and_grad():
    """Differentiable rollout through the Pallas kernel (custom VJP)."""
    pos, vel, mass, radius = sun_and_probe()

    def f(backend, vy):
        v = jnp.array(vel).at[1, 1].set(vy)
        p, _ = rollout(jnp.array(pos), v, jnp.array(mass), jnp.array(radius),
                       jnp.float32(0.01), n_steps=20, mass_len=1,
                       backend=backend)
        return jnp.sum(p[1] ** 2)

    # forward parity
    assert float(f("pallas", 5.0)) == pytest.approx(float(f("jnp", 5.0)), rel=1e-5)
    # gradient parity (pallas bwd = adjoint of the jnp math)
    g_pallas = jax.grad(lambda vy: f("pallas", vy))(jnp.float32(5.0))
    g_jnp = jax.grad(lambda vy: f("jnp", vy))(jnp.float32(5.0))
    assert float(g_pallas) == pytest.approx(float(g_jnp), rel=1e-4)


def test_pallas_rollout_nonaligned_n():
    """Regression: N not a multiple of the kernel tile must pad correctly."""
    rng = np.random.default_rng(0)
    n = 600  # > 512 and not a tile multiple
    pos = (100 * rng.normal(size=(n, 2))).astype(np.float32)
    vel = rng.normal(size=(n, 2)).astype(np.float32)
    mass = np.concatenate([rng.uniform(10, 100, 300), np.zeros(300)]).astype(np.float32)
    radius = np.full(n, 1.0, np.float32)
    pa, _ = rollout(jnp.array(pos), jnp.array(vel), jnp.array(mass), jnp.array(radius),
                    jnp.float32(0.01), n_steps=3, mass_len=300, backend="pallas")
    pj, _ = rollout(jnp.array(pos), jnp.array(vel), jnp.array(mass), jnp.array(radius),
                    jnp.float32(0.01), n_steps=3, mass_len=300, backend="jnp")
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pj), rtol=1e-4, atol=1e-3)

    # gradient path must also survive the nonaligned shapes (the bwd chunk
    # divisibility is a separate constraint from the forward tiles)
    def f(backend, scale):
        p, _ = rollout(jnp.array(pos), scale * jnp.array(vel), jnp.array(mass),
                       jnp.array(radius), jnp.float32(0.01),
                       n_steps=3, mass_len=300, backend=backend)
        return jnp.sum(p ** 2)

    ga = jax.grad(lambda s: f("pallas", s))(jnp.float32(1.0))
    gj = jax.grad(lambda s: f("jnp", s))(jnp.float32(1.0))
    assert float(ga) == pytest.approx(float(gj), rel=1e-4)


def test_sharded_rollout_matches_single_device():
    """rollout_sharded: value AND gradient parity vs the single-device
    rollout for all three differentiable collective force paths (ppermute
    ring / psum'd pm grid / merged-cell-block p3m)."""
    import nbody_tpu as nb
    from nbody_tpu.autodiff import rollout_sharded
    from nbody_tpu.parallel.sharding import make_mesh

    scene = nb.make_galaxies(500, 1, seed=4)
    w = nb.create_world(scene)
    h = w.particles
    pos, vel = jnp.asarray(h.pos), jnp.asarray(h.vel)
    mass, radius = jnp.asarray(h.mass), jnp.asarray(h.radius)
    mesh = make_mesh(8)

    for backend, grid, tol in (("jnp", 64, 3e-5), ("pm", 128, 1e-5),
                               ("p3m", 64, 1e-4)):
        kw = dict(n_steps=3, mass_len=w.mass_len, backend=backend,
                  pm_grid=grid)

        def loss_s(p):
            a, _ = rollout_sharded(p, vel, mass, radius, 0.01,
                                   mesh=mesh, **kw)
            return jnp.sum(a ** 2)

        def loss_1(p):
            a, _ = rollout(p, vel, mass, radius, 0.01, **kw)
            return jnp.sum(a ** 2)

        v_s, v_1 = float(loss_s(pos)), float(loss_1(pos))
        assert v_s == pytest.approx(v_1, rel=1e-5), backend
        g_s = np.asarray(jax.grad(loss_s)(pos))
        g_1 = np.asarray(jax.grad(loss_1)(pos))
        rel = np.abs(g_s - g_1).max() / np.abs(g_1).max()
        assert rel < tol, f"{backend}: grad rel err {rel:.2e}"


def test_sharded_rollout_nonaligned_large_shard():
    """Regression: shard sizes above `chunk` that are not chunk-multiples
    must pad up (n=1300 on 2 devices gave n_loc=652 and crashed the jnp
    ring's chunked direct sum before the round-3 fix)."""
    import nbody_tpu as nb
    from nbody_tpu.autodiff import rollout_sharded
    from nbody_tpu.parallel.sharding import make_mesh

    scene = nb.make_galaxies(1300, 1, seed=8)
    w = nb.create_world(scene)
    h = w.particles
    pos, vel = jnp.asarray(h.pos), jnp.asarray(h.vel)
    mass, radius = jnp.asarray(h.mass), jnp.asarray(h.radius)

    ps, _ = rollout_sharded(pos, vel, mass, radius, 0.01, n_steps=3,
                            mass_len=w.mass_len, mesh=make_mesh(2))
    p1, _ = rollout(pos, vel, mass, radius, jnp.float32(0.01), n_steps=3,
                    mass_len=w.mass_len)
    scale = np.abs(np.asarray(p1)).max()
    np.testing.assert_allclose(np.asarray(ps) / scale,
                               np.asarray(p1) / scale, atol=1e-6)


def test_p3m_rollout_rebin_value_and_grad_parity():
    """rollout(backend='p3m') honors p3m_rebin_interval (round-2 VERDICT
    next #8): the frozen-bins scan must track the rebuild-every-step form in
    value AND gradient (only the neighbor candidate windows lag, bounded by
    the taper), with non-default p3m tuning threaded through (advisor
    finding: rollout previously hardcoded the defaults)."""
    import nbody_tpu as nb

    scene = nb.make_galaxies(700, 1, seed=6)
    w = nb.create_world(scene)
    h = w.particles
    pos, vel = jnp.asarray(h.pos), jnp.asarray(h.vel)
    mass, radius = jnp.asarray(h.mass), jnp.asarray(h.radius)
    kw = dict(n_steps=12, mass_len=w.mass_len, pm_grid=128,
              p3m_cell_capacity=32, p3m_exact_targets=16, precise=False)

    def loss(p0, rebin):
        p, v = rollout(p0, vel, mass, radius, jnp.float32(0.01),
                       backend="p3m", p3m_rebin_interval=rebin, **kw)
        return jnp.sum(p * p) * 1e-6

    v1, g1 = jax.value_and_grad(lambda p: loss(p, 1))(pos)
    v4, g4 = jax.value_and_grad(lambda p: loss(p, 4))(pos)
    np.testing.assert_allclose(float(v4), float(v1), rtol=1e-4)
    g1, g4 = np.asarray(g1), np.asarray(g4)
    scale = np.abs(g1).max()
    # worst element: a particle whose neighbor window lagged across the
    # (taper-suppressed) rc boundary; bulk must be far tighter
    np.testing.assert_allclose(g4 / scale, g1 / scale, atol=6e-3)
    assert np.percentile(np.abs(g4 - g1) / scale, 99) < 1e-3

    # rebin=1 must be the exact (rebuild-every-step) behavior: bit-identical
    # forward value to the world backend run with the same tuning
    p1, _ = rollout(pos, vel, mass, radius, jnp.float32(0.01),
                    backend="p3m", p3m_rebin_interval=1, **kw)
    cfg = SimConfig(pm_grid=128, p3m_cell_capacity=32, p3m_exact_targets=16)
    w2 = create_world(make_particles(np.asarray(h.pos), vel=np.asarray(h.vel),
                                     mass=np.asarray(h.mass),
                                     radius=np.asarray(h.radius)),
                      config=cfg)
    w2.update(0.01, 12, backend="p3m")
    ref = np.asarray(w2.particles.pos)
    s = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(p1) / s, ref / s, atol=1e-6)


def test_pp_chunk_mass_gradient_semantics():
    """The PP chunk skip is primal-exact but NOT gradient-exact w.r.t. the
    mass of an exactly-massless source: lax.cond's VJP returns a zero
    cotangent through a skipped chunk, so d(acc)/d(gm) at gm == 0 loses its
    PP component when the source's whole chunk neighborhood is massless.
    This is why rollout/rollout_sharded default p3m_pp_chunk to 0. Pin both
    halves: (a) the unchunked gradient matches a central finite difference
    of the (chunked, primal-exact) loss; (b) the chunked gradient misses
    exactly the PP part."""
    from nbody_tpu.ops.p3m_forces import p3m_acc

    # tracer target + zero-gm source isolated at the origin; massive
    # sources and the exact-core decoy far away in the opposite grid corner
    tgt_pos = jnp.array([[0.0, 0.0], [1000.0, 1000.0]], jnp.float32)
    tgt_radius = jnp.array([0.5, 10.0], jnp.float32)
    src_pos = jnp.array(
        [[1.0, 0.0], [1000.0, 1000.0], [980.0, 1010.0], [1010.0, 985.0]],
        jnp.float32)
    src_gm = jnp.array([0.0, 10.0, 10.0, 10.0], jnp.float32)
    kw = dict(grid=64, rc_cells=4, cell_capacity=8, exact_targets=1)

    def loss(gm, pp_chunk):
        acc = p3m_acc(tgt_pos, tgt_radius, src_pos, gm, **kw,
                      pp_chunk=pp_chunk)
        return acc[0, 0]  # x-acceleration of the tracer target

    g_none = np.asarray(jax.grad(lambda g: loss(g, None))(src_gm))
    g_chunk = np.asarray(jax.grad(lambda g: loss(g, 16))(src_gm))

    eps = 1e-2
    e0 = jnp.zeros_like(src_gm).at[0].set(eps)
    fd = (float(loss(src_gm + e0, 16)) - float(loss(src_gm - e0, 16))) / (2 * eps)

    # (a) unchunked AD == truth (the primal is continuous and exact even
    #     when chunked, so its FD slope is the true derivative)
    np.testing.assert_allclose(g_none[0], fd, rtol=5e-2)
    # the PP term at d=1 (radius softening 0.5) dominates: ~(1.5)^-1.5
    assert abs(g_none[0]) > 0.3
    # (b) chunked AD silently drops that PP component
    assert abs(g_chunk[0]) < 0.1 * abs(g_none[0])
    # massive sources sit in active chunks: their gradients agree
    np.testing.assert_allclose(g_chunk[1:], g_none[1:], rtol=1e-4)


def test_rollout_particles_wrapper():
    """rollout_particles round-trips the Particles pytree through rollout
    (positions advance, static fields pass through untouched)."""
    import nbody_tpu as nb
    from nbody_tpu.autodiff import rollout_particles

    w = nb.create_world(nb.make_galaxies(300, 1, seed=4))
    h = w.particles
    out = rollout_particles(h, 0.01, n_steps=6, mass_len=w.mass_len)
    assert not np.allclose(np.asarray(out.pos), np.asarray(h.pos))
    np.testing.assert_array_equal(np.asarray(out.mass), np.asarray(h.mass))
    np.testing.assert_array_equal(np.asarray(out.radius),
                                  np.asarray(h.radius))
    w.update(0.01, 6, backend="jnp")
    ref = np.asarray(w.particles.pos)
    s = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out.pos) / s, ref / s, atol=1e-6)


def test_unknown_backend_raises():
    # the dispatch's `else:` branch is the jnp path; a typo must not fall
    # through to it silently
    pos, vel, mass, radius = sun_and_probe()
    with pytest.raises(ValueError, match="unknown rollout backend"):
        rollout(pos, vel, mass, radius, 0.01,
                n_steps=1, mass_len=1, backend="cuda")
    from nbody_tpu.autodiff import rollout_sharded
    from nbody_tpu.parallel.sharding import make_mesh
    with pytest.raises(ValueError, match="unknown sharded rollout backend"):
        rollout_sharded(pos, vel, mass, radius, 0.01,
                        n_steps=1, mass_len=1, mesh=make_mesh(),
                        backend="pallas_ring")
