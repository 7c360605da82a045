"""User acceleration-field hook (`World.update(extra_force=...)`).

Beyond-reference capability: external potentials, drag, thrust composed
with self-gravity inside the same fused substep loop. The reference has no
extension point at all (its force law is baked into the shader/SIMD loop).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nbody_tpu as nb
from nbody_tpu.types import SimConfig, make_particles
from helpers import TINY

DT = 0.01


def _tracer_world(vel=(0.0, 0.0), config=TINY):
    """One massless tracer: self-gravity is identically zero, so the hook's
    acceleration is the ONLY dynamics — closed-form checkable."""
    p = make_particles(np.zeros((1, 2), np.float32),
                       vel=np.asarray([vel], np.float32))
    return nb.create_world(p, config=config)


def _uniform_field(pos, vel):
    return jnp.broadcast_to(jnp.asarray([0.0, -9.8], jnp.float32), pos.shape)


def test_uniform_field_matches_euler_closed_form():
    w = _tracer_world()
    n = 50
    w.update(DT, n, backend="jnp", extra_force=_uniform_field)
    # semi-implicit Euler under constant acc: v_k = k*a*dt,
    # x_k = sum v_i*dt = a*dt^2 * k(k+1)/2
    vy = float(w.particles.vel[0, 1])
    y = float(w.particles.pos[0, 1])
    assert vy == pytest.approx(-9.8 * DT * n, rel=1e-5)
    assert y == pytest.approx(-9.8 * DT * DT * n * (n + 1) / 2, rel=1e-4)


def test_drag_decays_velocity():
    k = 2.0

    def drag(pos, vel):
        return -k * vel

    w = _tracer_world(vel=(3.0, 0.0))
    w.update(DT, 100, backend="jnp", extra_force=drag)
    # Euler with the substep-entry velocity: v *= (1 - k*dt) each substep
    expect = 3.0 * (1.0 - k * DT) ** 100
    assert float(w.particles.vel[0, 0]) == pytest.approx(expect, rel=1e-4)
    assert abs(float(w.particles.vel[0, 1])) == 0.0


def test_composes_with_gravity_and_every_backend():
    """The hook adds to (not replaces) self-gravity, identically across
    backends — pallas routes through the generic stage loop when hooked."""
    scene = nb.make_galaxies(250, 1, seed=3)
    ref = nb.create_world(scene, config=TINY)
    ref.update(DT, 5, backend="jnp")
    base = np.asarray(ref.particles.pos)

    results = {}
    for backend in ("jnp", "pallas", "p3m"):
        w = nb.create_world(scene, config=TINY)
        w.update(DT, 5, backend=backend, extra_force=_uniform_field)
        results[backend] = np.asarray(w.particles.pos)
    got = results["jnp"]
    # hook acted: the whole system drifted down by ~a*dt^2*k(k+1)/2 on top
    # of gravity (center-of-mass shift is exact under a uniform field)
    shift = -9.8 * DT * DT * 5 * 6 / 2
    com_delta = got[:, 1].mean() - base[:, 1].mean()
    # fp32 positions are O(600): per-element rounding ~4e-5 absolute
    assert com_delta == pytest.approx(shift, abs=3e-4)
    scale = np.abs(got).max()
    np.testing.assert_allclose(results["pallas"] / scale, got / scale,
                               atol=2e-5)
    np.testing.assert_allclose(results["p3m"] / scale, got / scale,
                               atol=3e-3)  # p3m: near-exact mesh handoff


def test_applies_to_massless_and_respects_padding():
    """Tracers feel the field; padding rows stay exactly zero."""
    scene = nb.make_galaxies(250, 1, seed=3)
    w = nb.create_world(scene, config=TINY)
    w.update(DT, 3, backend="jnp", extra_force=_uniform_field)
    pad = np.asarray(w.state.pos)[w.total_len:]
    assert np.all(pad == 0.0)

    # all-massless world: zero self-gravity isolates the hook — every
    # tracer's vy is exactly the accumulated field
    p = make_particles(np.random.default_rng(0)
                       .uniform(-5, 5, (16, 2)).astype(np.float32))
    wt = nb.create_world(p, config=TINY)
    wt.update(DT, 3, backend="jnp", extra_force=_uniform_field)
    np.testing.assert_allclose(np.asarray(wt.particles.vel)[:, 1],
                               -9.8 * DT * 3, rtol=1e-5)


def test_leapfrog_with_position_hook():
    """A position-only (conservative) hook under the symplectic integrator:
    harmonic trap, energy bounded over many periods."""
    def trap(pos, vel):
        return -4.0 * pos

    cfg = SimConfig(tile_targets=TINY.tile_targets,
                    tile_sources=TINY.tile_sources, integrator="leapfrog")
    w = _tracer_world(vel=(0.0, 1.0), config=cfg)
    e0 = 0.5 * 1.0**2  # unit "mass" energy: v^2/2 + 2*x^2
    w.update(DT, 2000, backend="jnp", extra_force=trap)
    x, v = np.asarray(w.particles.pos)[0], np.asarray(w.particles.vel)[0]
    e = 0.5 * float(v @ v) + 2.0 * float(x @ x)
    assert e == pytest.approx(e0, rel=2e-3)  # symplectic: bounded, no drift


def test_rollout_hook_matches_world():
    """autodiff.rollout(extra_force=...) is the differentiable counterpart
    of World.update(extra_force=...): identical primal trajectories."""
    from nbody_tpu.autodiff import rollout

    scene = nb.make_galaxies(250, 1, seed=3)
    w = nb.create_world(scene, config=TINY)
    w.update(DT, 5, backend="jnp", extra_force=_uniform_field)

    st = w  # rollout wants massive-first raw arrays; the world state is
    p0 = nb.create_world(scene, config=TINY).state
    pos, vel = rollout(
        p0.pos[:250], p0.vel[:250], p0.mass[:250], p0.radius[:250],
        jnp.float32(DT), n_steps=5, mass_len=w.mass_len, precise=False,
        extra_force=_uniform_field)
    np.testing.assert_allclose(np.asarray(pos),
                               np.asarray(st.particles.pos),
                               rtol=2e-4, atol=2e-3)


def test_rollout_grad_reaches_control_params():
    """Gradients flow into extra_force_params — the control-optimization
    path (thrust schedules etc.). Closed form: under semi-implicit Euler
    with constant acceleration theta, d(x_n)/d(theta) = dt^2 * n(n+1)/2."""
    import jax
    from nbody_tpu.autodiff import rollout

    p = make_particles(np.zeros((1, 2), np.float32))
    n = 7

    def thrust(pos, vel, theta):
        return jnp.broadcast_to(theta, pos.shape)

    def final_x(theta):
        pos, _ = rollout(p.pos, p.vel, p.mass, p.radius, jnp.float32(DT),
                         n_steps=n, mass_len=0, precise=False,
                         extra_force=thrust, extra_force_params=theta)
        return pos[0, 0]

    g = jax.grad(final_x)(jnp.asarray([0.3, 0.0], jnp.float32))
    expect = DT * DT * n * (n + 1) / 2
    assert float(g[0]) == pytest.approx(expect, rel=1e-5)
    assert float(g[1]) == 0.0


@pytest.mark.parametrize("force_backend", ["jnp", "pallas_ring", "pm", "p3m"])
def test_sharded_hook_matches_single_chip(force_backend):
    """ShardedWorld.update(extra_force=...) composes the field per shard;
    the 8-device result must match the single-chip world under the same
    hook (pallas_ring computes the hooked force through the per-hop
    kernel — the fused kernel cannot take an external term)."""
    from nbody_tpu.parallel import ShardedWorld, make_mesh

    scene = nb.make_galaxies(256, 1, seed=9)
    single = nb.create_world(scene, config=TINY)
    single_backend = {"pallas_ring": "pallas"}.get(force_backend,
                                                   force_backend)
    single.update(DT, 4, backend=single_backend, extra_force=_uniform_field)

    sw = ShardedWorld(scene, make_mesh(), config=TINY,
                      force_backend=force_backend)
    assert sw.n_devices == 8
    sw.update(DT, 4, extra_force=_uniform_field)

    ref = np.asarray(single.particles.pos)
    got = np.asarray(sw.particles.pos)
    scale = np.abs(ref).max()
    tol = 3e-3 if force_backend in ("pm", "p3m") else 3e-5
    np.testing.assert_allclose(got / scale, ref / scale, atol=tol)
    # unhooked update still uses the prebuilt fused path afterwards
    sw.update(DT, 1)
    assert np.isfinite(np.asarray(sw.particles.pos)).all()


def test_wrong_shape_hook_raises():
    # acc + hook_output would broadcast a (N, 1) or scalar return silently,
    # corrupting physics with no error — the trace-time shape check in
    # forces.checked_extra_acc must reject it on every entry path.
    w = _tracer_world()
    with pytest.raises(ValueError, match="extra_force must return"):
        w.update(DT, extra_force=lambda p, v: p[:, :1])
    with pytest.raises(ValueError, match="extra_force must return"):
        w.update(DT, extra_force=lambda p, v: 5.0)
    # sharded path
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
    sw = ShardedWorld(nb.make_galaxies(256, 1, seed=9), make_mesh(),
                      config=TINY)
    with pytest.raises(ValueError, match="extra_force must return"):
        sw.update(DT, extra_force=lambda p, v: jnp.zeros(()))
    # rollout path
    from nbody_tpu import autodiff
    p = nb.make_galaxies(200, 1, seed=1)
    ml = int(np.count_nonzero(np.asarray(p.mass) > 0))
    with pytest.raises(ValueError, match="extra_force must return"):
        autodiff.rollout(p.pos, p.vel, p.mass, p.radius, DT, n_steps=1,
                         mass_len=ml, extra_force=lambda p_, v_: v_[:, 0])


def test_sharded_rollout_hook_and_param_grads():
    """rollout_sharded(extra_force=..., extra_force_params=...) matches the
    single-chip rollout's values and its closed-form control gradient —
    sharded differentiable control."""
    import jax
    from nbody_tpu.autodiff import rollout, rollout_sharded
    from nbody_tpu.parallel.sharding import make_mesh

    scene = nb.make_galaxies(256, 1, seed=11)
    ml = int(np.count_nonzero(np.asarray(scene.mass) > 0))
    mesh = make_mesh(4)

    def drag(pos, vel, k):
        return -k * vel

    k0 = jnp.float32(0.07)
    ref = rollout(scene.pos, scene.vel, scene.mass, scene.radius,
                  jnp.float32(DT), n_steps=5, mass_len=ml, precise=False,
                  extra_force=drag, extra_force_params=k0)
    got = rollout_sharded(scene.pos, scene.vel, scene.mass, scene.radius,
                          jnp.float32(DT), n_steps=5, mass_len=ml,
                          mesh=mesh, precise=False,
                          extra_force=drag, extra_force_params=k0)
    scale = float(np.abs(np.asarray(ref[0])).max())
    np.testing.assert_allclose(np.asarray(got[0]) / scale,
                               np.asarray(ref[0]) / scale, atol=3e-5)

    # closed-form control gradient (force-free single tracer + thrust):
    # d(x_n)/d(theta) = dt^2 * n(n+1)/2 under semi-implicit Euler
    p = make_particles(np.zeros((1, 2), np.float32))
    n = 7

    def thrust(pos, vel, theta):
        return jnp.broadcast_to(theta, pos.shape)

    def final_x(theta):
        pos, _ = rollout_sharded(
            p.pos, p.vel, p.mass, p.radius, jnp.float32(DT), n_steps=n,
            mass_len=0, mesh=mesh, precise=False,
            extra_force=thrust, extra_force_params=theta)
        return pos[0, 0]

    g = jax.grad(final_x)(jnp.asarray([0.3, 0.0], jnp.float32))
    expect = DT * DT * n * (n + 1) / 2
    assert float(g[0]) == pytest.approx(expect, rel=1e-4)
    assert float(g[1]) == 0.0


def test_capture_with_hook_matches_update():
    """Trajectory capture honors extra_force: the captured final frame must
    equal the same substeps run through update with the same hook —
    single-chip AND sharded."""
    from nbody_tpu.trajectory import record_trajectory
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    scene = nb.make_galaxies(256, 1, seed=21)

    a = nb.create_world(scene, config=TINY)
    traj = record_trajectory(a, DT, frames=3, steps_per_frame=2,
                             backend="jnp", extra_force=_uniform_field)
    b = nb.create_world(scene, config=TINY)
    b.update(DT, 6, backend="jnp", extra_force=_uniform_field)
    np.testing.assert_allclose(traj[-1], np.asarray(b.particles.pos),
                               atol=1e-5)

    sa = ShardedWorld(scene, make_mesh(4), config=TINY, force_backend="jnp")
    straj = sa.record(DT, frames=3, steps_per_frame=2,
                      extra_force=_uniform_field)
    sb = ShardedWorld(scene, make_mesh(4), config=TINY, force_backend="jnp")
    sb.update(DT, 6, extra_force=_uniform_field)
    np.testing.assert_allclose(straj[-1], np.asarray(sb.particles.pos),
                               atol=1e-5)
    # hook actually acted: differs from the unhooked capture
    c = nb.create_world(scene, config=TINY)
    plain = record_trajectory(c, DT, frames=3, steps_per_frame=2,
                              backend="jnp")
    assert np.abs(plain[-1] - traj[-1]).max() > 1e-3
