"""Edge cases: empty/one-particle worlds, all-massless, sharded checkpoint
round-trip, zero-radius softening corner."""

import numpy as np
from helpers import TINY

from nbody_tpu import create_world, make_galaxies, make_particles, zeros_particles
from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh
from nbody_tpu.types import SimConfig
from nbody_tpu.utils import load_world, save_world


def test_empty_world():
    w = create_world(zeros_particles(0), config=TINY)
    assert w.total_len == 0 and w.mass_len == 0
    w.update(0.01, 3, backend="jnp")
    assert w.particles.pos.shape == (0, 2)


def test_single_tracer_world():
    p = make_particles(np.array([[1.0, 2.0]], np.float32),
                       vel=np.array([[3.0, -1.0]], np.float32))
    w = create_world(p, config=TINY)
    assert w.mass_len == 0
    w.update(0.5, 2, backend="jnp")
    np.testing.assert_allclose(np.asarray(w.particles.pos), [[4.0, 1.0]], rtol=1e-6)


def test_all_massless_pallas():
    p = make_particles(np.random.default_rng(0).normal(size=(20, 2)).astype(np.float32))
    w = create_world(p, config=TINY)
    w.update(0.1, 2, backend="pallas")
    np.testing.assert_array_equal(np.asarray(w.particles.acc), 0.0)


def test_negative_mass_treated_as_massless():
    # partition predicate is mass > 0 (world.c:33-46 semantics)
    p = make_particles(
        np.zeros((3, 2), np.float32),
        mass=np.array([5.0, -2.0, 0.0], np.float32),
    )
    w = create_world(p, config=TINY)
    assert w.mass_len == 1
    gm = np.asarray(w.gm)
    assert np.count_nonzero(gm) == 1


def test_sharded_world_checkpoint_roundtrip(tmp_path):
    p = make_galaxies(300, 2, seed=21)
    sw = ShardedWorld(p, make_mesh(4), config=TINY, force_backend="jnp")
    sw.update(0.01, 3)
    path = str(tmp_path / "sharded.npz")
    save_world(path, sw, step=3)

    resumed, step = load_world(
        path, world_cls=lambda particles, **kw: ShardedWorld(
            particles, make_mesh(4), config=TINY, force_backend="jnp"
        ),
    )
    assert step == 3
    sw.update(0.01, 2)
    resumed.update(0.01, 2)
    np.testing.assert_allclose(
        np.asarray(resumed.particles.pos), np.asarray(sw.particles.pos), rtol=1e-5
    )


def test_zero_radius_coincident_pairs_contribute_zero():
    # Two coincident massive particles with radius 0. SURVEY §5 quirk 4's
    # zero-contribution guarantee "relies on r² > 0 ... generated scenes
    # guarantee radius >= 0.5" — outside that precondition the reference
    # itself is undefined (0/0 -> NaN on its GPU path). types.SOFTENING_FLOOR
    # enforces the precondition, so the quirk-4 guarantee (coincident pair ->
    # exactly zero force, radv == 0) now holds for degenerate inputs too
    # instead of poisoning the whole state with NaN.
    p = make_particles(
        np.zeros((2, 2), np.float32),
        mass=np.array([1.0, 1.0], np.float32),
        radius=np.array([0.0, 0.0], np.float32),
    )
    w = create_world(p, config=TINY)
    w.update(0.01, 1, backend="jnp")
    np.testing.assert_array_equal(np.asarray(w.particles.acc), 0.0)


def test_all_massless_zero_radius_world_drifts():
    # Regression: source alignment (world.source_pad_len pads mass_len up,
    # min 1) puts tracer rows in the source panel with gm = 0; before the
    # SOFTENING_FLOOR fix the self-pair of such a row with radius 0 produced
    # 0/0 = NaN. A hand-built all-tracer radius-0 world must be pure drift,
    # exactly reversible by negating dt, on every backend.
    rng = np.random.default_rng(5)
    pos = rng.normal(size=(64, 2)).astype(np.float32)
    vel = rng.normal(size=(64, 2)).astype(np.float32)
    p = make_particles(pos, vel=vel, radius=np.zeros(64, np.float32))
    for backend in ("jnp", "pallas", "pm", "p3m"):
        w = create_world(p, config=TINY)
        w.update(0.01, 5, backend=backend)
        w.update(-0.01, 5, backend=backend)
        got = np.asarray(w.particles.pos)
        assert np.isfinite(got).all(), backend
        np.testing.assert_allclose(got, pos, atol=2e-6, err_msg=backend)
        np.testing.assert_array_equal(np.asarray(w.particles.acc), 0.0)


def test_large_dt_stability_is_callers_problem():
    # dt is unconstrained, as in the reference; huge dt diverges but stays
    # computable (no crash)
    w = create_world(make_galaxies(200, 1, seed=2), config=TINY)
    w.update(100.0, 3, backend="jnp")
    assert w.particles.pos.shape == (200, 2)
