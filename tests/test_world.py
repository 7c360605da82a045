"""World API tests: partition, padding, backend parity & switching, substep
batching semantics (reference world.c / nbody.h behaviors)."""

import jax
import numpy as np
from helpers import TINY, random_particles
import pytest

from nbody_tpu import create_world, make_galaxies, make_particles
from nbody_tpu import partition_massive_first
from nbody_tpu.types import SimConfig


# --- partition (reference world.c:33-46; test_particle_sort.c cases) ---

@pytest.mark.parametrize(
    "masses,expected_len",
    [
        ([], 0),
        ([0.0], 0),
        ([1.0], 1),
        ([0.0, 0.0, 0.0], 0),
        ([1.0, 2.0, 3.0], 3),
        ([0.0, 1.0, 0.0, 2.0], 2),
        ([1.0, 0.0, 2.0, 0.0, 3.0], 3),
        ([0.0, 0.0, 5.0], 1),
    ],
)
def test_partition_massive_first(masses, expected_len):
    order, mass_len = partition_massive_first(np.array(masses, np.float32))
    assert mass_len == expected_len
    sorted_mass = np.array(masses)[order]
    assert np.all(sorted_mass[:mass_len] > 0)
    assert np.all(sorted_mass[mass_len:] <= 0)
    # permutation is a bijection
    assert sorted(order.tolist()) == list(range(len(masses)))


def test_partition_is_stable():
    order, _ = partition_massive_first(np.array([1.0, 0.0, 2.0, 0.0, 3.0]))
    assert order.tolist() == [0, 2, 4, 1, 3]


# --- world creation ---

def test_world_partitions_and_pads():
    p = random_particles(37)
    w = create_world(p, config=TINY)
    assert w.total_len == 37
    assert w.n_pad % 8 == 0 and w.n_pad >= max(37, w.src_len)
    assert w.src_len % 128 == 0
    host = w.particles
    assert host.pos.shape == (37, 2)
    m = np.asarray(host.mass)
    assert np.all(m[: w.mass_len] > 0)
    assert np.all(m[w.mass_len:] == 0)
    # padding rows are inert
    gm = np.asarray(w.gm)
    assert np.all(gm[w.mass_len:] == 0)


def test_world_preserves_multiset_of_particles():
    p = random_particles(20, seed=5)
    w = create_world(p, config=TINY)
    got = np.sort(np.asarray(w.particles.mass))
    want = np.sort(np.asarray(p.mass))
    np.testing.assert_array_equal(got, want)


def test_update_zero_steps_is_identity():
    w = create_world(random_particles(16), config=TINY)
    before = np.asarray(w.particles.pos).copy()
    w.update(0.01, 0)
    np.testing.assert_array_equal(np.asarray(w.particles.pos), before)


def test_n_substeps_equals_repeated_single_steps():
    # Quirk #7: update(dt, n) == n * update(dt, 1), exactly.
    p = random_particles(24, seed=7)
    w1 = create_world(p, config=TINY)
    w2 = create_world(p, config=TINY)
    w1.update(0.01, 5, backend="jnp")
    for _ in range(5):
        w2.update(0.01, 1, backend="jnp")
    np.testing.assert_array_equal(np.asarray(w1.particles.pos), np.asarray(w2.particles.pos))
    np.testing.assert_array_equal(np.asarray(w1.particles.vel), np.asarray(w2.particles.vel))


def test_backend_parity_jnp_vs_pallas():
    p = random_particles(40, seed=11)
    w1 = create_world(p, config=TINY)
    w2 = create_world(p, config=TINY)
    w1.update(0.01, 10, backend="jnp")
    w2.update(0.01, 10, backend="pallas")
    np.testing.assert_allclose(
        np.asarray(w1.particles.pos), np.asarray(w2.particles.pos), rtol=2e-4, atol=2e-3
    )


def test_backend_switching_is_seamless():
    # Quirk #6: alternate backends mid-run; state must stay consistent
    # (reference TAB switch, main.c:112-116).
    p = random_particles(24, seed=13)
    w_mix = create_world(p, config=TINY)
    w_jnp = create_world(p, config=TINY)
    for k in range(6):
        w_mix.update(0.01, 1, backend="jnp" if k % 2 else "pallas")
        w_jnp.update(0.01, 1, backend="jnp")
    np.testing.assert_allclose(
        np.asarray(w_mix.particles.pos), np.asarray(w_jnp.particles.pos), rtol=2e-4, atol=2e-3
    )


def test_massless_particles_move_but_exert_nothing():
    # Quirk #3: a massless tracer near a massive body accelerates; the massive
    # body ignores the tracer entirely.
    p = make_particles(
        np.array([[0.0, 0.0], [10.0, 0.0]], np.float32),
        mass=np.array([1000.0, 0.0], np.float32),
        radius=np.array([2.0, 0.5], np.float32),
    )
    w = create_world(p, config=TINY)
    w.update(0.01, 1, backend="jnp")
    host = w.particles
    massive = np.asarray(host.mass) > 0
    # massive body: only source is itself -> zero acc
    np.testing.assert_array_equal(np.asarray(host.acc)[massive], 0.0)
    # tracer: pulled toward the massive body (negative x direction)
    assert np.asarray(host.acc)[~massive][0, 0] < 0


def test_get_particles_fresh_after_each_update():
    w = create_world(random_particles(16, seed=3), config=TINY)
    p0 = np.asarray(w.particles.pos).copy()
    w.update(0.05, 2)
    p1 = np.asarray(w.particles.pos)
    assert not np.array_equal(p0, p1)


def test_default_backend_heuristic():
    # measured (round 2): the fused Pallas kernel runs within ~1-5% of the
    # XLA-fused jnp path but never ahead in same-run comparisons
    # (docs/BENCHMARKS.md), so jnp stays the default at every size
    from nbody_tpu.world import default_backend_for

    assert default_backend_for(600) == "jnp"
    assert default_backend_for(2_000_000) == "jnp"
    # World uses the heuristic and honors explicit overrides
    small = create_world(random_particles(600), config=TINY)
    assert small.default_backend == "jnp"
    forced = create_world(random_particles(600), config=TINY, default_backend="pallas")
    assert forced.default_backend == "pallas"


def test_world_with_galaxy_scene_smoke():
    p = make_galaxies(300, 2, seed=11037)
    w = create_world(p, config=TINY)
    w.update(0.01, 3, backend="jnp")
    host = w.particles
    assert np.all(np.isfinite(np.asarray(host.pos)))
    assert np.all(np.isfinite(np.asarray(host.vel)))


def test_pallas_fused_backend_parity():
    """Single-kernel fused substep (force+integrate in one launch) matches
    the standard pallas path."""
    p = random_particles(40, seed=51)
    w1 = create_world(p, config=TINY)
    w2 = create_world(p, config=TINY)
    w1.update(0.01, 5, backend="pallas")
    w2.update(0.01, 5, backend="pallas_fused")
    np.testing.assert_allclose(
        np.asarray(w1.particles.pos), np.asarray(w2.particles.pos),
        rtol=2e-4, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(w1.particles.acc), np.asarray(w2.particles.acc),
        rtol=2e-4, atol=2e-3,
    )


def test_device_world_creation_no_host_roundtrip():
    """Creating a world from a device-generated scene must not bounce the
    arrays through the host (world.c:33-46 is creation-time there too; here
    the partition/pad runs jitted on device). Only the O(1) mass_len scalar
    may cross to the host — fetched explicitly via device_get."""
    from nbody_tpu.models import make_galaxies_device

    scene = make_galaxies_device(jax.random.PRNGKey(7), 1024, 2)
    jax.block_until_ready(scene)
    # guard device->host only: constant uploads (h2d) are fine, the
    # creation path must not fetch arrays back; the one O(1) scalar
    # fetch uses explicit device_get, which "disallow" permits
    with jax.transfer_guard_device_to_host("disallow"):
        w = create_world(scene)
        w.update(0.01, 2)
        jax.block_until_ready(w.state)
    assert w.mass_len > 0
    p = w.particles  # explicit host export stays allowed outside the guard
    assert np.all(np.isfinite(p.pos))


def test_device_creation_matches_host_creation():
    # same scene via numpy vs device arrays -> identical world state
    scene = make_galaxies(600, 2, seed=5)
    host_scene = jax.tree.map(np.asarray, scene)
    w_dev = create_world(scene)
    w_host = create_world(host_scene)
    assert w_dev.mass_len == w_host.mass_len
    np.testing.assert_array_equal(np.asarray(w_dev.state.pos),
                                  np.asarray(w_host.state.pos))
    np.testing.assert_array_equal(np.asarray(w_dev.gm), np.asarray(w_host.gm))


# --- "auto" backend: the scale mux (reference main.c:55 analogue) ---

@pytest.mark.smoke
def test_auto_backend_resolves_by_scale(monkeypatch):
    """'auto' picks exact direct sum at small N and p3m above the measured
    pair-count crossover; resolution happens at world creation AND on
    explicit update(backend='auto')."""
    from nbody_tpu import world as world_mod

    scene = make_galaxies(1024, 1, seed=11)
    w = create_world(scene, default_backend="auto")
    assert w.default_backend == "jnp"  # 1024*512 pairs << crossover
    w.update(0.01, 2)

    # Lower the crossover under this scene: same inputs now resolve to p3m.
    monkeypatch.setattr(world_mod, "AUTO_P3M_MIN_PAIRS", 1000)
    cfg = SimConfig(pm_grid=64)
    w2 = create_world(scene, config=cfg, default_backend="auto")
    assert w2.default_backend == "p3m"
    w2.update(0.01, 2)
    assert np.isfinite(w2.particles.pos).all()

    # update(backend="auto") re-resolves against the live threshold.
    w3 = create_world(scene, config=cfg, default_backend="jnp")
    w3.update(0.01, 1, backend="auto")
    assert np.isfinite(w3.particles.pos).all()


def test_auto_backend_sharded(monkeypatch):
    """ShardedWorld resolves 'auto' on the PER-CHIP pair count: direct-sum
    work splits evenly over the ring while the grid backends' mesh cost
    replicates per device, so a D-mesh switches to p3m D× later in N²."""
    from nbody_tpu import world as world_mod
    from nbody_tpu.parallel import ShardedWorld, make_mesh

    scene = make_galaxies(2048, 2, seed=3)
    mesh = make_mesh()
    d = mesh.devices.size
    sw = ShardedWorld(scene, mesh, force_backend="auto")
    assert sw.force_backend == "jnp"

    w_probe = create_world(scene)
    global_pairs = w_probe.total_len * w_probe.mass_len

    # Threshold below the per-chip pair count: both single and sharded
    # resolve to p3m.
    monkeypatch.setattr(world_mod, "AUTO_P3M_MIN_PAIRS", 1000)
    cfg = SimConfig(pm_grid=64)
    sw2 = ShardedWorld(scene, mesh, config=cfg, force_backend="auto")
    assert sw2.force_backend == "p3m"
    sw2.update(0.01, 2)
    assert np.isfinite(sw2.particles.pos).all()

    # Threshold between per-chip and global pair counts: a single chip
    # would switch to p3m, but each of the D chips still has less direct
    # work than the crossover — the mesh stays on direct sum.
    assert d > 1
    monkeypatch.setattr(world_mod, "AUTO_P3M_MIN_PAIRS", global_pairs // 2)
    assert create_world(scene, default_backend="auto").default_backend == "p3m"
    sw3 = ShardedWorld(scene, mesh, force_backend="auto")
    assert sw3.force_backend == "jnp"


def test_reference_api_update_aliases():
    """UpdateWorld_CPU / UpdateWorld_GPU (nbody.h:69-73) map to fixed
    backends: update_cpu = the jnp oracle, update_gpu = the Pallas kernel.
    Both advance the same trajectory within cross-backend tolerance."""
    scene = make_galaxies(300, 1, seed=9)
    wa, wb = create_world(scene), create_world(scene)
    wa.update_cpu(0.01, 8)
    wb.update_gpu(0.01, 8)
    pa, pb = np.asarray(wa.particles.pos), np.asarray(wb.particles.pos)
    assert np.isfinite(pa).all() and np.isfinite(pb).all()
    scale = np.abs(pa).max()
    np.testing.assert_allclose(pa / scale, pb / scale, atol=1e-5)


def test_resolve_backend_function():
    """The 'auto' mux is a pure function of the pair count; concrete
    backends pass through untouched."""
    from nbody_tpu.world import AUTO_P3M_MIN_PAIRS, resolve_backend

    for b in ("jnp", "pallas", "pm", "p3m"):
        assert resolve_backend(b, 10**9, 10**9) == b
    assert resolve_backend("auto", 1000, 500) == "jnp"
    n = int(np.sqrt(AUTO_P3M_MIN_PAIRS)) * 2
    assert resolve_backend("auto", n, n) == "p3m"
