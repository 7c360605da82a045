"""Driver-runnable physics validation (VERDICT r1 weak #7/#8).

Pytest versions of scripts/validate_physics.py (whose production-scale runs
back docs/BENCHMARKS.md "Physics validation" table), plus oracle parity for
the SHIPPING default math (precise=False, rsqrt^3) — round 1 only ever
parity-tested precise=True.

Marked slow (they run 10k substeps) but kept in the default suite so the
driver re-verifies the claims every round; deselect with `-m "not slow"`.
"""

import numpy as np
import pytest

from helpers import TINY
from nbody_tpu import create_world, make_galaxies
from nbody_tpu.diagnostics import summary
from nbody_tpu.types import SimConfig
from nbody_tpu.utils import cpp_oracle

DEFAULT_MATH = SimConfig(tile_targets=128, tile_sources=128, precise=False)


def total_energy(world):
    s = summary(world)
    return s["kinetic_energy"] + s["potential_energy"], np.array(s["momentum"])


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_energy_momentum_bounded_over_10k_steps(backend):
    """The symplectic-Euler signature: energy drift stays bounded and
    oscillating (no secular growth) over the BASELINE 10k-step horizon;
    momentum moves only at fp32 round-off scale. CI-sized version of the
    N=16k/65k/262k rows measured on hardware (docs/BENCHMARKS.md).

    Uses ONE galaxy: a CI-sized two-galaxy scene puts the (huge) cores
    through an under-resolved head-on encounter at dt=0.005, which is a
    timestep-choice artifact, not an integrator property (measured: energy
    jumps 50x at N=1024/2 galaxies; the production-scale 2-galaxy runs in
    BENCHMARKS.md stay at ~2e-5). Momentum is conserved only approximately
    by the MODEL itself — the reference's softening uses the target's
    radius (particle_cs.glsl:41), so F_ij != -F_ji for close pairs."""
    scene = make_galaxies(1024, 1, seed=11037)
    world = create_world(scene, config=DEFAULT_MATH, default_backend=backend)
    e0, p0 = total_energy(world)
    pscale = float(np.abs(np.asarray(scene.mass, np.float64)).sum() *
                   max(1.0, np.abs(np.asarray(scene.vel, np.float64)).max()))
    worst_drift = 0.0
    for _ in range(4):
        world.update(0.005, 2500)
        e, p = total_energy(world)
        worst_drift = max(worst_drift, abs(e - e0) / abs(e0))
        assert np.linalg.norm(p - p0) / pscale < 1e-6
    assert np.all(np.isfinite(np.asarray(world.particles.pos)))
    assert worst_drift < 1e-3, f"energy drift {worst_drift:.2e}"


@pytest.mark.skipif(not cpp_oracle.available(), reason="cpp oracle not buildable")
def test_default_math_vs_sqrt_oracle_short():
    """The shipping default (rsqrt^3) against the reference-exact sqrt+divide
    C++ oracle on a short horizon: the ~1.4e-7/op rsqrt deviation must stay
    at fp32-noise level over tens of steps."""
    scene = make_galaxies(300, 2, seed=11037)
    w0 = create_world(scene, config=TINY)
    host, mass_len = w0.particles, w0.mass_len
    want = cpp_oracle.oracle_update(host, mass_len, 0.01, 20)
    w = create_world(host, config=DEFAULT_MATH)
    w.update(0.01, 20, backend="jnp")
    got = w.particles
    scale = np.abs(np.asarray(want.pos)).max()
    err = np.abs(np.asarray(got.pos) - np.asarray(want.pos)).max()
    assert err / scale < 2e-5, f"default-math drift vs oracle {err/scale:.2e}"


@pytest.mark.slow
@pytest.mark.skipif(not cpp_oracle.available(), reason="cpp oracle not buildable")
def test_default_math_vs_oracle_10k_steps_invariants():
    """10k-step invariant agreement between the sqrt oracle and the shipping
    rsqrt^3 default (the precise=True twin lives in test_cpp_oracle.py):
    total momentum, center-of-mass, and bound-system extent."""
    scene = make_galaxies(150, 1, seed=13)
    w0 = create_world(scene, config=TINY)
    host, mass_len = w0.particles, w0.mass_len
    want = cpp_oracle.oracle_update(host, mass_len, 0.005, 10_000)
    w = create_world(host, config=DEFAULT_MATH)
    w.update(0.005, 10_000, backend="jnp")
    got = w.particles

    m = np.asarray(host.mass, np.float64)

    def stats(p):
        vel = np.asarray(p.vel, np.float64)
        pos = np.asarray(p.pos, np.float64)
        mom = (m[:, None] * vel).sum(axis=0)
        com = (m[:, None] * pos).sum(axis=0) / m.sum()
        massive = m > 0
        extent = np.percentile(np.hypot(*(pos[massive] - com).T), 90)
        return mom, com, extent

    mom_a, com_a, ext_a = stats(want)
    mom_b, com_b, ext_b = stats(got)
    scale_p = (m * np.abs(np.asarray(host.vel, np.float64)).max()).sum()
    np.testing.assert_allclose(mom_a, mom_b, atol=1e-3 * scale_p)
    np.testing.assert_allclose(com_a, com_b, atol=1e-2 * ext_a)
    assert abs(ext_a - ext_b) / ext_a < 0.2


@pytest.mark.slow
def test_pm_energy_momentum_bounded_over_10k_steps():
    """PM far-field backend at horizon (round-2 VERDICT next #6): bounded
    energy drift at mesh-discretization scale and momentum at CIC round-off
    scale over the BASELINE 10k-step horizon. Bounds are looser than the
    exact backends' — the mesh solver smooths sub-cell encounters to the
    global softening and the adaptive box re-discretizes as the system
    evolves — but they must stay BOUNDED (no secular growth), which is the
    property this test pins. Production-scale rows (N=65k, grid 512) are
    measured by scripts/validate_physics.py on hardware (BENCHMARKS.md)."""
    scene = make_galaxies(1024, 1, seed=11037)
    cfg = SimConfig(tile_targets=128, pm_grid=128, pm_softening=2.0)
    world = create_world(scene, config=cfg, default_backend="pm")
    e0, p0 = total_energy(world)
    pscale = float(np.abs(np.asarray(scene.mass, np.float64)).sum() *
                   max(1.0, np.abs(np.asarray(scene.vel, np.float64)).max()))
    worst_drift = 0.0
    for _ in range(4):
        world.update(0.005, 2500)
        e, p = total_energy(world)
        worst_drift = max(worst_drift, abs(e - e0) / abs(e0))
        assert np.linalg.norm(p - p0) / pscale < 2e-4
    assert np.all(np.isfinite(np.asarray(world.particles.pos)))
    assert worst_drift < 5e-3, f"pm energy drift {worst_drift:.2e}"


@pytest.mark.slow
@pytest.mark.parametrize("force_backend,drift_tol,mom_tol", [
    ("jnp", 1e-3, 1e-6),     # ppermute ring of exact partial sums
    ("p3m", 5e-3, 2e-4),     # collective PM far field + ring PP correction
])
def test_sharded_energy_momentum_bounded_over_10k_steps(
        force_backend, drift_tol, mom_tol):
    """Long-horizon invariants on the SHARDED path (round-3 VERDICT weak #7):
    the single-chip 10k-substep validation above only certified that one
    sharded *step* is correct; this runs the full BASELINE horizon on the
    8-virtual-device CPU mesh so sharded *integration* stability (ring
    all-gather force + collective p3m) is asserted every round.

    Same scene/bounds rationale as the single-chip test; p3m bounds are the
    mesh-backend ones (PM far field smooths sub-cell encounters, CIC scatter
    breaks exact F_ij = -F_ji beyond the reference's own target-radius
    asymmetry, particle_cs.glsl:41)."""
    from nbody_tpu.parallel.sharding import ShardedWorld, make_mesh

    if force_backend == "p3m":
        # CI-sized: the collective p3m substep costs ~60 ms on the virtual
        # mesh (FFT + PP halo per substep), so the horizon run uses the
        # smallest config that still exercises CIC/FFT/PP + ring collectives.
        scene = make_galaxies(512, 1, seed=11037)
        cfg = SimConfig(tile_targets=64, tile_sources=128, precise=False,
                        pm_grid=64, p3m_cell_capacity=32)
    else:
        scene = make_galaxies(1024, 1, seed=11037)
        cfg = DEFAULT_MATH
    sw = ShardedWorld(scene, make_mesh(8), config=cfg,
                      force_backend=force_backend)
    e0, p0 = total_energy(sw)
    pscale = float(np.abs(np.asarray(scene.mass, np.float64)).sum() *
                   max(1.0, np.abs(np.asarray(scene.vel, np.float64)).max()))
    worst_drift = 0.0
    for _ in range(4):
        sw.update(0.005, 2500)
        e, p = total_energy(sw)
        worst_drift = max(worst_drift, abs(e - e0) / abs(e0))
        assert np.linalg.norm(p - p0) / pscale < mom_tol
    assert np.all(np.isfinite(np.asarray(sw.particles.pos)))
    assert worst_drift < drift_tol, \
        f"sharded {force_backend} energy drift {worst_drift:.2e}"


@pytest.mark.slow
@pytest.mark.parametrize("integrator", ["leapfrog", "yoshida4"])
def test_symplectic_integrators_bounded_over_10k_steps(integrator):
    """Both symplectic compositions keep energy drift bounded (no secular
    growth) at the BASELINE 10k-step horizon on the production dt.

    Note this deliberately does NOT assert yoshida4 < leapfrog here: at
    dt=0.005 on this softened scene both sit at the fp32 round-off floor,
    where yoshida4's 3 force evals/step accumulate slightly MORE round-off
    (measured: 2.4e-4 vs 1.7e-4). The truncation-error ordering is real and
    is asserted where it is observable — at coarse dt in
    test_integrators.test_yoshida4_energy_drift_lower_than_leapfrog and the
    convergence-order test."""
    import dataclasses

    cfg = dataclasses.replace(DEFAULT_MATH, integrator=integrator)
    world = create_world(make_galaxies(1024, 1, seed=11037), config=cfg)
    e0, _ = total_energy(world)
    worst = 0.0
    for _ in range(4):
        world.update(0.005, 2500)
        e, _ = total_energy(world)
        worst = max(worst, abs(e - e0) / abs(e0))
    assert np.all(np.isfinite(np.asarray(world.particles.pos)))
    assert worst < 1e-3, worst


# ---------------------------------------------------------------------------
# The BASELINE north star, literally: trajectory parity against the
# REFERENCE'S OWN compiled binary (not our C++ re-implementation).
#
# ICs are bit-exact (models/galaxy_ref.make_galaxies_libc reproduces
# MakeGalaxies to the last bit, tests/test_libc_scene.py); the goldens are
# dumps of the reference's real PackParticles/PackedUpdate substep loop
# (world.c:99-110, sim_cpu.c:156-194) on the bench scene (seed 11037, 2
# galaxies — bench.c:42,53), produced by scripts/make_ref_goldens.sh from
# /root/reference compiled in place.
#
# Tolerances are CALIBRATED against the reference's own fp32 noise: the AVX
# and scalar builds of the same reference code differ only in summation
# order, and at 20 steps already disagree by up to 6.3e-8 relative position
# (tail 1.4e-4 at 100 steps; at 10k steps they disagree on kinetic energy by
# 4.9x — symplectic Euler through close encounters is chaotic, so past the
# Lyapunov horizon pointwise closeness is information-free and parity is
# asserted on robust aggregates vs the self-noise measured from the two
# committed reference builds).
# ---------------------------------------------------------------------------

import os as _os

from helpers import PRECISE, load_hex_dump
from nbody_tpu.models import make_galaxies_libc
from nbody_tpu.models.galaxy_ref import available as _libm_available
from nbody_tpu.world import partition_massive_first

_DATA = _os.path.join(_os.path.dirname(__file__), "data")
_REF_TRAJ = "ref_traj_n2000_g2_seed11037_s{steps}_dt0.01.hex"

# The bit-exact IC needs the platform libm (a 1-ulp transcendental
# difference flips a rejection-sampling branch and shifts the whole rand()
# stream) — skip like every other oracle-based module, don't fail.
_needs_libm = pytest.mark.skipif(
    not _libm_available(), reason="oracle needs the platform libm via ctypes")


def _bitexact_world_and_golden(steps, flavor=""):
    """(world from the bit-exact IC, golden rows permuted to world order)."""
    ic = make_galaxies_libc(2000, 2, seed=11037)
    perm, _ = partition_massive_first(np.asarray(ic.mass))
    name = _REF_TRAJ.format(steps=steps)
    if flavor:
        name = name.replace("ref_traj_", f"ref_traj_{flavor}_")
    golden = load_hex_dump(_os.path.join(_DATA, name))[perm]
    return create_world(ic, config=PRECISE), golden


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
@_needs_libm
def test_reference_binary_pointwise_20_steps(backend):
    """Pointwise parity at 20 substeps — inside the Lyapunov horizon, where
    the reference agrees with ITSELF (AVX vs scalar) to 6.3e-8 relative
    position / 4.5e-7 velocity. The framework must sit at that same noise
    floor (measured: 6.3e-8 / 4.5e-7); tolerance is ~8x headroom."""
    w, golden = _bitexact_world_and_golden(20)
    w.update(0.01, 20, backend=backend)
    got = w.particles
    np.testing.assert_array_equal(np.asarray(got.mass), golden[:, 4])
    np.testing.assert_array_equal(np.asarray(got.radius), golden[:, 5])
    pos_scale = np.abs(golden[:, :2]).max()
    vel_scale = np.abs(golden[:, 2:4]).max()
    dpos = np.abs(np.asarray(got.pos) - golden[:, :2]).max() / pos_scale
    dvel = np.abs(np.asarray(got.vel) - golden[:, 2:4]).max() / vel_scale
    assert dpos < 5e-7, f"rel pos error vs reference binary {dpos:.2e}"
    assert dvel < 5e-6, f"rel vel error vs reference binary {dvel:.2e}"


@_needs_libm
def test_reference_binary_pointwise_100_steps():
    """100 substeps: the reference's own AVX-vs-scalar spread reaches 1.4e-4
    relative position / 2.8e-2 velocity (close-encounter tail); the
    framework's measured distance from the AVX build is 8.6e-6 / 6.9e-3 —
    i.e. CLOSER to the reference than the reference is to itself. Assert
    within the self-noise envelope."""
    w, golden = _bitexact_world_and_golden(100)
    w.update(0.01, 100, backend="jnp")
    got = w.particles
    pos_scale = np.abs(golden[:, :2]).max()
    vel_scale = np.abs(golden[:, 2:4]).max()
    dpos = np.abs(np.asarray(got.pos) - golden[:, :2]).max() / pos_scale
    dvel = np.abs(np.asarray(got.vel) - golden[:, 2:4]).max() / vel_scale
    assert dpos < 1.5e-4, f"rel pos error vs reference binary {dpos:.2e}"
    assert dvel < 3e-2, f"rel vel error vs reference binary {dvel:.2e}"


def _robust_metrics(rows):
    """Aggregates that survive the Lyapunov horizon: center of mass (a true
    integral of motion up to the model's F_ij != -F_ji softening asymmetry),
    total momentum, and radial mass-distribution quantiles."""
    pos = rows[:, :2].astype(np.float64)
    vel = rows[:, 2:4].astype(np.float64)
    m = rows[:, 4].astype(np.float64)
    com = (m[:, None] * pos).sum(0) / m.sum()
    mom = (m[:, None] * vel).sum(0)
    r = np.linalg.norm(pos - com, axis=1)
    return com, mom, np.quantile(r, [0.1, 0.5, 0.9])


@pytest.mark.slow
@_needs_libm
def test_reference_binary_10k_steps():
    """The north star at full horizon: 10,000 substeps from the bit-exact IC
    vs the reference binary's own 10k-step state.

    Past the Lyapunov horizon two CORRECT fp32 builds of the reference
    itself (AVX vs scalar packs — committed as the second golden) disagree
    pointwise by O(1), so parity is asserted the only meaningful way: the
    framework's deviation from the reference on robust aggregates must be
    within 4x the reference's own build-to-build deviation (floors cover
    metrics where the self-noise is accidentally tiny). Measured (jnp,
    precise=True): com 1.3e-3 vs self 7.5e-4 of median radius; momentum
    2.3e-2 vs 2.3e-2; radial quantiles <=9.8e-2 vs <=1.6e-1."""
    w, avx = _bitexact_world_and_golden(10000)
    _, scalar = _bitexact_world_and_golden(10000, flavor="scalar")
    w.update(0.01, 10_000, backend="jnp")
    got = w.particles
    rows = np.concatenate(
        [np.asarray(got.pos), np.asarray(got.vel),
         np.asarray(got.mass)[:, None], np.asarray(got.radius)[:, None]],
        axis=1)
    assert np.isfinite(rows).all()
    np.testing.assert_array_equal(rows[:, 4], avx[:, 4])  # mass bit-exact

    com_a, mom_a, rq_a = _robust_metrics(avx)
    com_s, mom_s, rq_s = _robust_metrics(scalar)
    com_f, mom_f, rq_f = _robust_metrics(rows)

    r_med = rq_a[1]
    mom_scale = np.linalg.norm(mom_a)

    def dev(com, mom, rq):
        return (np.linalg.norm(com - com_a) / r_med,
                np.linalg.norm(mom - mom_a) / mom_scale,
                np.abs(rq - rq_a) / rq_a)

    self_com, self_mom, self_rq = dev(com_s, mom_s, rq_s)
    fw_com, fw_mom, fw_rq = dev(com_f, mom_f, rq_f)

    assert fw_com < 4 * max(self_com, 1e-3), (fw_com, self_com)
    assert fw_mom < 4 * max(self_mom, 1e-2), (fw_mom, self_mom)
    assert np.all(fw_rq < 4 * np.maximum(self_rq, 5e-2)), (fw_rq, self_rq)


@_needs_libm
def test_reference_binary_live_redump(tmp_path):
    """Audit path: recompile the reference from /root/reference in place,
    re-dump a 20-step trajectory at a DIFFERENT seed than the committed
    goldens, and assert pointwise parity — proves the goldens' provenance
    pipeline works end-to-end today, not just when they were committed."""
    from test_libc_scene import _build_ref_scene_dump
    import subprocess

    exe = _build_ref_scene_dump(str(tmp_path))
    if exe is None:
        pytest.skip("gcc or /root/reference unavailable")
    n, g, seed, steps, dt = 800, 2, 424242, 20, 0.01
    out = subprocess.run(
        [exe, str(n), str(g), str(seed), "--steps", str(steps), str(dt)],
        check=True, capture_output=True, text=True, timeout=300).stdout
    rows = [[np.float32(float.fromhex(t)) for t in line.split()]
            for line in out.strip().splitlines()]
    ic = make_galaxies_libc(n, g, seed=seed)
    perm, _ = partition_massive_first(np.asarray(ic.mass))
    golden = np.array(rows, np.float32)[perm]
    w = create_world(ic, config=PRECISE)
    w.update(dt, steps, backend="jnp")
    got = w.particles
    dpos = (np.abs(np.asarray(got.pos) - golden[:, :2]).max()
            / np.abs(golden[:, :2]).max())
    assert dpos < 5e-6, f"rel pos error vs live reference binary {dpos:.2e}"
