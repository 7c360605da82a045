"""Parity vs the native C++ AVX oracle (SURVEY.md §4b: backend parity between
jnp, Pallas, and a host-native SIMD implementation on identical inputs)."""

import numpy as np
from helpers import PRECISE, TINY
import pytest

from nbody_tpu import create_world, make_galaxies
from nbody_tpu.types import SimConfig
from nbody_tpu.utils import cpp_oracle

pytestmark = pytest.mark.skipif(
    not cpp_oracle.available(), reason="cpp oracle not buildable"
)


def ordered_scene(n, g=2, seed=11037):
    """Scene in massive-first order, as the oracle requires."""
    scene = make_galaxies(n, g, seed=seed)
    w = create_world(scene, config=TINY)
    host = w.particles
    return host, w.mass_len


def test_avx_vs_scalar_oracle_agree():
    host, mass_len = ordered_scene(300)
    a = cpp_oracle.oracle_update(host, mass_len, 0.01, 10)
    b = cpp_oracle.oracle_update(host, mass_len, 0.01, 10, scalar=True)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_oracle_vs_tpu_framework_short(backend):
    host, mass_len = ordered_scene(300)
    want = cpp_oracle.oracle_update(host, mass_len, 0.01, 20)

    w = create_world(host, config=PRECISE)
    assert w.mass_len == mass_len
    w.update(0.01, 20, backend=backend)
    got = w.particles
    # identical order (host already partitioned; stable argsort is a no-op)
    np.testing.assert_array_equal(np.asarray(got.mass), np.asarray(want.mass))
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(want.pos),
                               rtol=5e-4, atol=5e-2)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(want.vel),
                               rtol=5e-4, atol=5e-2)


def test_oracle_vs_framework_long_horizon():
    """Long-horizon agreement on bounded scale. The system is chaotic, so two
    correct fp32 implementations with different summation orders diverge
    exponentially (measured Lyapunov-driven drift ~1e-2 of system scale after
    1000 steps); parity is therefore asserted as bounded relative drift here
    and as invariant agreement over 10k steps below."""
    host, mass_len = ordered_scene(200, g=1, seed=3)
    want = cpp_oracle.oracle_update(host, mass_len, 0.005, 1000)
    w = create_world(host, config=PRECISE)
    w.update(0.005, 1000, backend="jnp")
    got = w.particles
    scale = np.abs(np.asarray(want.pos)).max()
    err = np.abs(np.asarray(got.pos) - np.asarray(want.pos)).max()
    assert err / scale < 3e-2, f"relative drift {err/scale:.2e}"


def test_oracle_vs_framework_10k_steps_invariants():
    """BASELINE '10k steps within fp32 tolerance': past the Lyapunov horizon,
    trajectory closeness is information-free, so the 10k-step check compares
    the physically meaningful statistics: total momentum, center-of-mass
    drift, and bound-system extent agree between oracle and framework."""
    host, mass_len = ordered_scene(150, g=1, seed=13)
    want = cpp_oracle.oracle_update(host, mass_len, 0.005, 10_000)
    w = create_world(host, config=PRECISE)
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
    np.testing.assert_allclose(ext_a, ext_b, rtol=0.05)


def test_oracle_massless_rule():
    host, mass_len = ordered_scene(250, g=1, seed=9)
    out = cpp_oracle.oracle_update(host, mass_len, 0.01, 1)
    m = np.asarray(out.mass)
    acc = np.asarray(out.acc)
    # massless rows beyond mass_len moved (acc finite, generally nonzero)
    assert np.all(np.isfinite(acc))
    # and a massless-only source set exerts nothing: rerun with mass_len=0
    out0 = cpp_oracle.oracle_update(host, 0, 0.01, 1)
    np.testing.assert_array_equal(np.asarray(out0.acc), 0.0)


def test_oracle_vs_reference_binary_goldens():
    """The oracle itself measured against the REFERENCE'S OWN binary (the
    committed ref_traj goldens, scripts/make_ref_goldens.sh): from the
    bit-exact IC it reproduces the reference's 20-step state at the
    reference's own AVX-vs-scalar noise floor (measured 6.3e-08 relative
    position — not bit-exact: the oracle pre-multiplies G·m, a deliberate
    structural difference; sim_cpu.c multiplies in the loop), and stays
    within the self-noise tail at 100 steps (1.2e-4 vs 1.4e-4). This pins
    the oracle's fidelity independently of the framework."""
    from helpers import load_hex_dump
    from nbody_tpu.models import make_galaxies_libc
    from nbody_tpu.models.galaxy_ref import available as libm_available
    from nbody_tpu.types import Particles
    from nbody_tpu.world import partition_massive_first
    import os

    if not libm_available():
        pytest.skip("bit-exact IC needs the platform libm via ctypes")
    ic = make_galaxies_libc(2000, 2, seed=11037)
    perm, mass_len = partition_massive_first(np.asarray(ic.mass))
    part = Particles(
        pos=np.asarray(ic.pos)[perm], vel=np.asarray(ic.vel)[perm],
        acc=np.asarray(ic.acc)[perm], mass=np.asarray(ic.mass)[perm],
        radius=np.asarray(ic.radius)[perm])
    data = os.path.join(os.path.dirname(__file__), "data")
    for steps, ptol in ((20, 5e-7), (100, 3e-4)):
        got = cpp_oracle.oracle_update(part, mass_len, 0.01, steps)
        golden = load_hex_dump(os.path.join(
            data, f"ref_traj_n2000_g2_seed11037_s{steps}_dt0.01.hex"))[perm]
        rel = (np.abs(np.asarray(got.pos) - golden[:, :2]).max()
               / np.abs(golden[:, :2]).max())
        assert rel < ptol, f"{steps} steps: rel pos {rel:.2e}"
