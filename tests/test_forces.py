"""Unit tests for the jnp direct-sum oracle: golden values, softening
semantics, massless rules, self-interaction — the physics quirk checklist of
SURVEY.md §5."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import G, direct_sum_acc, pair_acc, acc_from_particles, make_particles
from nbody_tpu.forces import integrate


def ref_acc(tgt_pos, tgt_radius, src_pos, src_gm):
    """Scalar python oracle, transcribed from the shader math
    (particle_cs.glsl:35-49)."""
    out = np.zeros_like(tgt_pos)
    for i in range(len(tgt_pos)):
        acc = np.zeros(2, dtype=np.float64)
        for j in range(len(src_pos)):
            radv = src_pos[j] - tgt_pos[i]
            dist_sq = float(radv @ radv)
            r2 = dist_sq + tgt_radius[i]
            r1 = np.sqrt(r2)
            r3 = r1 * r2
            acc += radv * (src_gm[j] / r3)
        out[i] = acc
    return out


def test_golden_two_body():
    # One source of mass m at distance d on the x-axis; target radius rho.
    # a = G*m*d / (d^2 + rho)^{3/2}
    d, m, rho = 3.0, 7.0, 0.25
    tgt = np.array([[0.0, 0.0]], np.float32)
    src = np.array([[d, 0.0]], np.float32)
    acc = np.asarray(pair_acc(jnp.array(tgt), jnp.array([rho], jnp.float32),
                              jnp.array(src), jnp.array([G * m], jnp.float32)))
    expected = G * m * d / (d * d + rho) ** 1.5
    np.testing.assert_allclose(acc, [[expected, 0.0]], rtol=1e-6)


def test_softening_uses_target_radius_linear():
    # Quirk #1: r2 = dist^2 + target radius (linear, not squared).
    tgt = np.array([[0.0, 0.0]], np.float32)
    src = np.array([[1.0, 0.0]], np.float32)
    gm = np.array([G], np.float32)
    a_small = np.asarray(pair_acc(jnp.array(tgt), jnp.array([0.1], jnp.float32),
                                  jnp.array(src), jnp.array(gm)))[0, 0]
    a_big = np.asarray(pair_acc(jnp.array(tgt), jnp.array([10.0], jnp.float32),
                                jnp.array(src), jnp.array(gm)))[0, 0]
    assert a_small == pytest.approx(G / (1.0 + 0.1) ** 1.5, rel=1e-6)
    assert a_big == pytest.approx(G / (1.0 + 10.0) ** 1.5, rel=1e-6)


def test_self_interaction_contributes_zero():
    # Quirk #4: no i==j special case; radv = 0 makes the term zero.
    pos = np.array([[1.0, 2.0]], np.float32)
    acc = np.asarray(pair_acc(jnp.array(pos), jnp.array([0.5], jnp.float32),
                              jnp.array(pos), jnp.array([123.0], jnp.float32)))
    np.testing.assert_array_equal(acc, 0.0)


def test_zero_mass_sources_contribute_zero():
    # Quirk #3/#4: zero-gm (massless or padding) sources are inert.
    rng = np.random.default_rng(0)
    tgt = rng.normal(size=(8, 2)).astype(np.float32)
    rad = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    src = rng.normal(size=(4, 2)).astype(np.float32)
    gm = np.array([1.0, 0.0, 2.0, 0.0], np.float32)
    full = np.asarray(direct_sum_acc(jnp.array(tgt), jnp.array(rad), jnp.array(src), jnp.array(gm)))
    only_massive = np.asarray(direct_sum_acc(jnp.array(tgt), jnp.array(rad),
                                             jnp.array(src[[0, 2]]), jnp.array(gm[[0, 2]])))
    np.testing.assert_allclose(full, only_massive, rtol=1e-6)


def test_matches_scalar_oracle_random():
    rng = np.random.default_rng(42)
    tgt = (100 * rng.normal(size=(32, 2))).astype(np.float32)
    rad = rng.uniform(0.5, 9.5, 32).astype(np.float32)
    src = tgt[:20]
    gm = (G * rng.uniform(10, 1e4, 20)).astype(np.float32)
    got = np.asarray(direct_sum_acc(jnp.array(tgt), jnp.array(rad), jnp.array(src), jnp.array(gm)))
    want = ref_acc(tgt.astype(np.float64), rad.astype(np.float64),
                   src.astype(np.float64), gm.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-5)


def test_chunked_equals_dense():
    rng = np.random.default_rng(1)
    tgt = rng.normal(size=(64, 2)).astype(np.float32)
    rad = rng.uniform(0.5, 2.0, 64).astype(np.float32)
    src = rng.normal(size=(16, 2)).astype(np.float32)
    gm = rng.uniform(0, 100, 16).astype(np.float32)
    dense = np.asarray(direct_sum_acc(jnp.array(tgt), jnp.array(rad), jnp.array(src), jnp.array(gm)))
    chunked = np.asarray(direct_sum_acc(jnp.array(tgt), jnp.array(rad), jnp.array(src),
                                        jnp.array(gm), chunk=16))
    # XLA may vectorize the reduction differently per shape: fp32-level only
    np.testing.assert_allclose(dense, chunked, rtol=1e-4, atol=1e-5)


def test_chunk_must_divide():
    with pytest.raises(ValueError):
        direct_sum_acc(jnp.zeros((10, 2)), jnp.ones(10), jnp.zeros((4, 2)), jnp.ones(4), chunk=3)


def test_precise_vs_fast_close():
    rng = np.random.default_rng(3)
    tgt = (100 * rng.normal(size=(16, 2))).astype(np.float32)
    rad = rng.uniform(0.5, 9.5, 16).astype(np.float32)
    gm = (G * rng.uniform(10, 1e4, 16)).astype(np.float32)
    a = np.asarray(pair_acc(jnp.array(tgt), jnp.array(rad), jnp.array(tgt), jnp.array(gm), precise=True))
    b = np.asarray(pair_acc(jnp.array(tgt), jnp.array(rad), jnp.array(tgt), jnp.array(gm), precise=False))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_acc_from_particles_masks_by_mass_len():
    p = make_particles(
        np.array([[0, 0], [1, 0], [2, 0]], np.float32),
        mass=np.array([5.0, 3.0, 0.0], np.float32),
        radius=np.array([1.0, 1.0, 0.5], np.float32),
    )
    got = np.asarray(acc_from_particles(p.pos, p.radius, p.mass, mass_len=2))
    want = ref_acc(np.asarray(p.pos, np.float64), np.asarray(p.radius, np.float64),
                   np.asarray(p.pos[:2], np.float64), G * np.asarray(p.mass[:2], np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_integrate_is_semi_implicit_euler():
    # Quirk #2: v += a*dt THEN x += v*dt (velocity first).
    pos = jnp.array([[1.0, 0.0]])
    vel = jnp.array([[0.0, 1.0]])
    acc = jnp.array([[2.0, -1.0]])
    dt = 0.5
    new_pos, new_vel = integrate(pos, vel, acc, dt)
    np.testing.assert_allclose(np.asarray(new_vel), [[1.0, 0.5]])
    # pos uses the NEW velocity
    np.testing.assert_allclose(np.asarray(new_pos), [[1.5, 0.25]])


def test_pallas_rejects_unaligned_tile_sources():
    # code-review r2: unaligned tile_sources would silently drop the
    # size % 128 lanes of every chunk (0.6 rel error) — must raise instead
    import pytest
    from nbody_tpu.ops.pallas_forces import pallas_acc

    pos = jnp.zeros((256, 2), jnp.float32)
    rad = jnp.ones((256,), jnp.float32)
    src = jnp.zeros((256, 2), jnp.float32)
    gm = jnp.ones((256,), jnp.float32)
    with pytest.raises(ValueError, match="tile_sources"):
        pallas_acc(pos, rad, src, gm, tile_sources=192)


def test_fused_kernel_tile_halving_and_short_sources():
    """Edge shapes: T not divisible by the default tile (halving kicks in),
    and short source rows (S <= 4096 caps the tile at 512) — both must agree
    with the jnp oracle."""
    import numpy as np
    from nbody_tpu import forces
    from nbody_tpu.ops.pallas_forces import pallas_acc

    rng = np.random.RandomState(3)
    for t, s in ((1536, 256), (264, 128), (4096, 2048)):
        pos = jnp.asarray(rng.randn(t, 2) * 100, jnp.float32)
        rad = jnp.asarray(np.abs(rng.randn(t)) + 0.5, jnp.float32)
        gm = jnp.asarray(np.abs(rng.randn(s)) * 10, jnp.float32)
        src = pos[:s]
        want = np.asarray(forces.direct_sum_acc(pos, rad, src, gm, precise=False))
        got = np.asarray(pallas_acc(pos, rad, src, gm))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)


def test_fused_kernel_streaming_boundary():
    """Streaming kicks in just above RESIDENT_SOURCE_MAX; resident just
    below. Both must agree with the oracle at the boundary."""
    import numpy as np
    from nbody_tpu.ops import pallas_forces as pf
    from nbody_tpu import forces

    old = pf.RESIDENT_SOURCE_MAX
    old_blk = pf.STREAM_SRC_BLOCK
    pf.RESIDENT_SOURCE_MAX = 512
    pf.STREAM_SRC_BLOCK = 512  # stream block = 2 x 256-chunk
    try:
        rng = np.random.RandomState(4)
        t = 1024
        pos = jnp.asarray(rng.randn(t, 2) * 50, jnp.float32)
        rad = jnp.asarray(np.abs(rng.randn(t)) + 0.5, jnp.float32)
        # (S, src_real) coverage: resident boundary; single stream block;
        # multi-block uniform (scratch accumulator carry across j); and a
        # statically-shorter last block (traced trip count) via src_real.
        # real=1600 -> last block shorter by a chunk (traced trip count);
        # real=1800 -> last block full in chunks (static uniform branch).
        for s, real in ((512, None), (1024, None), (2048, None),
                        (2048, 1600), (2048, 1800)):
            gm_np = np.abs(rng.randn(s)) * 10
            if real is not None:
                gm_np[real:] = 0.0  # padding rows must be inert
            gm = jnp.asarray(gm_np, jnp.float32)
            src = jnp.asarray(rng.randn(s, 2) * 50, jnp.float32)
            want = np.asarray(forces.direct_sum_acc(pos, rad, src, gm, precise=False))
            got = np.asarray(pf.pallas_acc(pos, rad, src, gm, tile_sources=256,
                                           src_real=real))
            scale = np.abs(want).max()
            np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)
    finally:
        pf.RESIDENT_SOURCE_MAX = old
        pf.STREAM_SRC_BLOCK = old_blk


def test_resolve_tile_targets_hardware_legalization():
    """Mosaic's block-spec rule (lane dim % 128 == 0, or == the whole array
    dim) is invisible to the interpreter, so CI passed tiles the hardware
    lowering rejects — caught live on v5e by the north-star parity test at
    N=2000 with the test-sized PRECISE config (tile_targets=8 pads targets
    to 2000; halving landed on an illegal (6, 16) block). The resolver must
    now emit only hardware-legal tiles when interpret is off."""
    from nbody_tpu.ops.pallas_forces import (
        WHOLE_TARGET_MAX, resolve_tile_targets)

    # The live failure: t=2000 (8-aligned, not 128-aligned) with a tiny
    # requested tile and the PRECISE config's 128-chunk -> one whole-array
    # block on hardware.
    assert resolve_tile_targets(2000, 8, 2048, hardware=True, chunk=128) == 2000
    # Same shapes stay interpreter-sized when not lowering for hardware
    # (the World passes kernel_tile_targets=1024; halving lands on 16 —
    # the exact illegal block of the live failure).
    assert resolve_tile_targets(2000, 8, 2048, hardware=False, chunk=128) == 8
    assert resolve_tile_targets(2000, 1024, 2048, hardware=False) == 16
    # 128 divides t: bump the tiny tile to the 128 minimum instead.
    assert resolve_tile_targets(2048, 8, 2048, hardware=True) == 128
    # Production config untouched (already legal; 512-cap for short s).
    assert resolve_tile_targets(2048, 1024, 2048, hardware=True) == 512
    assert resolve_tile_targets(65536, 1024, 131072, hardware=True) == 1024
    # Whole-array fallback also covers t below the requested tile.
    assert resolve_tile_targets(16, 8, 128, hardware=True) == 16
    # Hardware tiles are VMEM-bounded: at the default 2048-chunk a
    # (2000, 2048) compute block would overflow scoped VMEM (the
    # (1024, 2048) production block already sits near the limit), so the
    # resolver must refuse with the remedy instead of emitting an opaque
    # Mosaic compile failure.
    with pytest.raises(ValueError, match="lower tile_sources"):
        resolve_tile_targets(2000, 1024, 2048, hardware=True, chunk=2048)
    # ... including when tile_t == t arrives NATURALLY (review r5: the
    # legalization branch is skipped, but the bound must still hold) ...
    with pytest.raises(ValueError, match="lower tile_sources"):
        resolve_tile_targets(2000, 2048, 8192, hardware=True, chunk=2048)
    # ... and in the short-source regime the budget is HALVED (the 512-row
    # cap encodes the same measurement), so a (1000, 2048) whole-array
    # fallback refuses where its 128-chunk twin is fine.
    with pytest.raises(ValueError, match="short-source"):
        resolve_tile_targets(1000, 1024, 2048, hardware=True, chunk=2048)
    assert resolve_tile_targets(1000, 1024, 2048, hardware=True,
                                chunk=128) == 1000
    # No legal tile exists above the whole-array cap: fail with remedy.
    bad_t = WHOLE_TARGET_MAX + 8  # 8-aligned, not 128-aligned, too big
    assert bad_t % 128
    with pytest.raises(ValueError, match="multiple of 128"):
        resolve_tile_targets(bad_t, 8, 2048, hardware=True, chunk=128)
    # Every legal result satisfies the Mosaic rule.
    for t in (16, 256, 384, 2000, 2048, 4096, 65536):
        for req in (8, 16, 128, 512, 1024):
            got = resolve_tile_targets(t, req, 2048, hardware=True, chunk=128)
            assert t % got == 0
            assert got % 128 == 0 or got == t, (t, req, got)


def test_mosaic_aot_compiles_kernel_at_interpret_shapes():
    """AOT-lower and Mosaic-compile the kernel against a chipless v5e
    topology at the INTERPRETER-sized shapes CI runs (tile_targets=8;
    T=2000 is 8-aligned but not 128-aligned, T=2048 takes the 128-bump) —
    the exact class of failure the interpreter cannot see: round 5 caught
    a (6, 16) block over (6, 2000) being rejected by the live TPU lowering
    while every interpret-mode test passed. Complements
    test_ring_barrier's AOT compile of the multi-chip kernel."""
    import jax
    from jax.sharding import SingleDeviceSharding

    from nbody_tpu.ops.pallas_forces import fused_substep, pallas_acc

    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    except Exception as e:  # no libtpu / moved module in this environment
        pytest.skip(f"chipless TPU AOT unavailable: {e}")

    sh = SingleDeviceSharding(topo.devices[0])
    for t, s in ((2000, 2048), (2048, 2048)):
        args = [
            jax.ShapeDtypeStruct((t, 2), jnp.float32, sharding=sh),
            jax.ShapeDtypeStruct((t,), jnp.float32, sharding=sh),
            jax.ShapeDtypeStruct((s, 2), jnp.float32, sharding=sh),
            jax.ShapeDtypeStruct((s,), jnp.float32, sharding=sh),
        ]

        def acc_body(tp, tr, sp, sg):
            return pallas_acc(tp, tr, sp, sg, tile_targets=8,
                              tile_sources=128, interpret=False)

        compiled = jax.jit(acc_body).lower(*args).compile()
        assert compiled is not None, (t, s)

        def step_body(tp, tr, sp, sg):
            import jax.numpy as jnp_
            src = jnp_.concatenate([jnp_.transpose(sp), sg[None, :]], axis=0)
            return fused_substep(
                jnp_.float32(0.01), tp, jnp_.zeros_like(tp), tr,
                jnp_.ones((t, 1), jnp_.float32), src, tile_targets=8,
                tile_sources=128, interpret=False)

        compiled = jax.jit(step_body).lower(*args).compile()
        assert compiled is not None, (t, s)
