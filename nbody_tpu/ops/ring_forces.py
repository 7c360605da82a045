"""Fused force + ring-RDMA Pallas kernel: the production multi-chip substep.

The shard_map-level ring in ``nbody_tpu.parallel.sharding`` rotates source
tiles with ``jax.lax.ppermute`` between separate force-kernel calls — XLA
overlaps the collective with compute, but each hop is a separate kernel
launch with an XLA-scheduled dependency. This module fuses the ENTIRE
substep for one device into a single Pallas kernel:

  * per-particle state arrives as dense (1, T) fp32 rows in compiler-chosen
    memory (HBM for large shards); the kernel streams (1, tile_t) slices into
    VMEM with ``make_async_copy`` — no whole-shard VMEM residency, so local
    shards of any size fit (v1 of this kernel kept (T,1) columns VMEM-resident,
    which lane-pads 128x and capped shards at ~1k particles);
  * the visiting source tile (x, y, G*mass rows) sits in a double-buffered
    scratch — VMEM while it fits, else auto-switching to HBM-space with
    per-tile VMEM streaming; while hop k's tile feeds the tiled O(T*S)
    force loops, it is simultaneously in flight to the right neighbor via
    ``make_async_remote_copy`` over ICI (the ring-collective pattern), with
    a "slot freed" semaphore handshake for backpressure;
  * accelerations accumulate across hops in a dense (n_i, tile_t) VMEM
    scratch (one row per target tile — no lane padding);
  * after the last hop an integration pass applies semi-implicit Euler
    (particle_cs.glsl:51-52) with validity masking and DMA-writes the new
    state — one kernel launch per device per substep, zero XLA glue.

Jacobi semantics hold because outputs are separate buffers: every device
reads only pre-step positions (its own targets from the input operands, the
sources from the rotating snapshot taken at substep start) — the TPU
analogue of the reference's old/new double buffering (sim_gpu.c:19,
particle_cs.glsl:14-20).

Correctness is CI-tested three ways (tests/test_ring_kernel.py,
tests/test_ring_barrier.py): (1) generic interpret mode on the virtual CPU
mesh (barrier compiled out); (2) Pallas TPU interpret mode
(``interpret="tpu_sim"``), which SIMULATES the remote DMAs, semaphores and
barrier across shard_map'd CPU devices with race detection on — the
barrier/backpressure handshake executes for real there; and (3) a chipless
libtpu AOT compile of the n_devices=8 barrier kernel against a v5e:2x4
topology, so Mosaic's codegen of the handshake is exercised in CI. On real
hardware the RDMA rides ICI (single-chip environment here, so multi-chip
perf is unmeasured). Single-device instantiation (n_devices=1, axis=None)
remains available; since round 2 the single-chip World backends use the
dedicated fused kernel in ``pallas_forces`` instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DTYPE, SOFTENING_FLOOR


def _make_kernel(axis: str | None, n_devices: int, n_i: int, n_j: int,
                 tile_t: int, tile_s: int, precise: bool, use_barrier: bool,
                 stream_sources: bool, pos_dt: float):
    def kernel(
        dt_ref,                                              # (1,1) SMEM
        px_ref, py_ref, rr_ref, vx_ref, vy_ref, valid_ref,   # (1,T) ANY
        src_ref,                                             # (3,S) ANY
        npx_ref, npy_ref, nvx_ref, nvy_ref, nax_ref, nay_ref,  # (1,T) ANY
        *rest,
    ):
        # streaming mode: comm lives in compiler-chosen (HBM) memory as an
        # extra output and source tiles DMA through a small VMEM buffer;
        # resident mode: comm is a VMEM scratch read directly.
        if stream_sources:
            (comm, accx, accy,
             tbx, tby, tbr, ivx, ivy, ivd,
             sox, soy, svx, svy, sax, say, sbuf,
             copy_sem, send_sem, recv_sem, ready_sem) = rest
        else:
            (accx, accy,
             tbx, tby, tbr, ivx, ivy, ivd,
             sox, soy, svx, svy, sax, say,
             comm, copy_sem, send_sem, recv_sem, ready_sem) = rest
            sbuf = None
        me = jax.lax.axis_index(axis) if n_devices > 1 else 0

        init = pltpu.make_async_copy(src_ref, comm.at[0], copy_sem.at[5])
        init.start()
        init.wait()
        accx[:] = jnp.zeros_like(accx)
        accy[:] = jnp.zeros_like(accy)

        if use_barrier:
            # don't RDMA into a peer that hasn't entered the kernel yet
            barrier = pltpu.get_barrier_semaphore()
            left = jax.lax.rem(me + n_devices - 1, n_devices)
            right = jax.lax.rem(me + 1, n_devices)
            pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, 2)

        def load_tile(i, refs_bufs_sems):
            dmas = [
                pltpu.make_async_copy(
                    ref.at[:, pl.ds(i * tile_t, tile_t)], buf, copy_sem.at[k]
                )
                for k, (ref, buf) in enumerate(refs_bufs_sems)
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        def hop_body(hop, _):
            slot = jax.lax.rem(hop, 2)
            nxt = jax.lax.rem(hop + 1, 2)

            if n_devices > 2 and use_barrier:
                # Backpressure: hop h's send (h >= 1) overwrites the slot the
                # right neighbor read during hop h-1; wait for its
                # "slot freed" signal before starting the copy. (Two devices
                # ping-pong between distinct slots; interpret mode is
                # sequential — neither can race.)
                @pl.when((hop >= 1) & (hop < n_devices - 1))
                def _():
                    pltpu.semaphore_wait(ready_sem, 1)

            if n_devices > 1:
                @pl.when(hop < n_devices - 1)
                def _():
                    pltpu.make_async_remote_copy(
                        src_ref=comm.at[slot], dst_ref=comm.at[nxt],
                        send_sem=send_sem.at[slot], recv_sem=recv_sem.at[nxt],
                        device_id=jax.lax.rem(me + 1, n_devices),
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    ).start()

            def i_body(i, _):
                load_tile(i, [(px_ref, tbx), (py_ref, tby), (rr_ref, tbr)])
                tx = jnp.transpose(tbx[:])  # (tile_t, 1)
                ty = jnp.transpose(tby[:])
                tr = jnp.transpose(tbr[:])

                if stream_sources:
                    # double-buffered HBM->VMEM prefetch: tile j+1 is in
                    # flight while tile j feeds the force block
                    def tile_cp(jj, sl):
                        return pltpu.make_async_copy(
                            comm.at[slot, :, pl.ds(jj * tile_s, tile_s)],
                            sbuf.at[sl], copy_sem.at[4 + sl],
                        )

                    tile_cp(0, 0).start()

                def j_body(j, carry):
                    ax, ay = carry
                    if stream_sources:
                        cur = jax.lax.rem(j, 2)

                        @pl.when(j + 1 < n_j)
                        def _():
                            tile_cp(j + 1, jax.lax.rem(j + 1, 2)).start()

                        tile_cp(j, cur).wait()
                        sx = sbuf[cur, 0:1, :]
                        sy = sbuf[cur, 1:2, :]
                        gm = sbuf[cur, 2:3, :]
                    else:
                        sx = comm[slot, 0:1, pl.ds(j * tile_s, tile_s)]
                        sy = comm[slot, 1:2, pl.ds(j * tile_s, tile_s)]
                        gm = comm[slot, 2:3, pl.ds(j * tile_s, tile_s)]
                    dx = sx - tx
                    dy = sy - ty
                    r2 = dx * dx + dy * dy + tr
                    if precise:
                        f = gm / (jnp.sqrt(r2) * r2)
                    else:
                        inv = jax.lax.rsqrt(r2)
                        f = gm * (inv * inv * inv)
                    ax = ax + jnp.sum(dx * f, axis=1, keepdims=True)
                    ay = ay + jnp.sum(dy * f, axis=1, keepdims=True)
                    return ax, ay

                zero = jnp.zeros((tile_t, 1), DTYPE)
                ax, ay = jax.lax.fori_loop(0, n_j, j_body, (zero, zero))
                accx[pl.ds(i, 1), :] += jnp.transpose(ax)
                accy[pl.ds(i, 1), :] += jnp.transpose(ay)
                return 0

            jax.lax.fori_loop(0, n_i, i_body, 0)

            if n_devices > 1:
                @pl.when(hop < n_devices - 1)
                def _():
                    pltpu.make_async_remote_copy(
                        src_ref=comm.at[slot], dst_ref=comm.at[nxt],
                        send_sem=send_sem.at[slot], recv_sem=recv_sem.at[nxt],
                        device_id=jax.lax.rem(me + 1, n_devices),
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    ).wait()

            if n_devices > 2 and use_barrier:
                # comm[slot] is no longer read by EITHER this device's compute
                # or its outgoing RDMA (send_sem waited above): tell the LEFT
                # neighbor it may overwrite the slot with its next-hop send.
                # (Signaling before the send completed would let the neighbor
                # clobber the slot mid-transfer.)
                @pl.when(hop < n_devices - 2)
                def _():
                    pltpu.semaphore_signal(
                        ready_sem, inc=1,
                        device_id=jax.lax.rem(me + n_devices - 1, n_devices),
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
            return 0

        jax.lax.fori_loop(0, n_devices, hop_body, 0)

        # --- integration pass, padding rows masked: v += a*dt, then
        # x += pos_dt*dt*v (pos_dt=1 -> semi-implicit Euler,
        # particle_cs.glsl:51-52; pos_dt=0.5 -> kick + half-drift, the
        # second half of position-Verlet with the caller pre-drifting) ---
        dt = dt_ref[0, 0]

        def int_body(i, _):
            load_tile(i, [(px_ref, tbx), (py_ref, tby), (vx_ref, ivx),
                          (vy_ref, ivy), (valid_ref, ivd)])
            ax = accx[pl.ds(i, 1), :] * ivd[:]
            ay = accy[pl.ds(i, 1), :] * ivd[:]
            nvx = ivx[:] + dt * ax
            nvy = ivy[:] + dt * ay
            sax[:] = ax
            say[:] = ay
            svx[:] = nvx
            svy[:] = nvy
            sox[:] = tbx[:] + (pos_dt * dt) * nvx
            soy[:] = tby[:] + (pos_dt * dt) * nvy
            outs = [
                pltpu.make_async_copy(
                    buf, ref.at[:, pl.ds(i * tile_t, tile_t)], copy_sem.at[k]
                )
                for k, (buf, ref) in enumerate([
                    (sox, npx_ref), (soy, npy_ref), (svx, nvx_ref),
                    (svy, nvy_ref), (sax, nax_ref), (say, nay_ref),
                ])
            ]
            for d in outs:
                d.start()
            for d in outs:
                d.wait()
            return 0

        jax.lax.fori_loop(0, n_i, int_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("axis", "n_devices", "tile_t", "tile_s", "precise",
                     "interpret", "stream_sources", "pos_dt"),
)
def ring_substep(
    dt,          # scalar f32
    pos,         # (T, 2) local targets
    vel,         # (T, 2)
    radius,      # (T,)
    valid,       # (T, 1)
    src,         # (3, S) local source shard rows: x, y, gm
    *,
    axis: str | None,
    n_devices: int,
    tile_t: int = 512,
    tile_s: int = 1024,
    precise: bool = False,
    interpret: bool | None = None,
    stream_sources: bool | None = None,
    pos_dt: float = 1.0,
):
    """One fused substep for this device (call inside shard_map; or with
    n_devices=1 / axis=None as a single-chip fused step). Returns
    (new_pos, new_vel, new_acc) for the local target shard."""
    t = pos.shape[0]
    s = src.shape[1]
    tile_t = min(tile_t, t)
    tile_s = min(tile_s, s)
    # keep the (tile_t, tile_s) block temporaries within ~6MB of VMEM
    while tile_s > 128 and 3 * tile_t * tile_s * 4 > 6 * 1024 * 1024:
        tile_s //= 2
    if t % tile_t or s % tile_s:
        raise ValueError(f"local shapes T={t}, S={s} must tile by ({tile_t},{tile_s})")
    # Targets stream from HBM (up to ~1.2M/shard — the VMEM accumulators are
    # the limit, validated below). The rotating source tile is VMEM-resident
    # when it fits the budget (fastest); otherwise the comm double buffer
    # lives in compiler-chosen (HBM) memory, the ring RDMA lands there, and
    # source tiles stream (double-buffered) through VMEM — unlimited sources.
    # the (n_i, tile_t) acceleration accumulators are unconditionally
    # VMEM-resident: 8 bytes per target caps local target shards at ~1.2M
    temps_bytes = 3 * tile_t * tile_s * 4
    acc_bytes = 2 * t * 4
    if acc_bytes + temps_bytes > 13 * 1024 * 1024:
        raise ValueError(
            f"target shard too large for the fused ring kernel (T={t}: "
            f"{acc_bytes / 2**20:.1f}MB of VMEM accumulators); shard targets "
            "over more devices or use the streaming 'pallas'/'jnp' backends"
        )
    if stream_sources is None:
        comm_bytes = 2 * 4 * s * 4
        stream_sources = (
            comm_bytes + acc_bytes + temps_bytes > 13 * 1024 * 1024
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # interpret modes: False = compile via Mosaic; True = generic Pallas
    # interpreter (no cross-device semaphore semantics, so the barrier is
    # compiled out); "tpu_sim" = the TPU interpret mode
    # (pltpu.InterpretParams), which SIMULATES remote DMAs, semaphores and
    # barriers across shard_map'd CPU devices with race detection — the
    # barrier/backpressure handshake executes for real there (CI-tested in
    # tests/test_ring_barrier.py; the reference's analogous tooling is the
    # Vulkan validation layer, vulkan_ctx.c:322-334).
    tpu_sim = interpret == "tpu_sim"
    if tpu_sim:
        interpret_param = pltpu.InterpretParams(
            detect_races=True, dma_execution_mode="on_wait")
    else:
        interpret_param = bool(interpret)
    use_barrier = n_devices > 1 and (tpu_sim or not interpret)

    n_i = t // tile_t
    n_j = s // tile_s
    kernel = _make_kernel(axis, n_devices, n_i, n_j, tile_t, tile_s, precise,
                          use_barrier, stream_sources, pos_dt)

    row = lambda a: a.reshape(1, t)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tile_buf = lambda: pltpu.VMEM((1, tile_t), DTYPE)
    out_specs = [any_spec] * 6
    out_shape = [jax.ShapeDtypeStruct((1, t), DTYPE)] * 6
    scratch = [
        pltpu.VMEM((n_i, tile_t), DTYPE),    # ax accumulator (dense)
        pltpu.VMEM((n_i, tile_t), DTYPE),    # ay accumulator (dense)
        *[tile_buf() for _ in range(12)],    # target/integration/out bufs
    ]
    # memrefs tile the second-to-last dim by 4, so the (x, y, gm) source rows
    # are padded 3 -> 4 (one dead row) to keep comm.at[slot] DMA slices
    # tile-aligned
    src = jnp.concatenate([src, jnp.zeros((1, s), DTYPE)], axis=0)
    if stream_sources:
        # comm double buffer as an HBM-space output; VMEM streaming buffer
        out_specs.append(any_spec)
        out_shape.append(jax.ShapeDtypeStruct((2, 4, s), DTYPE))
        scratch.append(pltpu.VMEM((2, 4, tile_s), DTYPE))  # prefetch buffers
    else:
        scratch.append(pltpu.VMEM((2, 4, s), DTYPE))  # resident double buffer
    scratch += [
        pltpu.SemaphoreType.DMA((6,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.REGULAR,     # ring backpressure handshake
    ]
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *[any_spec] * 7,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # collective_id pairs with the custom barrier; the compiler
            # rejects it for barrier-less (single-device) instantiations
            collective_id=0 if use_barrier else None,
        ),
        interpret=interpret_param,
    )(
        jnp.asarray(dt, DTYPE).reshape(1, 1),
        # + SOFTENING_FLOOR: NaN guard for zero-radius targets, absorbed
        # bitwise for real radii (types.py)
        row(pos[:, 0]), row(pos[:, 1]), row(radius + SOFTENING_FLOOR),
        row(vel[:, 0]), row(vel[:, 1]), row(valid[:, 0]),
        src,
    )
    npx, npy, nvx, nvy, nax, nay = out[:6]
    new_pos = jnp.stack([npx[0], npy[0]], axis=1)
    new_vel = jnp.stack([nvx[0], nvy[0]], axis=1)
    new_acc = jnp.stack([nax[0], nay[0]], axis=1)
    return new_pos, new_vel, new_acc
