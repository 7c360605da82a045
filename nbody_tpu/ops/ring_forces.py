"""Fused force + ring-RDMA Pallas kernel: the production multi-chip substep.

The shard_map-level ring in ``nbody_tpu.parallel.sharding`` rotates source
tiles with ``jax.lax.ppermute`` between separate force-kernel calls — XLA
overlaps the collective with compute, but each hop is a separate kernel
launch with an XLA-scheduled dependency. This module fuses the ENTIRE
substep for one device into a single Pallas kernel:

  * the local target shard (positions/velocities/radii) lives in VMEM for
    the whole substep;
  * the visiting source tile (x, y, G*mass rows) sits in a double-buffered
    VMEM scratch; while hop k's tile is being consumed by the tiled O(T*S)
    force loops, hop k+1's tile is already in flight to the right neighbor
    via ``make_async_remote_copy`` over ICI (the guide's ring-collective
    pattern);
  * after the last hop the kernel integrates (semi-implicit Euler) and
    writes the new state — one kernel launch per device per substep, zero
    XLA glue in the loop.

Jacobi semantics hold because outputs are separate buffers: every device
reads only pre-step positions (its own targets from the input operand, the
sources from the rotating snapshot taken at substep start) — the TPU
analogue of the reference's old/new double buffering (sim_gpu.c:19,
particle_cs.glsl:14-20).

Correctness is CI-tested in interpreter mode on the virtual CPU mesh; on
real hardware the RDMA rides ICI (untested here: single-chip environment).

Size limits: all per-particle operands are (T, 1) columns, which Mosaic pads
to 128 lanes in VMEM — so the whole-shard-resident design only fits small
local shards (T <= ~1024 with default tiles; validated at call time). That is
the small-N regime (measured single-chip: parity with the grid kernel within
run-to-run noise — the ~300µs/substep floor is dominated by per-call rather
than per-launch overhead); large shards should use the streaming grid kernel
+ XLA-collective ring, which is compute-bound at every size.
Lifting the limit needs HBM-resident operands with per-tile async_copy into
1-D VMEM scratch (planned follow-up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DTYPE


def _make_kernel(axis: str, n_devices: int, tile_t: int, tile_s: int,
                 precise: bool, use_barrier: bool):
    def kernel(
        dt_ref,  # (1,1) SMEM
        px_ref, py_ref, rr_ref, vx_ref, vy_ref, valid_ref,  # (T,1) VMEM
        src_ref,  # (3, S) VMEM: rows x, y, gm — this device's source shard
        npx_ref, npy_ref, nvx_ref, nvy_ref, nax_ref, nay_ref,  # (T,1) out
        comm, ax_acc, ay_acc, send_sem, recv_sem,  # scratch
    ):
        t = px_ref.shape[0]
        s = src_ref.shape[1]
        n_i = t // tile_t
        n_j = s // tile_s
        # axis_index is only valid under shard_map; single-device fused mode
        # (n_devices == 1, axis=None) has no ring at all
        me = jax.lax.axis_index(axis) if n_devices > 1 else 0

        ax_acc[:] = jnp.zeros_like(ax_acc)
        ay_acc[:] = jnp.zeros_like(ay_acc)
        comm[0] = src_ref[:]

        if n_devices > 1 and use_barrier:
            # neighbor barrier: don't RDMA into a peer that hasn't entered
            # the kernel (and allocated its comm buffers) yet. (Unsupported
            # by the interpreter, where lockstep semantics make it moot.)
            barrier = pltpu.get_barrier_semaphore()
            left = jax.lax.rem(me + n_devices - 1, n_devices)
            right = jax.lax.rem(me + 1, n_devices)
            pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, 2)

        def compute_tile(i, hop_slot):
            tx = px_ref[pl.ds(i * tile_t, tile_t), :]
            ty = py_ref[pl.ds(i * tile_t, tile_t), :]
            tr = rr_ref[pl.ds(i * tile_t, tile_t), :]

            def j_body(j, carry):
                ax, ay = carry
                sx = comm[hop_slot, 0:1, pl.ds(j * tile_s, tile_s)]
                sy = comm[hop_slot, 1:2, pl.ds(j * tile_s, tile_s)]
                gm = comm[hop_slot, 2:3, pl.ds(j * tile_s, tile_s)]
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
            ax_acc[pl.ds(i * tile_t, tile_t), :] += ax
            ay_acc[pl.ds(i * tile_t, tile_t), :] += ay

        def hop_body(hop, _):
            slot = jax.lax.rem(hop, 2)
            nxt = jax.lax.rem(hop + 1, 2)

            if n_devices > 1:
                @pl.when(hop < n_devices - 1)
                def _():
                    # start shipping the current tile to the right neighbor
                    rdma = pltpu.make_async_remote_copy(
                        src_ref=comm.at[slot],
                        dst_ref=comm.at[nxt],
                        send_sem=send_sem.at[slot],
                        recv_sem=recv_sem.at[nxt],
                        device_id=jax.lax.rem(me + 1, n_devices),
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
                    rdma.start()

            # force tiles against the resident source tile (overlaps the RDMA)
            jax.lax.fori_loop(0, n_i, lambda i, _: (compute_tile(i, slot), 0)[1], 0)

            if n_devices > 1:
                @pl.when(hop < n_devices - 1)
                def _():
                    # wait for both ends of this hop's transfer
                    pltpu.make_async_remote_copy(
                        src_ref=comm.at[slot],
                        dst_ref=comm.at[nxt],
                        send_sem=send_sem.at[slot],
                        recv_sem=recv_sem.at[nxt],
                        device_id=jax.lax.rem(me + 1, n_devices),
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    ).wait()
            return 0

        jax.lax.fori_loop(0, n_devices, hop_body, 0)

        # integrate (particle_cs.glsl:51-52 semantics), masking padding rows
        dt = dt_ref[0, 0]
        ax = ax_acc[:] * valid_ref[:]
        ay = ay_acc[:] * valid_ref[:]
        nvx = vx_ref[:] + dt * ax
        nvy = vy_ref[:] + dt * ay
        nax_ref[:] = ax
        nay_ref[:] = ay
        nvx_ref[:] = nvx
        nvy_ref[:] = nvy
        npx_ref[:] = px_ref[:] + dt * nvx
        npy_ref[:] = py_ref[:] + dt * nvy

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("axis", "n_devices", "tile_t", "tile_s", "precise", "interpret"),
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
):
    """One fused substep for this device (call inside shard_map). Returns
    (new_pos, new_vel, new_acc) for the local target shard."""
    t = pos.shape[0]
    s = src.shape[1]
    tile_t = min(tile_t, t)
    tile_s = min(tile_s, s)
    if t % tile_t or s % tile_s:
        raise ValueError(f"local shapes T={t}, S={s} must tile by ({tile_t},{tile_s})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # VMEM budget (compiled mode): 14 lane-padded (T,1) buffers + 2x(3,S)
    # comm + ~3 (tile_t, tile_s) temporaries must fit the 16MB scoped limit.
    if not interpret:
        while tile_s > 128 and 3 * tile_t * tile_s * 4 > 4 * 1024 * 1024:
            tile_s //= 2
        vmem = 14 * t * 128 * 4 + 2 * 3 * s * 4 + 3 * tile_t * tile_s * 4
        if vmem > 12 * 1024 * 1024:
            raise ValueError(
                f"fused ring kernel local shard too large for VMEM (T={t}, S={s}, "
                f"~{vmem/2**20:.1f}MB); use the streaming 'pallas'/'jnp' ring "
                "backends for shards above ~1k particles"
            )

    use_barrier = n_devices > 1 and not interpret
    kernel = _make_kernel(axis, n_devices, tile_t, tile_s, precise,
                          use_barrier=use_barrier)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[jax.ShapeDtypeStruct((t, 1), DTYPE)] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, 3, s), DTYPE),     # double-buffered source tile
            pltpu.VMEM((t, 1), DTYPE),        # ax accumulator
            pltpu.VMEM((t, 1), DTYPE),        # ay accumulator
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # collective_id pairs with the custom barrier; the compiler
            # rejects it for barrier-less (single-device) instantiations
            collective_id=0 if use_barrier else None,
        ),
        interpret=interpret,
    )(
        jnp.asarray(dt, DTYPE).reshape(1, 1),
        pos[:, 0:1], pos[:, 1:2], radius[:, None],
        vel[:, 0:1], vel[:, 1:2], valid,
        src,
    )
    npx, npy, nvx, nvy, nax, nay = out
    new_pos = jnp.concatenate([npx, npy], axis=1)
    new_vel = jnp.concatenate([nvx, nvy], axis=1)
    new_acc = jnp.concatenate([nax, nay], axis=1)
    return new_pos, new_vel, new_acc
