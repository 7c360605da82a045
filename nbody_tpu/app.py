"""Command-line application: run / render / view simulations.

The reference's only runtime configuration was bench's --cpu/--gpu; everything
else required recompiling macros (SURVEY.md §5, reference TODO README.md:98
"Allow setting simulation parameters through command line arguments"). This
CLI closes that gap:

  python -m nbody_tpu run    --n 6000 --galaxies 3 --steps 1000 [--traj out.npz]
  python -m nbody_tpu render --state state.npz --out frame.ppm
  python -m nbody_tpu gif    --n 6000 --frames 120 --out anim.gif
  python -m nbody_tpu view   --n 6000            (interactive, needs a GUI)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from . import make_galaxies, create_world
from .types import SimConfig
from .render import fit_camera, render_frame, save_ppm
from .utils.checkpoint import load_particles, save_world_atomic
from .viewer import PHYS_STEP, Viewer, export_animation


def _add_scene_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--n", type=int, default=6000, help="particle count (main.c:13)")
    p.add_argument("--galaxies", type=int, default=3, help="galaxy count (main.c:44)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene",
                   choices=["galaxies", "plummer", "kepler", "cold"],
                   default="galaxies",
                   help="model family: spiral galaxies (reference scene), "
                        "Plummer disk, Kepler disk (central mass + "
                        "rotation-supported ring), or cold-collapse disk")
    p.add_argument("--state", help="resume from a .npz checkpoint instead of generating")
    p.add_argument("--backend",
                   choices=["jnp", "pallas", "pallas_fused", "pm", "p3m",
                            "auto"],
                   default=None,
                   help="force backend ('auto' = faster of exact direct sum "
                        "/ p3m at this N, the main.c:55 scale mux)")
    p.add_argument("--dt", type=lambda s: s if s == "auto" else float(s),
                   default=PHYS_STEP,
                   help="substep size, or 'auto' for the softening-"
                        "resolution criterion (diagnostics.suggest_dt: "
                        "0.1 · min sqrt(eps/|a|) on the initial state)")
    p.add_argument("--precise", action="store_true",
                   help="exact sqrt+divide force math (reference shader semantics)")
    p.add_argument("--integrator", choices=["euler", "leapfrog", "yoshida4"],
                   default="euler",
                   help="euler = reference-exact; leapfrog = 2nd-order "
                        "symplectic; yoshida4 = 4th-order symplectic "
                        "(3 force evals/substep)")
    p.add_argument("--pm-grid", default=512,
                   type=lambda s: s if s == "auto" else int(s),
                   help="particle-mesh resolution (backend=pm/p3m), or "
                        "'auto' for the measured sqrt(N) heuristic "
                        "(ops.pm_forces.suggest_grid)")
    p.add_argument("--pm-softening", type=float, default=2.0,
                   help="global Plummer softening length (backend=pm/p3m)")
    p.add_argument("--p3m-rc-cells", type=int, default=4,
                   help="p3m short-range cutoff in grid cells (wider = "
                        "smaller handoff error, more pair work)")
    p.add_argument("--p3m-cell-capacity", type=int, default=96,
                   help="p3m sources kept per cell (heaviest-first)")
    p.add_argument("--p3m-exact-targets", type=int, default=64,
                   help="p3m largest-radius targets computed by direct sum")
    p.add_argument("--p3m-rebin", type=int, default=1,
                   help="p3m: recompute cell sorts every this many substeps "
                        "(1 = exact; >1 trades a bounded rc-boundary error "
                        "for amortized sort cost at large N)")
    p.add_argument("--p3m-pp-chunk", type=int, default=64,
                   help="p3m: PP pair-map chunk size for the exact "
                        "empty-chunk skip (0 = off)")
    p.add_argument("--merge", nargs="?", const=1.0, type=float, default=None,
                   metavar="FACTOR",
                   help="inelastic collision merging: overlapping massive "
                        "bodies (|d| < FACTOR*(r_i+r_j), default 1.0) merge "
                        "lighter-into-heavier with exact mass/momentum "
                        "transfer (backends jnp/pallas/pm)")


# CLI flag -> SimConfig field with the flag's argparse default; used to tell
# "explicitly passed" (!= default) from "left at default" on resume, where
# the checkpoint's saved config is the base. A flag explicitly set to its
# default is indistinguishable from unset and keeps the saved value — a
# no-op unless the save used a non-default the user wants to reset (pass it
# off-default or drop --state for a fresh world in that corner).
_CONFIG_FLAG_DEFAULTS = {
    "precise": ("precise", False),
    "integrator": ("integrator", "euler"),
    "pm_grid": ("pm_grid", 512),
    "pm_softening": ("pm_softening", 2.0),
    "p3m_rc_cells": ("p3m_rc_cells", 4),
    "p3m_cell_capacity": ("p3m_cell_capacity", 96),
    "p3m_exact_targets": ("p3m_exact_targets", 64),
    "p3m_rebin": ("p3m_rebin_interval", 1),
    "p3m_pp_chunk": ("p3m_pp_chunk", 64),
}


def _make_world(args):
    """Build the world; returns (world, start_step) where start_step is the
    resumed checkpoint's accumulated substep counter (0 for a fresh scene)."""
    import dataclasses

    start = 0
    saved = None
    if args.state:
        particles, extra = load_particles(args.state)
        start = int(extra.get("step", 0))
        from .utils.checkpoint import saved_config

        saved = saved_config(extra)
    else:
        scene = getattr(args, "scene", "galaxies")
        if scene == "galaxies":
            particles = make_galaxies(args.n, args.galaxies, seed=args.seed)
        else:
            import jax

            from . import models

            maker = {"plummer": models.make_plummer_disk,
                     "kepler": models.make_kepler_disk,
                     "cold": models.make_cold_disk}[scene]
            particles = maker(jax.random.PRNGKey(args.seed), args.n)
    pm_grid = args.pm_grid
    if pm_grid == "auto":
        from .ops.pm_forces import suggest_grid

        pm_grid = suggest_grid(particles.pos.shape[0])
        print(f"pm_grid auto -> {pm_grid}", file=sys.stderr)
    if saved is not None:
        # resume reproduces the save-time physics: checkpoint config is the
        # base; only explicitly passed flags override it
        overrides = {}
        for flag, (field, default) in _CONFIG_FLAG_DEFAULTS.items():
            value = pm_grid if flag == "pm_grid" else getattr(args, flag)
            if getattr(args, flag) != default:
                overrides[field] = value
        if args.merge is not None:
            overrides["merge_collisions"] = True
            overrides["merge_factor"] = args.merge
        config = dataclasses.replace(saved, **overrides)
    else:
        config = SimConfig(precise=args.precise, integrator=args.integrator,
                           pm_grid=pm_grid, pm_softening=args.pm_softening,
                           p3m_rc_cells=args.p3m_rc_cells,
                           p3m_cell_capacity=args.p3m_cell_capacity,
                           p3m_exact_targets=args.p3m_exact_targets,
                           p3m_rebin_interval=args.p3m_rebin,
                           p3m_pp_chunk=args.p3m_pp_chunk,
                           merge_collisions=args.merge is not None,
                           merge_factor=(1.0 if args.merge is None
                                         else args.merge))
    if config.merge_collisions and getattr(args, "backend", None) == "p3m":
        # checked on the RESOLVED config so a resumed merge-enabled
        # checkpoint is caught too, not just an explicit --merge flag
        sys.exit("nbody_tpu: error: merging is not supported with "
                 "--backend p3m (frozen cell blocks); use jnp, pallas, or pm")
    if getattr(args, "shard", False):
        # multi-chip: shard the run over every visible device (pod slices;
        # on one chip this degenerates to a 1-device mesh). The backend is
        # fixed at construction ('pallas' maps to the fused RDMA ring).
        from .parallel.sharding import ShardedWorld, make_mesh

        backend = {"pallas": "pallas_ring",
                   "pallas_fused": "pallas_ring"}.get(args.backend,
                                                      args.backend)
        return ShardedWorld(particles, make_mesh(), config=config,
                            force_backend=backend), start
    return (create_world(particles, config=config,
                         default_backend=args.backend), start)


def _resolve_dt(args, w) -> None:
    """``--dt auto``: evaluate the softening-resolution criterion
    (diagnostics.suggest_dt, eta=0.1) on the initial accelerations. One
    dt=0 substep populates ``acc`` without moving anything (every
    integrator's position/velocity increments carry a factor of dt)."""
    if args.dt != "auto":
        return
    from .diagnostics import suggest_dt

    w.update(0.0, 1)
    dt = float(suggest_dt(w.particles))
    # dt == 0.0 happens too: a zero-radius particle under nonzero force
    # has eps = sqrt(radius) = 0 (make_particles allows radius 0)
    if not np.isfinite(dt) or dt <= 0.0:
        raise SystemExit("--dt auto: world has no resolvable orbital "
                         "timescale (force-free, or a zero-radius particle "
                         "under force); pass an explicit --dt")
    args.dt = dt
    print(f"dt auto -> {dt:.6g}", file=sys.stderr)


def cmd_run(args) -> None:
    if args.checkpoint_every < 0:
        raise SystemExit(f"--checkpoint-every must be >= 0, "
                         f"got {args.checkpoint_every}")
    if args.checkpoint_every and args.traj:
        print("warning: --checkpoint-every is ignored with --traj "
              "(trajectory capture runs as one fused scan)", file=sys.stderr)
    if args.adaptive is not None and args.adaptive <= 0:
        raise SystemExit(f"--adaptive T_SPAN must be > 0, "
                         f"got {args.adaptive}")
    w, start = _make_world(args)
    if args.adaptive is None:
        # --adaptive does NOT resolve --dt auto: the adaptive loop
        # re-evaluates the criterion itself every substep (and handles the
        # force-free inf case), so auto just means "default dt ceiling"
        _resolve_dt(args, w)
    sharded = getattr(args, "shard", False)
    backend = (f"{w.force_backend} x{w.n_devices}dev" if sharded
               else w.default_backend)
    print(f"N={w.total_len} massive={w.mass_len} backend={backend}",
          file=sys.stderr)

    if args.adaptive is not None:
        if args.traj or args.checkpoint_every:
            raise SystemExit("--adaptive runs the whole span as one device "
                             "while_loop; it does not compose with --traj "
                             "or --checkpoint-every")
        dt_max = args.dt if isinstance(args.dt, float) else 1.0
        kwargs = {} if sharded else {"backend": args.backend}
        t0 = time.perf_counter()
        k = w.update_adaptive(args.adaptive, dt_max=dt_max, **kwargs)
        w.block_until_ready()
        dt_wall = time.perf_counter() - t0
        print(f"t_span={args.adaptive} in {k} adaptive substeps, "
              f"{dt_wall:.2f}s", file=sys.stderr)
        if args.save:
            save_world_atomic(args.save, w, step=start + k)
            print(f"saved {args.save}", file=sys.stderr)
        return

    def advance(k):
        if sharded:
            w.update(args.dt, k)
        else:
            w.update(args.dt, k, backend=args.backend)
    # resume continues the checkpoint's step counter (run --state x --steps k
    # runs k MORE steps; the saved `step` metadata accumulates across runs)
    t0 = time.perf_counter()
    saved_at = None
    ran = args.steps  # substeps actually executed (--traj may round down)
    if args.traj:
        from .trajectory import save_trajectory

        spf = max(1, args.steps // max(1, args.frames))
        frames = args.steps // spf
        if sharded:
            traj = w.record(args.dt, frames, spf)
        else:
            from .trajectory import record_trajectory

            traj = record_trajectory(w, args.dt, frames, spf,
                                     backend=args.backend)
        save_trajectory(args.traj, traj, dt=np.float32(args.dt),
                        steps_per_frame=np.int64(spf))
        print(f"wrote {traj.shape} trajectory to {args.traj}", file=sys.stderr)
        # only frames*spf substeps actually ran; keep the accumulating
        # resume counter honest (it may be < args.steps)
        ran = frames * spf
    elif args.checkpoint_every and args.save:
        # preemption-safe long runs: atomic checkpoint every K substeps;
        # kill the process at any point and `run --state <save>` continues
        # from the last completed chunk
        done = 0
        while done < args.steps:
            k = min(args.checkpoint_every, args.steps - done)
            advance(k)
            w.block_until_ready()
            done += k
            save_world_atomic(args.save, w, step=start + done)
            saved_at = done
            print(f"checkpoint @ step {start + done} -> {args.save}",
                  file=sys.stderr)
    else:
        advance(args.steps)
        w.block_until_ready()
    dt_wall = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt_wall:.2f}s "
          f"({args.steps / dt_wall:.1f} steps/s, "
          f"{w.total_len * w.mass_len * args.steps / dt_wall:.3e} pairs/s)",
          file=sys.stderr)
    if args.save and saved_at != args.steps:
        save_world_atomic(args.save, w, step=start + ran)
        print(f"checkpoint -> {args.save}", file=sys.stderr)


def cmd_render(args) -> None:
    particles, _ = load_particles(args.state)
    cam = fit_camera(np.asarray(particles.pos), args.width, args.height)
    img = render_frame(particles, cam)
    save_ppm(args.out, img)
    print(f"wrote {img.shape} -> {args.out}", file=sys.stderr)


def cmd_gif(args) -> None:
    w, _ = _make_world(args)
    _resolve_dt(args, w)
    export_animation(
        w, args.out, frames=args.frames, steps_per_frame=args.steps_per_frame,
        dt=args.dt, width=args.width, height=args.height, backend=args.backend,
    )
    print(f"wrote {args.frames} frames -> {args.out}", file=sys.stderr)


def cmd_view(args) -> None:
    w, _ = _make_world(args)
    _resolve_dt(args, w)
    if args.sdl:
        from .viewer_sdl import SdlViewer

        SdlViewer(w, phys_step=args.dt,
                  video_driver=args.video_driver).run(max_frames=args.max_frames)
    else:
        Viewer(w, phys_step=args.dt).run()


_SUBCOMMANDS = ("run", "render", "gif", "view")


def _fix_bare_compile_cache(argv):
    """Let the documented bare form ``--compile-cache run ...`` parse.

    With ``nargs='?'`` argparse would greedily consume the subcommand name
    as DIR; insert an explicit empty DIR when the next token is a
    subcommand or another option so both documented forms work.
    """
    argv = list(argv)
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok == "--compile-cache":
            nxt = argv[i + 1] if i + 1 < len(argv) else None
            if nxt is None or nxt in _SUBCOMMANDS or nxt.startswith("-"):
                argv.insert(i + 1, "")
            break
        if tok == "--platform":
            i += 2  # skip the flag AND its value (review r5: a value like
            continue  # 'cpu' must not read as "subcommand reached")
        if tok in _SUBCOMMANDS:
            break  # subcommand reached; later flags are its own
        i += 1
    return argv


def main(argv=None) -> None:
    if argv is None:
        argv = sys.argv[1:]
    argv = _fix_bare_compile_cache(argv)
    ap = argparse.ArgumentParser(prog="nbody_tpu", description=__doc__)
    ap.add_argument("--compile-cache", nargs="?", const="", default=None,
                    metavar="DIR",
                    help="persist XLA compilations to DIR (bare flag: "
                         "$NBODY_TPU_CACHE_DIR or ~/.cache/nbody_tpu/xla) "
                         "so repeat launches skip the 20-40 s cold jit "
                         "(utils.enable_compile_cache). A DIR that collides "
                         "with a subcommand name needs --compile-cache=DIR")
    ap.add_argument("--platform", default=None, metavar="P",
                    help="force a jax platform in-process before any device "
                         "touch (e.g. 'cpu' — the wedged-remote-device "
                         "escape named by DeviceUnreachableError; the "
                         "JAX_PLATFORMS env var is too late where a "
                         "sitecustomize preimports jax)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="headless simulation")
    _add_scene_args(p)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--adaptive", type=float, default=None, metavar="T_SPAN",
                   help="integrate a PHYSICAL time span with per-substep "
                        "adaptive dt instead of --steps fixed substeps "
                        "(World/ShardedWorld.update_adaptive; a numeric "
                        "--dt becomes the dt ceiling)")
    p.add_argument("--save", help="write final state checkpoint (.npz)")
    p.add_argument("--shard", action="store_true",
                   help="shard the run over every visible device "
                        "(ShardedWorld ring/collective backends; pod "
                        "slices — a 1-device mesh on a single chip)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="with --save: atomically rewrite the checkpoint "
                        "every K substeps (crash/preemption-safe; resume "
                        "with --state <save>); 0 = only at the end")
    p.add_argument("--traj", help="record trajectory to .npz")
    p.add_argument("--frames", type=int, default=100, help="trajectory frame count")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("render", help="rasterize a saved state to .ppm")
    p.add_argument("--state", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("gif", help="headless animated GIF")
    _add_scene_args(p)
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--steps-per-frame", type=int, default=4)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.set_defaults(fn=cmd_gif)

    p = sub.add_parser("view", help="interactive viewer (needs GUI backend)")
    _add_scene_args(p)
    p.add_argument("--sdl", action="store_true",
                   help="windowed pygame/SDL game loop instead of matplotlib")
    p.add_argument("--video-driver", default=None,
                   help="force an SDL video driver (e.g. 'dummy' for headless)")
    p.add_argument("--max-frames", type=int, default=None,
                   help="stop the SDL loop after N frames (smoke testing)")
    p.set_defaults(fn=cmd_view)

    args = ap.parse_args(argv)
    if args.platform:
        # must precede the first device touch; backends initialize lazily,
        # so config.update wins even though jax may already be imported
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache is not None:
        from .utils import enable_compile_cache
        enable_compile_cache(args.compile_cache or None)
    from .utils.device_check import (
        DeviceUnreachableError, check_device, looks_remote_attached)
    if args.platform != "cpu" and looks_remote_attached():
        # Remote-attached devices (TPU tunnels) can wedge such that the
        # first device touch blocks FOREVER; fail in seconds with the
        # remedy instead (round-4 VERDICT task 5). Local backends skip the
        # probe — they fail fast on their own. NBODY_TPU_NO_PROBE=1 skips.
        try:
            check_device(platform=args.platform,
                         log=lambda m: print(m, file=sys.stderr))
        except DeviceUnreachableError as e:
            print(f"nbody_tpu: {e}", file=sys.stderr)
            raise SystemExit(3)
    args.fn(args)


if __name__ == "__main__":
    main()
