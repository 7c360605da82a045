"""Interactive viewer (matplotlib) + headless animation export.

Capability counterpart of the reference raylib app (``src/main.c``), with the
same control semantics where they make sense off-hardware:

  SPACE  pause/unpause                 (main.c:129-137)
  TAB    toggle jnp/pallas backend     (main.c:112-116)
  LEFT/RIGHT  sim speed /2, x2          (SPEEDS, main.c:25)
  UP/DOWN     step multiplier           (STEPS, main.c:26)
  Q      quit                           (main.c:64)
  O      toggle overlay                 (ALT in the reference, main.c:65-67)
  E      physics panel                  (energy/momentum/L/dt*; beyond ref)
  W/A/S/D     pan the camera            (main.c:71-85)
  wheel       zoom to the pointer       (main.c:88-94, 104-110)
  middle-drag pan                       (main.c:97-101)

Camera semantics follow main.c:71-110: WASD pans CAMERA_SPEED_DELTA/zoom
world units per second (here per key-repeat event at a nominal event rate),
the wheel multiplies zoom by 1 +- CAMERA_ZOOM_DELTA, and zooming keeps the
world point under the pointer fixed (the reference's offset-to-mouse trick,
main.c:104-110, is equivalent to scaling the view limits about the pointer).
The fixed-timestep accumulator with frame-skip guard (main.c:140-163) is
preserved: each drawn frame advances SPEED substeps of PHYS_STEP*step_mult,
capped at MAX_OVERWORK*speed.

For headless use, :func:`export_animation` writes an animated GIF via the
device-side rasterizer (no per-frame host readback of anything but the
final uint8 frames).
"""

from __future__ import annotations

import numpy as np

from .render import (
    BG_COLOR,
    CC_COLOR,
    EP_COLOR,
    NP_COLOR,
    Camera,
    fit_camera,
    render_frame,
)
from .types import DEFAULT_GALAXY_CONFIG
from .world import World

# Reference timing constants (main.c:13-15, 25-33)
PHYS_STEP = 0.01
MAX_OVERWORK = 3
SPEEDS = [1, 2, 4, 8, 16, 32, 64, 128]
STEPS = [0.1, 0.25, 0.5, 1.0, 2.0, 4.0]
DEF_STEP_IDX = 3

# Reference camera constants (main.c:17-18)
CAMERA_SPEED_DELTA = 800.0  # px/s of pan at 1x zoom
CAMERA_ZOOM_DELTA = 0.1     # zoom factor change per wheel notch
# matplotlib delivers key-repeat events rather than per-frame key polling;
# one event is treated as 1/NOMINAL_KEY_FPS seconds of held key
NOMINAL_KEY_FPS = 30.0


def _rgb(c):
    return tuple(v / 255.0 for v in c)


class ControlState:
    """Front-end-agnostic control state: pause/backend/speed/step toggles and
    the fixed-timestep accumulator (main.c:58-60, 129-163 semantics). Shared
    by the matplotlib :class:`Viewer` and the SDL windowed loop
    (:class:`nbody_tpu.viewer_sdl.SdlViewer`); front-ends map their native
    events onto the ``cmd_*`` methods."""

    def __init__(self, world: World, phys_step: float = PHYS_STEP):
        self.world = world
        self.phys_step = phys_step
        self.pause = False
        self.overlay = True
        self.diagnostics = False  # E key: energy/momentum panel (opt-in)
        # TAB toggles jnp <-> the world's accelerated backend (pallas or
        # pallas_fused), honoring the world's default
        self.accel_backend = (
            world.default_backend if world.default_backend != "jnp" else "pallas"
        )
        self.use_gpu = world.default_backend != "jnp"
        self.speed_idx = 0
        self.step_idx = DEF_STEP_IDX
        # fixed-timestep accumulator state (main.c:58-60, 140-163)
        self.phys_time = 0.0
        self.skipped_frames = 0
        self._last_t: float | None = None

    # -- control semantics (main.c:112-137) ------------------------------
    def cmd_pause(self) -> None:
        self.pause = not self.pause
        # pausing resets the accumulator (main.c:129-137)
        self.phys_time = 0.0
        self.skipped_frames = 0

    def cmd_toggle_backend(self) -> None:
        self.use_gpu = not self.use_gpu
        self.phys_time = 0.0
        self.skipped_frames = 0

    def cmd_speed(self, delta: int) -> None:
        self.speed_idx = min(max(self.speed_idx + delta, 0), len(SPEEDS) - 1)

    def cmd_step(self, delta: int) -> None:
        self.step_idx = min(max(self.step_idx + delta, 0), len(STEPS) - 1)

    def cmd_overlay(self) -> None:
        self.overlay = not self.overlay

    def cmd_diagnostics(self) -> None:
        """Toggle the physics panel (E key): energy / momentum / angular
        momentum / suggested dt appended to the overlay. Opt-in because the
        exact potential is O(N·M); above ~64M pairs the panel switches to
        the mesh estimator (diagnostics.potential_energy_pm) and stays
        cheap at any N. Values refresh at most every 0.5 s of wall time."""
        self.diagnostics = not getattr(self, "diagnostics", False)
        self._diag_next = 0.0

    def diag_text(self) -> str:
        import time as _time

        now = _time.perf_counter()
        if now >= getattr(self, "_diag_next", 0.0):
            from .diagnostics import (angular_momentum, kinetic_energy,
                                      potential_energy, potential_energy_pm,
                                      suggest_dt, total_momentum)

            w = self.world
            cfg = w.config
            st = w.state.slice_to(w.total_len)
            ke = float(kinetic_energy(st))
            if w.total_len * w.mass_len <= 64_000_000:
                pe = float(potential_energy(st, w.mass_len, g=cfg.g))
                tag = ""
            else:
                # the world's own mesh/softening parameters, so the panel
                # measures drift in the same model the forces integrate
                pe = float(potential_energy_pm(
                    st, w.mass_len, grid=cfg.pm_grid,
                    softening=cfg.pm_softening, g=cfg.g))
                tag = " (mesh est.)"
            px, py = (float(x) for x in total_momentum(st))
            self._diag_text = (
                f"E = {ke + pe:.4e}{tag}  (K {ke:.3e} / U {pe:.3e})\n"
                f"|P| = {np.hypot(px, py):.3e}  L = "
                f"{float(angular_momentum(st)):.3e}\n"
                f"dt* = {float(suggest_dt(st)):.2e}"
            )
            self._diag_next = now + 0.5
        return self._diag_text

    def _colors(self, mass: np.ndarray) -> np.ndarray:
        min_core = DEFAULT_GALAXY_CONFIG.min_gc_mass
        out = np.empty((len(mass), 3))
        out[:] = _rgb(NP_COLOR)
        out[mass <= 0] = _rgb(EP_COLOR)
        out[mass >= min_core] = _rgb(CC_COLOR)
        return out

    def overlay_text(self, fps: float) -> str:
        mode = f"{self.accel_backend} (TPU)" if self.use_gpu else "jnp"
        state = " (paused)" if self.pause else ""
        warn = "\nSKIPPING FRAMES" if self.skipped_frames > MAX_OVERWORK else ""
        diag = ("\n" + self.diag_text()
                if getattr(self, "diagnostics", False) else "")
        return (
            f"{mode} simulation{state}\n"
            f"step x{STEPS[self.step_idx]:.2f}  speed x{SPEEDS[self.speed_idx]}\n"
            f"{fps:.0f} FPS"
            f"{warn}"
            f"{diag}"
        )

    def advance(self, frame_time: float | None = None) -> None:
        """Advance the sim by the accumulator rule (main.c:140-163): bank
        speed*frame_time seconds, run floor(banked/PHYS_STEP) substeps of
        size PHYS_STEP*step_mult, capped at MAX_OVERWORK*speed (excess
        time dropped and counted as skipped frames)."""
        if self.pause:
            return
        import time as _time

        now = _time.perf_counter()
        if frame_time is None:
            frame_time = 0.0 if self._last_t is None else now - self._last_t
        self._last_t = now

        speed = SPEEDS[self.speed_idx]
        if frame_time == 0.0:
            # first frame / headless tests: run one tick's worth
            self.phys_time += speed * self.phys_step
        else:
            self.phys_time += speed * frame_time
        max_overwork = speed * self.phys_step * MAX_OVERWORK
        if self.phys_time > max_overwork:
            self.phys_time = max_overwork
            self.skipped_frames += 1
        else:
            self.skipped_frames = 0

        updates = int(self.phys_time // self.phys_step)
        self.phys_time -= updates * self.phys_step
        if updates == 0:
            return
        step = self.phys_step * STEPS[self.step_idx]
        backend = self.accel_backend if self.use_gpu else "jnp"
        self.world.update(step, updates, backend=backend)


class Viewer(ControlState):
    """Matplotlib-based interactive viewer. Requires a GUI backend; for
    headless environments use :func:`export_animation`, for a real windowed
    game loop use :class:`nbody_tpu.viewer_sdl.SdlViewer`."""

    def __init__(self, world: World, phys_step: float = PHYS_STEP):
        super().__init__(world, phys_step)
        # camera state (attached axes + middle-drag tracking)
        self.ax = None
        self._drag_px: tuple[float, float] | None = None

    def on_key(self, event) -> None:
        k = (event.key or "").lower()
        if k == " ":
            self.cmd_pause()
        elif k == "tab":
            self.cmd_toggle_backend()
        elif k == "left":
            self.cmd_speed(-1)
        elif k == "right":
            self.cmd_speed(+1)
        elif k == "down":
            self.cmd_step(-1)
        elif k == "up":
            self.cmd_step(+1)
        elif k == "o":
            self.cmd_overlay()
        elif k == "e":
            self.cmd_diagnostics()
        elif k in ("w", "a", "s", "d"):
            self.pan_key(k)
        elif k == "q":
            # quit (main.c:64); closing all figures ends plt.show()
            import matplotlib.pyplot as plt

            plt.close("all")

    # -- camera (main.c:71-110 semantics on matplotlib view limits) -------
    def zoom(self) -> float:
        """Pixels per world unit of the attached axes (raylib camera.zoom)."""
        if self.ax is None:
            return 1.0
        x0, x1 = self.ax.get_xlim()
        width_px = self.ax.get_window_extent().width or 1.0
        return float(width_px / max(x1 - x0, 1e-12))

    def pan_key(self, k: str) -> None:
        """WASD pan: CAMERA_SPEED_DELTA / zoom world units per second of
        held key (main.c:71-85), one key-repeat event = 1/NOMINAL_KEY_FPS s.
        W pans the view up (the reference's target.y -= in a y-down screen
        space)."""
        if self.ax is None:
            return
        d = CAMERA_SPEED_DELTA / (self.zoom() * NOMINAL_KEY_FPS)
        dx = {"a": -d, "d": d}.get(k, 0.0)
        dy = {"s": -d, "w": d}.get(k, 0.0)
        x0, x1 = self.ax.get_xlim()
        y0, y1 = self.ax.get_ylim()
        self.ax.set_xlim(x0 + dx, x1 + dx)
        self.ax.set_ylim(y0 + dy, y1 + dy)

    def on_scroll(self, event) -> None:
        """Wheel zoom about the pointer (main.c:88-94 + the offset-to-mouse
        trick of main.c:104-110): zoom *= 1 +- CAMERA_ZOOM_DELTA; the world
        point under the pointer stays under the pointer."""
        if self.ax is None or event.xdata is None or event.ydata is None:
            return
        if event.step > 0:
            factor = 1.0 + CAMERA_ZOOM_DELTA   # zoom in -> span shrinks
        elif event.step < 0:
            factor = 1.0 - CAMERA_ZOOM_DELTA
        else:
            return
        px, py = event.xdata, event.ydata
        x0, x1 = self.ax.get_xlim()
        y0, y1 = self.ax.get_ylim()
        self.ax.set_xlim(px - (px - x0) / factor, px + (x1 - px) / factor)
        self.ax.set_ylim(py - (py - y0) / factor, py + (y1 - py) / factor)

    def on_press(self, event) -> None:
        if getattr(event, "button", None) == 2:  # middle (main.c:97)
            self._drag_px = (event.x, event.y)

    def on_release(self, event) -> None:
        if getattr(event, "button", None) == 2:
            self._drag_px = None

    def on_motion(self, event) -> None:
        """Middle-drag pan: target -= pixel_delta / zoom (main.c:97-101)."""
        if self.ax is None or self._drag_px is None:
            return
        z = self.zoom()
        dx = (event.x - self._drag_px[0]) / z
        dy = (event.y - self._drag_px[1]) / z
        self._drag_px = (event.x, event.y)
        x0, x1 = self.ax.get_xlim()
        y0, y1 = self.ax.get_ylim()
        self.ax.set_xlim(x0 - dx, x1 - dx)
        self.ax.set_ylim(y0 - dy, y1 - dy)

    def attach(self, fig, ax) -> None:
        """Wire the control handlers to a figure/axes pair (also used by the
        headless tests via synthetic events)."""
        self.ax = ax
        fig.canvas.mpl_connect("key_press_event", self.on_key)
        fig.canvas.mpl_connect("scroll_event", self.on_scroll)
        fig.canvas.mpl_connect("button_press_event", self.on_press)
        fig.canvas.mpl_connect("button_release_event", self.on_release)
        fig.canvas.mpl_connect("motion_notify_event", self.on_motion)

    def run(self, interval_ms: int = 10):
        import matplotlib
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation

        backend = matplotlib.get_backend().lower()
        if any(b in backend for b in ("agg", "pdf", "svg", "ps", "pgf", "template", "cairo")):
            raise RuntimeError(
                "no interactive matplotlib backend available (headless "
                "environment?) — use `python -m nbody_tpu gif` or "
                "nbody_tpu.viewer.export_animation for headless rendering"
            )

        host = self.world.particles
        fig, ax = plt.subplots(figsize=(12.8, 7.2))
        fig.patch.set_facecolor(_rgb(BG_COLOR))
        ax.set_facecolor(_rgb(BG_COLOR))
        ax.set_aspect("equal")
        pos = np.asarray(host.pos)
        scat = ax.scatter(pos[:, 0], pos[:, 1], s=1.5,
                          c=self._colors(np.asarray(host.mass)))
        pad = 0.05 * (pos.max(0) - pos.min(0) + 1)
        ax.set_xlim(pos[:, 0].min() - pad[0], pos[:, 0].max() + pad[0])
        ax.set_ylim(pos[:, 1].min() - pad[1], pos[:, 1].max() + pad[1])
        text = ax.text(0.01, 0.99, "", transform=ax.transAxes, va="top",
                       color="lime", family="monospace")
        self.attach(fig, ax)

        import time as _time

        fps_state = {"t": _time.perf_counter(), "frames": 0, "fps": 0.0}

        def frame(_):
            self.advance()
            host = self.world.particles
            scat.set_offsets(np.asarray(host.pos))
            fps_state["frames"] += 1
            now = _time.perf_counter()
            if now - fps_state["t"] >= 0.5:
                fps_state["fps"] = fps_state["frames"] / (now - fps_state["t"])
                fps_state["t"] = now
                fps_state["frames"] = 0
            text.set_text(self.overlay_text(fps_state["fps"]) if self.overlay else "")
            return scat, text

        anim = FuncAnimation(fig, frame, interval=interval_ms,
                             cache_frame_data=False)
        plt.show()
        return anim


def export_animation(
    world: World,
    path: str,
    frames: int = 100,
    steps_per_frame: int = 4,
    dt: float = PHYS_STEP,
    width: int = 640,
    height: int = 360,
    camera: Camera | None = None,
    backend: str | None = None,
    fps: int = 25,
) -> None:
    """Headless animation: simulate on device, rasterize on device, write an
    animated GIF (PIL). `path` ending in .npz saves raw uint8 frames instead."""
    if camera is None:
        camera = fit_camera(np.asarray(world.particles.pos), width, height)
    images = []
    for _ in range(frames):
        world.update(dt, steps_per_frame, backend=backend)
        # rasterize straight from device state (sliced on device) — only the
        # uint8 frame crosses to the host
        images.append(render_frame(world.state.slice_to(world.total_len), camera))
    arr = np.stack(images)
    if path.endswith(".npz"):
        np.savez_compressed(path, frames=arr)
        return
    from PIL import Image

    pil = [Image.fromarray(im) for im in arr]
    pil[0].save(path, save_all=True, append_images=pil[1:],
                duration=int(1000 / fps), loop=0)
