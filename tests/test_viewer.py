"""Viewer control-state machine (reference key semantics, main.c:63-163) and
headless animation export — no GUI needed."""

import types
from helpers import TINY

import numpy as np

from nbody_tpu import create_world, make_galaxies
from nbody_tpu.types import SimConfig
from nbody_tpu.viewer import DEF_STEP_IDX, SPEEDS, STEPS, Viewer, export_animation


def make_viewer():
    w = create_world(make_galaxies(200, 1, seed=6), config=TINY, default_backend="jnp")
    return Viewer(w)


def key(name):
    return types.SimpleNamespace(key=name)


def test_speed_and_step_keys_clamped():
    v = make_viewer()
    assert v.speed_idx == 0 and v.step_idx == DEF_STEP_IDX
    v.on_key(key("left"))  # already minimum
    assert v.speed_idx == 0
    for _ in range(20):
        v.on_key(key("right"))
    assert v.speed_idx == len(SPEEDS) - 1
    for _ in range(20):
        v.on_key(key("up"))
    assert v.step_idx == len(STEPS) - 1
    for _ in range(20):
        v.on_key(key("down"))
    assert v.step_idx == 0


def test_pause_and_backend_toggle():
    v = make_viewer()
    assert not v.pause
    v.on_key(key(" "))
    assert v.pause
    before = np.asarray(v.world.particles.pos).copy()
    v.advance()  # paused: no movement
    np.testing.assert_array_equal(np.asarray(v.world.particles.pos), before)
    v.on_key(key(" "))
    v.advance()
    assert not np.array_equal(np.asarray(v.world.particles.pos), before)
    gpu0 = v.use_gpu
    v.on_key(key("tab"))
    assert v.use_gpu != gpu0


def test_advance_runs_speed_substeps():
    v = make_viewer()
    v.speed_idx = 2  # 4 substeps per frame
    w2 = create_world(make_galaxies(200, 1, seed=6), config=TINY, default_backend="jnp")
    v.advance()
    w2.update(0.01 * STEPS[DEF_STEP_IDX], SPEEDS[2], backend="jnp")
    np.testing.assert_array_equal(
        np.asarray(v.world.particles.pos), np.asarray(w2.particles.pos)
    )


def test_export_animation_npz(tmp_path):
    w = create_world(make_galaxies(200, 1, seed=8), config=TINY, default_backend="jnp")
    path = str(tmp_path / "frames.npz")
    export_animation(w, path, frames=3, steps_per_frame=1, width=64, height=48)
    with np.load(path) as d:
        assert d["frames"].shape == (3, 48, 64, 3)
        assert d["frames"].dtype == np.uint8


def test_accumulator_frame_skip_guard():
    """main.c:140-163: banked time is capped at MAX_OVERWORK*speed ticks and
    the skip counter increments while saturated, resets when caught up."""
    from nbody_tpu.viewer import PHYS_STEP

    v = make_viewer()
    v.speed_idx = 0  # speed 1
    # a catastrophic 10-second frame: accumulator clamps to MAX_OVERWORK ticks
    v.advance(frame_time=10.0)
    assert v.skipped_frames == 1
    # clamped bank means at most MAX_OVERWORK updates ran; afterwards the
    # leftover is < PHYS_STEP
    assert 0.0 <= v.phys_time < PHYS_STEP
    # healthy frames reset the counter
    v.advance(frame_time=PHYS_STEP)
    assert v.skipped_frames == 0


def test_accumulator_banks_fractional_frames():
    from nbody_tpu.viewer import PHYS_STEP

    v = make_viewer()
    p0 = np.asarray(v.world.particles.pos).copy()
    v.advance(frame_time=0.4 * PHYS_STEP)  # not enough for a tick
    np.testing.assert_array_equal(np.asarray(v.world.particles.pos), p0)
    v.advance(frame_time=0.7 * PHYS_STEP)  # 1.1 ticks banked -> 1 update
    assert not np.array_equal(np.asarray(v.world.particles.pos), p0)


def make_attached_viewer():
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    v = make_viewer()
    fig, ax = plt.subplots(figsize=(8, 6), dpi=100)
    ax.set_xlim(-100.0, 100.0)
    ax.set_ylim(-75.0, 75.0)
    fig.canvas.draw()  # realize the window extent for zoom()
    v.attach(fig, ax)
    return v, fig, ax


def test_wasd_pan_semantics():
    # main.c:71-85: pan CAMERA_SPEED_DELTA/(zoom*fps); W pans the view up
    from nbody_tpu.viewer import CAMERA_SPEED_DELTA, NOMINAL_KEY_FPS

    v, fig, ax = make_attached_viewer()
    z = v.zoom()
    d = CAMERA_SPEED_DELTA / (z * NOMINAL_KEY_FPS)
    x0, x1 = ax.get_xlim()
    y0, y1 = ax.get_ylim()
    v.on_key(key("d"))
    assert ax.get_xlim() == (x0 + d, x1 + d)
    v.on_key(key("a"))
    assert ax.get_xlim() == (x0, x1)
    v.on_key(key("w"))
    assert ax.get_ylim() == (y0 + d, y1 + d)
    v.on_key(key("s"))
    assert ax.get_ylim() == (y0, y1)
    # 'a' must pan, not toggle the overlay ('o' does that now)
    assert v.overlay
    v.on_key(key("o"))
    assert not v.overlay


def test_wheel_zoom_to_pointer():
    # main.c:88-94 + 104-110: zoom *= 1.1 and the world point under the
    # pointer stays at the same axes fraction
    v, fig, ax = make_attached_viewer()
    px, py = 40.0, -30.0
    x0, x1 = ax.get_xlim()
    frac_x = (px - x0) / (x1 - x0)
    span0 = x1 - x0

    ev = types.SimpleNamespace(step=1, xdata=px, ydata=py)
    v.on_scroll(ev)
    nx0, nx1 = ax.get_xlim()
    assert np.isclose((nx1 - nx0), span0 / 1.1)
    assert np.isclose((px - nx0) / (nx1 - nx0), frac_x)

    ev = types.SimpleNamespace(step=-1, xdata=px, ydata=py)
    v.on_scroll(ev)
    # zoom out by 1-0.1 (reference multiplies by 0.9, not divides by 1.1)
    nx0b, nx1b = ax.get_xlim()
    assert np.isclose(nx1b - nx0b, (span0 / 1.1) / 0.9)
    assert np.isclose((px - nx0b) / (nx1b - nx0b), frac_x)


def test_middle_drag_pan():
    v, fig, ax = make_attached_viewer()
    z = v.zoom()
    x0, x1 = ax.get_xlim()
    v.on_press(types.SimpleNamespace(button=2, x=400.0, y=300.0))
    v.on_motion(types.SimpleNamespace(x=410.0, y=300.0))  # 10 px right
    nx0, nx1 = ax.get_xlim()
    assert np.isclose(nx0, x0 - 10.0 / z) and np.isclose(nx1, x1 - 10.0 / z)
    v.on_release(types.SimpleNamespace(button=2))
    v.on_motion(types.SimpleNamespace(x=500.0, y=300.0))  # no drag: no-op
    assert ax.get_xlim() == (nx0, nx1)
    # left button must NOT drag (reference uses middle, main.c:97)
    v.on_press(types.SimpleNamespace(button=1, x=0.0, y=0.0))
    v.on_motion(types.SimpleNamespace(x=50.0, y=0.0))
    assert ax.get_xlim() == (nx0, nx1)


def test_diagnostics_panel_toggle():
    """'e' appends the physics panel (energy/momentum/L/dt*) to the overlay;
    toggling off removes it. Values come from nbody_tpu.diagnostics."""
    v = make_viewer()
    v.advance()  # populate acc so dt* is finite
    base = v.overlay_text(100.0)
    assert "E = " not in base
    v.on_key(key("e"))
    on = v.overlay_text(100.0)
    assert "E = " in on and "|P| = " in on and "dt* = " in on
    # the E value is the actual total energy of the world
    from nbody_tpu.diagnostics import total_energy

    e = float(total_energy(v.world.state.slice_to(v.world.total_len),
                           v.world.mass_len))
    assert f"{e:.4e}" in on
    v.on_key(key("e"))
    assert "E = " not in v.overlay_text(100.0)
