"""Headless renderer tests: camera autofit math (main.c:198-225), mass-class
colors (main.c:227-235), rasterization invariants."""

import numpy as np

from nbody_tpu import make_galaxies, make_particles
from nbody_tpu.render import (
    BG_COLOR,
    CC_COLOR,
    EP_COLOR,
    NP_COLOR,
    Camera,
    classify_mass,
    fit_camera,
    render_frame,
    save_ppm,
)
from nbody_tpu.types import DEFAULT_GALAXY_CONFIG


def test_fit_camera_centers_bbox():
    pos = np.array([[0.0, 0.0], [100.0, 50.0]], np.float32)
    cam = fit_camera(pos, width=1280, height=720)
    assert cam.center_x == 50.0 and cam.center_y == 25.0
    # bbox smaller than window -> zoom stays 1 (reference: never enlarges)
    assert cam.zoom == 1.0


def test_fit_camera_shrinks_to_fit():
    pos = np.array([[-10000.0, 0.0], [10000.0, 0.0], [0.0, -500.0], [0.0, 500.0]], np.float32)
    cam = fit_camera(pos, width=1280, height=720)
    assert cam.zoom == np.float32(0.9 * 1280 / 20000)


def test_classify_mass():
    min_core = DEFAULT_GALAXY_CONFIG.min_gc_mass
    cls = np.asarray(classify_mass(np.array([0.0, 5.0, min_core * 2], np.float32)))
    assert cls.tolist() == [1, 2, 3]


def test_render_smoke_colors_present():
    scene = make_galaxies(400, 1, seed=11037)
    img = render_frame(scene, width=320, height=240)
    assert img.shape == (240, 320, 3)
    colors = {tuple(c) for c in img.reshape(-1, 3)}
    assert tuple(BG_COLOR) in colors
    # at least particles of some class are visible
    assert colors & {tuple(CC_COLOR), tuple(NP_COLOR), tuple(EP_COLOR)}


def test_core_priority_over_tracer():
    # a core and a tracer at the same spot: core color wins
    p = make_particles(
        np.array([[0.0, 0.0], [0.0, 0.0]], np.float32),
        mass=np.array([2e9, 0.0], np.float32),  # > min_gc_mass (~1.005e9)
        radius=np.array([5.0, 0.5], np.float32),
    )
    img = render_frame(p, Camera(0.0, 0.0, 1.0, 64, 64))
    assert tuple(img[32, 32]) == tuple(CC_COLOR)


def test_offscreen_particles_clipped():
    p = make_particles(
        np.array([[1e6, 1e6]], np.float32),
        mass=np.array([1.0], np.float32),
        radius=np.array([2.0], np.float32),
    )
    img = render_frame(p, Camera(0.0, 0.0, 1.0, 32, 32))
    assert (img == np.array(BG_COLOR, np.uint8)).all()


def test_save_ppm(tmp_path):
    img = np.zeros((4, 5, 3), np.uint8)
    path = tmp_path / "frame.ppm"
    save_ppm(str(path), img)
    raw = path.read_bytes()
    assert raw.startswith(b"P6\n5 4\n255\n")
    assert len(raw) == len(b"P6\n5 4\n255\n") + 4 * 5 * 3
