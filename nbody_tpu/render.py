"""Headless device-side rendering: particles -> RGB framebuffer.

Replaces the reference's raylib viewer draw path (``src/main.c:237-250``),
which reads the whole particle array back to the host every frame (the
reference's own TODO, README.md:97: "Write Vulkan renderer so that particle
data never has to leave GPU"). Here rasterization is a jitted scatter onto a
device-resident framebuffer; only the final uint8 image crosses to the host,
and only when the caller asks.

Faithful visual semantics:
  * mass-class coloring (main.c:227-235): massless tracers / normal bodies /
    galaxy cores, with the reference's palette (main.c:20-23);
  * minimum on-screen radius 0.5/zoom (main.c:172, 241-249);
  * camera auto-fit from the particle bounding box (CreateCamera,
    main.c:198-225).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .types import DEFAULT_GALAXY_CONFIG, DTYPE, Particles

# Reference palette (main.c:20-23): background, core, normal, massless.
BG_COLOR = (22, 22, 22)
CC_COLOR = (222, 222, 222)
NP_COLOR = (175, 195, 175)
EP_COLOR = (145, 145, 233)

# Class ids used during rasterization; higher id wins on overlap
# (0 = empty background).
_CLASS_COLORS = np.array(
    [BG_COLOR, EP_COLOR, NP_COLOR, CC_COLOR], dtype=np.uint8
)


@dataclass(frozen=True)
class Camera:
    """2D camera: world-space center, zoom (pixels per world unit)."""

    center_x: float
    center_y: float
    zoom: float
    width: int = 1280
    height: int = 720


def fit_camera(
    pos: np.ndarray, width: int = 1280, height: int = 720, fill: float = 0.9
) -> Camera:
    """Auto-fit camera from the particle bounding box (main.c:198-225).

    Matches the reference: zoom shrinks to fit (never enlarges past 1.0),
    target is the bbox midpoint.
    """
    pos = np.asarray(pos)
    if pos.shape[0] == 0:
        return Camera(0.0, 0.0, 1.0, width, height)
    mn = pos.min(axis=0)
    mx = pos.max(axis=0)
    span = np.maximum(mx - mn, 1e-6)
    zoom_x = fill * width / span[0]
    zoom_y = fill * height / span[1]
    zoom = 1.0
    if zoom_x < 1.0 or zoom_y < 1.0:
        zoom = float(min(zoom_x, zoom_y))
    c = 0.5 * (mn + mx)
    return Camera(float(c[0]), float(c[1]), zoom, width, height)


def classify_mass(mass: jax.Array, min_core_mass: float | None = None) -> jax.Array:
    """ColorForMass classes (main.c:227-235): 1=massless, 2=normal, 3=core."""
    if min_core_mass is None:
        min_core_mass = DEFAULT_GALAXY_CONFIG.min_gc_mass
    return jnp.where(mass <= 0, 1, jnp.where(mass < min_core_mass, 2, 3)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("width", "height", "stamp", "min_core_mass"))
def rasterize(
    pos: jax.Array,
    radius: jax.Array,
    mass: jax.Array,
    center: jax.Array,  # (2,)
    zoom: jax.Array,  # scalar
    *,
    width: int = 1280,
    height: int = 720,
    stamp: int = 7,
    min_core_mass: float | None = None,
) -> jax.Array:
    """Rasterize particles into an (H, W, 3) uint8 framebuffer, on device.

    Each particle is splatted as a disk of pixel radius
    ``max(radius, 0.5/zoom) * zoom`` clamped to ``stamp//2`` (a fixed-size
    stamp keeps shapes static for XLA; cores zoomed-in beyond the stamp render
    as stamp-sized dots — use the matplotlib viewer for exact circles).
    Overlaps resolve by class priority: core > normal > massless (scatter-max
    of class id), matching the reference's draw order visually.
    """
    cls = classify_mass(mass, min_core_mass)
    # world -> pixel
    px = (pos[:, 0] - center[0]) * zoom + width / 2.0
    py = (pos[:, 1] - center[1]) * zoom + height / 2.0
    pr = jnp.maximum(radius * zoom, 0.5)  # min on-screen radius (main.c:172)

    half = stamp // 2
    offs = jnp.arange(-half, half + 1)
    ox, oy = jnp.meshgrid(offs, offs, indexing="ij")
    ox = ox.reshape(-1)  # (stamp^2,)
    oy = oy.reshape(-1)

    ix = jnp.round(px).astype(jnp.int32)[:, None] + ox[None, :]
    iy = jnp.round(py).astype(jnp.int32)[:, None] + oy[None, :]
    # inside-disk mask (pixel-center distance), clamped to the stamp
    d2 = (ox[None, :].astype(DTYPE)) ** 2 + (oy[None, :].astype(DTYPE)) ** 2
    rr = jnp.minimum(pr, float(half) + 0.5)[:, None]
    inside = d2 <= rr * rr
    inbounds = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
    ok = inside & inbounds

    flat_idx = jnp.where(ok, iy * width + ix, 0)
    vals = jnp.where(ok, cls[:, None], 0)

    grid = jnp.zeros((height * width,), jnp.int32)
    grid = grid.at[flat_idx.reshape(-1)].max(vals.reshape(-1))
    palette = jnp.asarray(_CLASS_COLORS)
    return palette[grid].reshape(height, width, 3)


def render_frame(particles: Particles, camera: Camera | None = None, **kw) -> np.ndarray:
    """Convenience host API: rasterize and fetch one frame."""
    if camera is None:
        camera = fit_camera(np.asarray(particles.pos), kw.pop("width", 1280), kw.pop("height", 720))
    img = rasterize(
        particles.pos,
        particles.radius,
        particles.mass,
        jnp.array([camera.center_x, camera.center_y], DTYPE),
        jnp.float32(camera.zoom),
        width=camera.width,
        height=camera.height,
        **kw,
    )
    return np.asarray(img)


def save_ppm(path: str, img: np.ndarray) -> None:
    """Dependency-free image export (binary PPM)."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())
