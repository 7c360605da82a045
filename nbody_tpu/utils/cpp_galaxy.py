"""ctypes loader for the native C++ scene generator (cpp/galaxy_gen.cpp).

A second, host-native implementation of the spiral-galaxy algorithm
(reference galaxy.c) — used as an alternative scene source and as a
structural cross-check for the Python generators.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from ..types import Particles, make_particles

_CPP_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "libnbody_galaxy.so"
_lib = None


class GeneratorUnavailable(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-s"], cwd=_CPP_DIR, check=True,
                           capture_output=True, text=True, timeout=120)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
                FileNotFoundError) as e:
            raise GeneratorUnavailable(str(e)) from e
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.nb_make_galaxies.argtypes = [
        ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32,
        f32p, f32p, f32p, f32p,
    ]
    lib.nb_make_galaxies.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (GeneratorUnavailable, OSError):
        return False


def make_galaxies_native(
    particle_count: int, galaxy_count: int, *, seed: int = 0
) -> Particles:
    """Generate a scene with the native C++ generator (own RNG stream;
    deterministic per seed; same distributions as the Python generators)."""
    lib = _load()
    n = particle_count
    pos = np.empty((n, 2), np.float32)
    vel = np.empty((n, 2), np.float32)
    mass = np.empty(n, np.float32)
    radius = np.empty(n, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.nb_make_galaxies(
        ctypes.c_uint64(seed), ctypes.c_uint32(n), ctypes.c_uint32(galaxy_count),
        pos.ctypes.data_as(f32p), vel.ctypes.data_as(f32p),
        mass.ctypes.data_as(f32p), radius.ctypes.data_as(f32p),
    )
    if rc == 2:
        raise ValueError("galaxy_count must be >= 1")
    if rc != 0:
        raise ValueError(
            f"need at least {galaxy_count * 100} particles for "
            f"{galaxy_count} galaxies, got {particle_count}"
        )
    return make_particles(pos, vel=vel, mass=mass, radius=radius)
