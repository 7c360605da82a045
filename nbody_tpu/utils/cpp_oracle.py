"""ctypes loader for the native C++ AVX parity oracle (cpp/nbody_oracle.cpp).

Auto-builds the shared library with make on first use (g++; a few seconds).
Used only in parity tests — the native counterpart of the reference's CPU
backend (sim_cpu.c), validating the TPU kernels against an independent
host-native implementation.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from ..types import Particles, make_particles

_CPP_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "libnbody_oracle.so"
_lib = None


class OracleUnavailable(RuntimeError):
    pass


def _build() -> None:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_CPP_DIR, check=True,
            capture_output=True, text=True, timeout=120,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise OracleUnavailable(f"failed to build cpp oracle: {detail}") from e


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    for name in ("nb_oracle_update", "nb_oracle_update_scalar"):
        fn = getattr(lib, name)
        fn.argtypes = [f32p, f32p, f32p, f32p, f32p,
                       ctypes.c_uint32, ctypes.c_uint32,
                       ctypes.c_float, ctypes.c_uint32]
        fn.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OracleUnavailable:
        return False


def oracle_update(
    particles: Particles,
    mass_len: int,
    dt: float,
    n_steps: int,
    *,
    scalar: bool = False,
) -> Particles:
    """Run n_steps substeps with the native oracle. Input must already be in
    massive-first order (rows [0, mass_len) are the sources). Returns new
    host Particles; input is not modified."""
    lib = _load()
    pos = np.ascontiguousarray(np.asarray(particles.pos, np.float32)).copy()
    vel = np.ascontiguousarray(np.asarray(particles.vel, np.float32)).copy()
    acc = np.ascontiguousarray(np.asarray(particles.acc, np.float32)).copy()
    mass = np.ascontiguousarray(np.asarray(particles.mass, np.float32))
    radius = np.ascontiguousarray(np.asarray(particles.radius, np.float32))
    n = pos.shape[0]

    f32p = ctypes.POINTER(ctypes.c_float)
    fn = lib.nb_oracle_update_scalar if scalar else lib.nb_oracle_update
    fn(
        pos.ctypes.data_as(f32p), vel.ctypes.data_as(f32p), acc.ctypes.data_as(f32p),
        mass.ctypes.data_as(f32p), radius.ctypes.data_as(f32p),
        ctypes.c_uint32(n), ctypes.c_uint32(mass_len),
        ctypes.c_float(dt), ctypes.c_uint32(n_steps),
    )
    return make_particles(pos, vel=vel, acc=acc, mass=mass, radius=radius)
