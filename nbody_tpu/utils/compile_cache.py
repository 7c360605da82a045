"""Persistent XLA compilation cache — cold-start latency for CLI/production runs.

The reference pays shader compilation once per process: SPIR-V is compiled
by the Vulkan driver every launch when it builds the compute pipeline
(``src/lib/sim_gpu.c``, pipeline creation; Vulkan offers VkPipelineCache for
this but the reference does not use it). On TPU the equivalent cost is much
larger — the first ``jit`` of a (config, shape) pair costs 20-40 s through
XLA — and JAX ships the equivalent fix: a persistent on-disk compilation
cache keyed by (HLO, compiler version, device kind). This module turns it on
with production-appropriate defaults, so the second launch of ``bench.py``,
``python -m nbody_tpu run`` or any user script starts hot.

Usage::

    from nbody_tpu.utils import enable_compile_cache
    enable_compile_cache()              # ~/.cache/nbody_tpu/xla (or
                                        # $NBODY_TPU_CACHE_DIR)
    enable_compile_cache("/fast/ssd")   # explicit location

or from the CLI: ``python -m nbody_tpu run --compile-cache [DIR] ...``.

Must run before the first compilation it should capture (earlier compiles
simply miss the cache; nothing breaks). Safe to call more than once; the
last directory wins. The cache is shared across processes — concurrent
writers are safe (JAX writes entries atomically) — and survives framework
upgrades because the key includes the jaxlib/XLA version, so a stale entry
is never *wrong*, only unused.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

# Compiles cheaper than this aren't worth a disk round-trip (matches JAX's
# own guidance for the knob; tiny jits recompile in milliseconds anyway).
_MIN_COMPILE_TIME_SECS = 1.0


def default_cache_dir() -> str:
    """$NBODY_TPU_CACHE_DIR, else ~/.cache/nbody_tpu/xla (XDG-aware)."""
    env = os.environ.get("NBODY_TPU_CACHE_DIR")
    if env:
        return env
    xdg = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(xdg, "nbody_tpu", "xla")


def enable_compile_cache(
    cache_dir: str | None = None,
    *,
    min_compile_time_secs: float = _MIN_COMPILE_TIME_SECS,
) -> str:
    """Enable JAX's persistent compilation cache and return the directory.

    Args:
      cache_dir: cache location; defaults to :func:`default_cache_dir`.
      min_compile_time_secs: only persist compilations that took at least
        this long (0 persists everything — useful in tests).

    Returns:
      The directory in use (created if absent).
    """
    path = Path(cache_dir or default_cache_dir())
    path.mkdir(parents=True, exist_ok=True)
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(path))
    if prev != str(path):
        # JAX materializes its persistent-cache singleton at first use; a
        # config update alone would leave a live cache pointed at whatever
        # directory was active then (even a since-unset one). Reset so the
        # next compile re-reads the config.
        from jax.experimental.compilation_cache import compilation_cache
        compilation_cache.reset_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # Entry size floor off: the time floor above is the real policy knob.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return str(path)


def cache_entries(cache_dir: str | None = None) -> int:
    """Number of persisted cache entries (0 if the directory is absent)."""
    path = Path(cache_dir or default_cache_dir())
    if not path.is_dir():
        return 0
    return sum(1 for f in path.rglob("*") if f.is_file())
