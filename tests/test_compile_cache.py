"""Persistent XLA compilation cache (utils/compile_cache.py).

The TPU counterpart of a Vulkan pipeline cache the reference never added
(its driver recompiles SPIR-V every launch, src/lib/sim_gpu.c): persisted
executables make repeat launches skip the cold jit.
"""

import uuid

import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.app import main
from nbody_tpu.utils import cache_entries, default_cache_dir, enable_compile_cache
from nbody_tpu.utils.compile_cache import _MIN_COMPILE_TIME_SECS


@pytest.fixture
def restore_cache_config():
    """Leave the process-global cache config as we found it."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)


def test_entries_persist_and_are_counted(tmp_path, restore_cache_config):
    cache = str(tmp_path / "xla")
    assert cache_entries(cache) == 0  # absent dir counts as empty
    got = enable_compile_cache(cache, min_compile_time_secs=0.0)
    assert got == cache

    # A fresh constant makes the HLO unique, forcing a real compile + persist
    # rather than an in-memory executable-cache hit from an earlier test.
    salt = float(uuid.uuid4().int % 997)

    @jax.jit
    def f(x):
        return jnp.sin(x) * salt

    f(jnp.arange(64, dtype=jnp.float32)).block_until_ready()
    assert cache_entries(cache) > 0


def test_cli_flag_enables_cache(tmp_path, restore_cache_config):
    """--compile-cache DIR wires the cache before the run's first jit.

    Entry persistence is floor-gated (tiny CPU compiles finish < 1 s), so the
    CLI assertion is config-level; the persistence path itself is covered
    above.
    """
    cache = str(tmp_path / "cli_xla")
    main(["--compile-cache", cache, "run", "--n", "250", "--galaxies", "1",
          "--steps", "2"])
    assert jax.config.jax_compilation_cache_dir == cache
    assert (tmp_path / "cli_xla").is_dir()
    assert jax.config.jax_persistent_cache_min_compile_time_secs == pytest.approx(
        _MIN_COMPILE_TIME_SECS)


def test_default_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("NBODY_TPU_CACHE_DIR", str(tmp_path / "envcache"))
    assert default_cache_dir() == str(tmp_path / "envcache")
    monkeypatch.delenv("NBODY_TPU_CACHE_DIR")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    assert default_cache_dir() == str(tmp_path / "xdg" / "nbody_tpu" / "xla")

def test_cli_bare_flag_before_subcommand(tmp_path, restore_cache_config,
                                         monkeypatch):
    """The documented bare form: --compile-cache run ... (round-4 ADVICE).

    With nargs='?' argparse used to eat the subcommand name as DIR; the
    argv preprocessor must keep both forms working.
    """
    monkeypatch.setenv("NBODY_TPU_CACHE_DIR", str(tmp_path / "barecache"))
    main(["--compile-cache", "run", "--n", "250", "--galaxies", "1",
          "--steps", "2"])
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "barecache")
    assert (tmp_path / "barecache").is_dir()


def test_recall_with_new_dir_redirects_live_cache(tmp_path,
                                                  restore_cache_config):
    """Re-calling with a different directory must redirect entries even
    after the cache singleton initialized (round-4 ADVICE: reset_cache)."""
    first = str(tmp_path / "first")
    second = str(tmp_path / "second")
    enable_compile_cache(first, min_compile_time_secs=0.0)

    salt = float(uuid.uuid4().int % 1009)

    @jax.jit
    def f(x):
        return jnp.cos(x) + salt

    f(jnp.arange(32, dtype=jnp.float32)).block_until_ready()
    assert cache_entries(first) > 0

    enable_compile_cache(second, min_compile_time_secs=0.0)
    salt2 = float(uuid.uuid4().int % 1013)

    @jax.jit
    def g(x):
        return jnp.tan(x) * salt2

    g(jnp.arange(32, dtype=jnp.float32)).block_until_ready()
    assert cache_entries(second) > 0
