from .checkpoint import (
    load_particles,
    load_world,
    save_particles,
    save_world,
    save_world_atomic,
)
from .compile_cache import cache_entries, default_cache_dir, enable_compile_cache
from .device_check import (
    DeviceUnreachableError,
    check_device,
    looks_remote_attached,
    probe_device,
)

__all__ = ["load_particles", "load_world", "save_particles", "save_world",
           "save_world_atomic", "enable_compile_cache", "default_cache_dir",
           "cache_entries", "check_device", "probe_device",
           "looks_remote_attached", "DeviceUnreachableError"]
