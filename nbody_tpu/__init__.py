"""nbody-tpu: a TPU-native 2D gravitational N-body simulation framework.

Built on JAX / XLA / Pallas. Same capabilities as the C/Vulkan reference
(Urist-McDeveloper/nbody): direct-sum softened gravity over a fixed particle
set (massive bodies exert force, everyone moves), semi-implicit Euler,
interchangeable backends, multi-substep batching, spiral-galaxy scene
generation, headless rendering, benchmarking — plus multi-chip sharding over a
TPU mesh, which the reference lacks.
"""

from .types import (
    G,
    DTYPE,
    GalaxyConfig,
    Particles,
    SimConfig,
    DEFAULT_GALAXY_CONFIG,
    DEFAULT_SIM_CONFIG,
    make_particles,
    zeros_particles,
    concat_particles,
)
from .forces import acc_from_particles, direct_sum_acc, pair_acc
from .galaxy import make_galaxies
from .models.galaxy_device import make_galaxies_device
from .world import (World, create_world, partition_massive_first,
                    resolve_backend, update_state)

__version__ = "0.1.0"

__all__ = [
    "G",
    "DTYPE",
    "GalaxyConfig",
    "Particles",
    "SimConfig",
    "DEFAULT_GALAXY_CONFIG",
    "DEFAULT_SIM_CONFIG",
    "make_particles",
    "zeros_particles",
    "concat_particles",
    "acc_from_particles",
    "direct_sum_acc",
    "pair_acc",
    "make_galaxies",
    "make_galaxies_device",
    "World",
    "create_world",
    "resolve_backend",
    "partition_massive_first",
    "update_state",
    "__version__",
]
