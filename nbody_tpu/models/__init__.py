"""Scene generators ("model families"): host-side (numpy) and device-side
(jax.random) spiral-galaxy initial conditions."""

from ..galaxy import make_galaxies
from .galaxy_device import make_galaxies_device
from .plummer import make_plummer_disk

__all__ = ["make_galaxies", "make_galaxies_device", "make_plummer_disk"]
