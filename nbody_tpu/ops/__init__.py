from .pallas_forces import pallas_acc

__all__ = ["pallas_acc"]
