from .pallas_forces import fused_substep, pallas_acc
from .pm_forces import pm_acc, pm_acc_collective

__all__ = ["fused_substep", "pallas_acc", "pm_acc", "pm_acc_collective"]
