from .p3m_forces import (
    p3m_acc,
    p3m_acc_collective,
    p3m_acc_from_bins,
    p3m_bins,
    p3m_cell_overflow,
)
from .pallas_forces import fused_substep, pallas_acc
from .pm_forces import pm_acc, pm_acc_collective, suggest_grid

__all__ = ["fused_substep", "pallas_acc", "pm_acc", "pm_acc_collective",
           "p3m_acc", "p3m_acc_collective", "p3m_acc_from_bins",
           "p3m_bins", "p3m_cell_overflow", "suggest_grid"]
