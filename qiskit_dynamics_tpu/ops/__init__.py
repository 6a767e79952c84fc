"""Low-level compute kernels (linear_combo, batched expm)."""
from .linear_combo import linear_combo
from .expm import expm_taylor

__all__ = ["linear_combo", "expm_taylor"]
