from .zorder import Z2SFC, Z3SFC, part1by1, compact1by1, part1by2, compact1by2
from .xz import XZ2SFC
from .timebin import BinnedTime

__all__ = [
    "Z2SFC",
    "Z3SFC",
    "XZ2SFC",
    "BinnedTime",
    "part1by1",
    "compact1by1",
    "part1by2",
    "compact1by2",
]
