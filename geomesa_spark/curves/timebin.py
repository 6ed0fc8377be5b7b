"""Epoch-based time binning (reference:
geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/BinnedTime.scala).

A timestamp is split into ``(bin, offset)`` where ``bin`` counts whole
periods since the Unix epoch (NOT calendar-aligned — a week bin is
``millis // 604_800_000``) and ``offset`` is millis within the bin, so
``bin * period_millis + offset == original millis`` exactly.

Vectorized over NumPy int64 millisecond arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BinnedTime"]

_PERIOD_MILLIS = {
    "day": 24 * 3600 * 1000,
    "week": 7 * 24 * 3600 * 1000,
    "month": 30 * 24 * 3600 * 1000,  # fixed 30-day period, epoch-anchored
    "year": 365 * 24 * 3600 * 1000,  # fixed 365-day period, epoch-anchored
}


class BinnedTime:
    """Splits epoch-millis into (bin: int, offset_millis: int)."""

    def __init__(self, period: str = "week"):
        if period not in _PERIOD_MILLIS:
            raise ValueError(f"unknown period {period!r}; one of {sorted(_PERIOD_MILLIS)}")
        self.period = period
        self.period_millis = _PERIOD_MILLIS[period]

    def to_bin(self, millis):
        m = np.asarray(millis, dtype=np.int64)
        bins = np.floor_divide(m, self.period_millis)
        offsets = m - bins * self.period_millis
        return bins, offsets

    def from_bin(self, bins, offsets):
        return (
            np.asarray(bins, dtype=np.int64) * self.period_millis
            + np.asarray(offsets, dtype=np.int64)
        )

    def max_offset(self) -> int:
        return self.period_millis - 1
