"""Vectorized Z-order (Morton) space-filling curves: Z2 (lon/lat) and Z3
(lon/lat/time-offset).

Semantics follow the GeoMesa reference curves (reference:
geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/Z2SFC.scala,
Z3SFC.scala and the vendored sfcurve Z2/Z3/ZN zranges with LITMAX/BIGMIN
pruning — geomesa-z3/.../zorder/sfcurve/ZN.scala::zranges). This is a
from-scratch NumPy implementation, not a port: bulk ``index``/``invert``
are vectorized over arrays (the hot path, called from pandas UDFs);
range planning runs driver-side in pure Python on a handful of boxes.

Z2: 31 bits per dimension -> 62-bit key.
Z3: 21 bits per dimension -> 63-bit key, time binned per BinnedTime.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "part1by1",
    "compact1by1",
    "part1by2",
    "compact1by2",
    "NormalizedDimension",
    "Z2SFC",
    "Z3SFC",
    "zranges",
]

_U = np.uint64


def _u64(x) -> np.ndarray:
    return np.asarray(x).astype(np.uint64)


def part1by1(x) -> np.ndarray:
    """Spread the low 32 bits of x so bit i lands at position 2i."""
    x = _u64(x) & _U(0xFFFFFFFF)
    x = (x | (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x3333333333333333)
    x = (x | (x << _U(1))) & _U(0x5555555555555555)
    return x


def compact1by1(z) -> np.ndarray:
    """Inverse of part1by1: gather bits at even positions into the low 32."""
    z = _u64(z) & _U(0x5555555555555555)
    z = (z | (z >> _U(1))) & _U(0x3333333333333333)
    z = (z | (z >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    z = (z | (z >> _U(4))) & _U(0x00FF00FF00FF00FF)
    z = (z | (z >> _U(8))) & _U(0x0000FFFF0000FFFF)
    z = (z | (z >> _U(16))) & _U(0x00000000FFFFFFFF)
    return z


def part1by2(x) -> np.ndarray:
    """Spread the low 21 bits of x so bit i lands at position 3i."""
    x = _u64(x) & _U(0x1FFFFF)
    x = (x | (x << _U(32))) & _U(0x1F00000000FFFF)
    x = (x | (x << _U(16))) & _U(0x1F0000FF0000FF)
    x = (x | (x << _U(8))) & _U(0x100F00F00F00F00F)
    x = (x | (x << _U(4))) & _U(0x10C30C30C30C30C3)
    x = (x | (x << _U(2))) & _U(0x1249249249249249)
    return x


def compact1by2(z) -> np.ndarray:
    """Inverse of part1by2."""
    z = _u64(z) & _U(0x1249249249249249)
    z = (z | (z >> _U(2))) & _U(0x10C30C30C30C30C3)
    z = (z | (z >> _U(4))) & _U(0x100F00F00F00F00F)
    z = (z | (z >> _U(8))) & _U(0x1F0000FF0000FF)
    z = (z | (z >> _U(16))) & _U(0x1F00000000FFFF)
    z = (z | (z >> _U(32))) & _U(0x1FFFFF)
    return z


class NormalizedDimension:
    """Maps a continuous dimension [min, max] onto [0, 2^bits).

    Mirrors geomesa-z3/.../curve/NormalizedDimension.scala semantics:
    floor-binning on normalize, bin-center on denormalize, values clamped
    to the domain.
    """

    def __init__(self, lo: float, hi: float, bits: int):
        self.lo = float(lo)
        self.hi = float(hi)
        self.bins = 1 << bits
        self.max_index = self.bins - 1
        self._scale = self.bins / (self.hi - self.lo)
        self._inv = (self.hi - self.lo) / self.bins

    def normalize(self, v) -> np.ndarray:
        v = np.asarray(v, dtype=np.float64)
        i = np.floor((np.clip(v, self.lo, self.hi) - self.lo) * self._scale)
        return np.minimum(i, self.max_index).astype(np.int64)

    def denormalize(self, i) -> np.ndarray:
        i = np.asarray(i, dtype=np.float64)
        return self.lo + (i + 0.5) * self._inv


class Z2SFC:
    """2-D Morton curve over WGS84 lon/lat at 31 bits per dimension.

    Reference semantics: geomesa-z3/.../curve/Z2SFC.scala (index, invert,
    ranges).
    """

    BITS = 31

    def __init__(self, bits: int = 31):
        self.bits = bits
        self.lon = NormalizedDimension(-180.0, 180.0, bits)
        self.lat = NormalizedDimension(-90.0, 90.0, bits)

    def index(self, lon, lat) -> np.ndarray:
        x = self.lon.normalize(lon)
        y = self.lat.normalize(lat)
        return (part1by1(x) | (part1by1(y) << _U(1))).astype(np.int64)

    def invert(self, z):
        z = _u64(z)
        x = compact1by1(z).astype(np.int64)
        y = compact1by1(z >> _U(1)).astype(np.int64)
        return self.lon.denormalize(x), self.lat.denormalize(y)

    def ranges(self, bboxes, max_ranges: int = 1000) -> list[tuple[int, int]]:
        """Inclusive z-ranges covering every point inside any bbox.

        bboxes: iterable of (xmin, ymin, xmax, ymax) in degrees.
        """
        boxes = []
        for xmin, ymin, xmax, ymax in bboxes:
            boxes.append(
                (
                    int(self.lon.normalize(xmin)),
                    int(self.lon.normalize(xmax)),
                    int(self.lat.normalize(ymin)),
                    int(self.lat.normalize(ymax)),
                )
            )
        return zranges(boxes, self.bits, 2, max_ranges)


class Z3SFC:
    """3-D Morton curve over (lon, lat, time-offset-in-bin) at 21 bits/dim.

    Reference semantics: geomesa-z3/.../curve/Z3SFC.scala. Time offsets are
    millis within a BinnedTime period bin (week by default), normalized to
    [0, 2^21).
    """

    BITS = 21
    WEEK_MILLIS = 7 * 24 * 3600 * 1000

    def __init__(self, bits: int = 21, t_max: float | None = None):
        self.bits = bits
        self.lon = NormalizedDimension(-180.0, 180.0, bits)
        self.lat = NormalizedDimension(-90.0, 90.0, bits)
        self.time = NormalizedDimension(0.0, float(t_max or self.WEEK_MILLIS), bits)

    def index(self, lon, lat, t_offset_millis) -> np.ndarray:
        x = self.lon.normalize(lon)
        y = self.lat.normalize(lat)
        t = self.time.normalize(t_offset_millis)
        z = part1by2(x) | (part1by2(y) << _U(1)) | (part1by2(t) << _U(2))
        return z.astype(np.int64)

    def invert(self, z):
        z = _u64(z)
        x = compact1by2(z).astype(np.int64)
        y = compact1by2(z >> _U(1)).astype(np.int64)
        t = compact1by2(z >> _U(2)).astype(np.int64)
        return (
            self.lon.denormalize(x),
            self.lat.denormalize(y),
            self.time.denormalize(t),
        )

    def ranges(
        self,
        bboxes,
        t_intervals,
        max_ranges: int = 1000,
    ) -> list[tuple[int, int]]:
        """Inclusive z-ranges covering bbox × time-offset-interval cubes.

        t_intervals: iterable of (t_lo_millis, t_hi_millis) offsets within
        one time bin (callers iterate per bin, as the reference does).
        """
        boxes = []
        for xmin, ymin, xmax, ymax in bboxes:
            for tlo, thi in t_intervals:
                boxes.append(
                    (
                        int(self.lon.normalize(xmin)),
                        int(self.lon.normalize(xmax)),
                        int(self.lat.normalize(ymin)),
                        int(self.lat.normalize(ymax)),
                        int(self.time.normalize(tlo)),
                        int(self.time.normalize(thi)),
                    )
                )
        return zranges(boxes, self.bits, 3, max_ranges)


def zranges(
    boxes: list[tuple],
    bits: int,
    dims: int,
    max_ranges: int = 1000,
) -> list[tuple[int, int]]:
    """Compute inclusive z-value ranges covering integer query boxes.

    Pure-Python quadtree/octree recursion equivalent to sfcurve's
    LITMAX/BIGMIN zdivide pruning (reference:
    geomesa-z3/.../zorder/sfcurve/ZN.scala::zranges): descend the prefix
    tree, emit an exact range when a node is fully contained in a query
    box, recurse when it overlaps, stop and over-cover when the range
    budget is hit. Driver-side planning only — O(max_ranges) work.

    boxes: per-box inclusive normalized int bounds, dims pairs:
      2-D: (xlo, xhi, ylo, yhi); 3-D: (xlo, xhi, ylo, yhi, tlo, thi)
    """
    if not boxes:
        return []
    norm = []
    for b in boxes:
        lows = b[0::2]
        highs = b[1::2]
        norm.append((tuple(lows), tuple(highs)))

    from collections import deque

    n_children = 1 << dims
    results: list[tuple[int, int]] = []
    # node: (prefix z-value of the cell, level, per-dim integer low coords)
    # cell at level l spans 2^(bits-l) per dim; z-range width (2^(bits-l))^dims
    stack = deque([(0, 0, (0,) * dims)])
    # soft budget (BFS so a budget cutoff over-covers at uniform depth,
    # mirroring the reference's bounded-maxRanges loosening):
    while stack:
        prefix, level, lows = stack.popleft()
        side = 1 << (bits - level)
        his = tuple(lo + side - 1 for lo in lows)

        contained = False
        overlaps = False
        for qlo, qhi in norm:
            o = all(lows[d] <= qhi[d] and his[d] >= qlo[d] for d in range(dims))
            if not o:
                continue
            overlaps = True
            if all(lows[d] >= qlo[d] and his[d] <= qhi[d] for d in range(dims)):
                contained = True
                break
        if not overlaps:
            continue
        width = 1 << (dims * (bits - level))
        if contained or level == bits or len(results) + len(stack) >= max_ranges:
            results.append((prefix, prefix + width - 1))
            continue
        child_width = width >> dims
        half = side >> 1
        for c in range(n_children):
            clo = tuple(lows[d] + (half if (c >> d) & 1 else 0) for d in range(dims))
            stack.append((prefix + c * child_width, level + 1, clo))

    results.sort()
    merged: list[list[int]] = []
    for lo, hi in results:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]
