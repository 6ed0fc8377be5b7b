"""XZ2 ordering for extended (non-point) geometries.

Implements Böhm et al.'s XZ-ordering ("XZ-Ordering: A Space-Filling Curve
for Objects with Spatial Extension", SSD 1999) as used by GeoMesa for
non-point geometries (reference semantics:
geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/XZ2SFC.scala
::index/ranges/sequenceCode). One key per geometry — no duplication —
with *enlarged* quadtree cells: a geometry is stored at the smallest
cell whose 2×-enlarged extent contains its bbox.

``ranges(query_bbox)`` returns an over-approximating cover: every
geometry whose bbox intersects the query is guaranteed to have its key
inside one of the returned ranges (false positives allowed; callers
refine exactly).

From-scratch Python/NumPy implementation from the published algorithm.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["XZ2SFC"]


class XZ2SFC:
    """XZ2 curve over WGS84 lon/lat bounding boxes.

    g: maximum quadtree resolution (GeoMesa default 12).
    """

    def __init__(self, g: int = 12):
        self.g = g
        # number of sequence codes below a cell at level l (exclusive of
        # the cell itself): sum_{i=1..g-l} 4^i
        self._subtree = [
            (4 ** (g - l + 1) - 4) // 3 for l in range(g + 1)
        ]
        # contribution multiplier at level i: 1 + number of codes in one
        # child subtree = (4^(g-i) - 1) / 3
        self._level_mult = [(4 ** (g - i) - 1) // 3 for i in range(g + 1)]
        self.lon_lo, self.lon_hi = -180.0, 180.0
        self.lat_lo, self.lat_hi = -90.0, 90.0

    # --- normalization -------------------------------------------------
    def _norm(self, xmin, ymin, xmax, ymax):
        nx0 = (np.clip(np.asarray(xmin, float), self.lon_lo, self.lon_hi) - self.lon_lo) / (
            self.lon_hi - self.lon_lo
        )
        nx1 = (np.clip(np.asarray(xmax, float), self.lon_lo, self.lon_hi) - self.lon_lo) / (
            self.lon_hi - self.lon_lo
        )
        ny0 = (np.clip(np.asarray(ymin, float), self.lat_lo, self.lat_hi) - self.lat_lo) / (
            self.lat_hi - self.lat_lo
        )
        ny1 = (np.clip(np.asarray(ymax, float), self.lat_lo, self.lat_hi) - self.lat_lo) / (
            self.lat_hi - self.lat_lo
        )
        return nx0, ny0, nx1, ny1

    # --- index ---------------------------------------------------------
    def index(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """Sequence code for each bbox (vectorized via per-row loop on a
        NumPy-normalized batch; g ≤ 12 steps per row)."""
        nx0, ny0, nx1, ny1 = self._norm(xmin, ymin, xmax, ymax)
        nx0 = np.atleast_1d(nx0)
        ny0 = np.atleast_1d(ny0)
        nx1 = np.atleast_1d(nx1)
        ny1 = np.atleast_1d(ny1)
        out = np.empty(len(nx0), dtype=np.int64)
        for i in range(len(nx0)):
            out[i] = self._index_one(nx0[i], ny0[i], nx1[i], ny1[i])
        return out

    def _length(self, nx0, ny0, nx1, ny1) -> int:
        """Cell length l: smallest cell whose doubled extent holds the box."""
        w = max(nx1 - nx0, ny1 - ny0)
        if w >= 0.5:
            return 0
        if w <= 0.0:
            l1 = self.g
        else:
            l1 = min(self.g, int(math.floor(math.log(w) / math.log(0.5))))
        # check the Böhm predicate at l1: does the enlarged cell at l1
        # containing (nx0, ny0) cover the whole box?
        if l1 == 0:
            return 0
        cw = 0.5 ** l1
        x1 = math.floor(nx0 / cw) * cw
        y1 = math.floor(ny0 / cw) * cw
        if x1 + 2 * cw >= nx1 and y1 + 2 * cw >= ny1:
            return l1
        return l1 - 1

    def _index_one(self, nx0, ny0, nx1, ny1) -> int:
        length = self._length(nx0, ny0, nx1, ny1)
        cs = 0
        xlo, xhi = 0.0, 1.0
        ylo, yhi = 0.0, 1.0
        for i in range(length):
            mult = self._level_mult[i]
            xc = (xlo + xhi) / 2
            yc = (ylo + yhi) / 2
            right = nx0 >= xc
            top = ny0 >= yc
            quad = (1 if right else 0) + (2 if top else 0)
            cs += 1 + quad * mult
            if right:
                xlo = xc
            else:
                xhi = xc
            if top:
                ylo = yc
            else:
                yhi = yc
        return cs

    # --- ranges ----------------------------------------------------------
    def ranges(
        self, bboxes, max_ranges: int = 2000
    ) -> list[tuple[int, int]]:
        """Inclusive sequence-code ranges covering every geometry whose
        bbox intersects any query bbox."""
        qs = []
        for xmin, ymin, xmax, ymax in bboxes:
            nx0, ny0, nx1, ny1 = self._norm(xmin, ymin, xmax, ymax)
            qs.append((float(nx0), float(ny0), float(nx1), float(ny1)))
        from collections import deque

        results: list[tuple[int, int]] = []
        # node: (cs_of_cell, level, xlo, ylo) — cell spans 0.5^level per dim.
        # BFS so a max_ranges cutoff over-covers at uniform (deep) level.
        stack: deque[tuple[int, int, float, float]] = deque([(0, 0, 0.0, 0.0)])
        while stack:
            cs, level, xlo, ylo = stack.popleft()
            w = 0.5 ** level
            # extended (doubled) cell
            ex_hi_x = xlo + 2 * w
            ex_hi_y = ylo + 2 * w
            contained = False
            overlaps = False
            for qx0, qy0, qx1, qy1 in qs:
                if xlo <= qx1 and ex_hi_x >= qx0 and ylo <= qy1 and ex_hi_y >= qy0:
                    overlaps = True
                    if qx0 <= xlo and qy0 <= ylo and qx1 >= ex_hi_x and qy1 >= ex_hi_y:
                        contained = True
                        break
            if not overlaps:
                continue
            if contained or level == self.g or len(results) + len(stack) >= max_ranges:
                # the cell code plus every descendant code
                results.append((cs, cs + self._subtree[level]))
                continue
            # the cell itself may hold matching geometries
            results.append((cs, cs))
            mult = self._level_mult[level]
            half = w / 2
            for quad in range(4):
                cx = xlo + (half if quad & 1 else 0.0)
                cy = ylo + (half if quad & 2 else 0.0)
                stack.append((cs + 1 + quad * mult, level + 1, cx, cy))

        results.sort()
        merged: list[list[int]] = []
        for lo, hi in results:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        return [(lo, hi) for lo, hi in merged]
