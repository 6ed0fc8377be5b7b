"""Hilbert curve cell ids — the S2-style space-filling curve.

The reference's index layer is Z-order (Z2/Z3) and XZ; Google S2 — the
other cell system the north star names — linearizes the sphere with a
HILBERT curve instead, because consecutive Hilbert ids are always
4-adjacent cells (unit Manhattan step), where the Z curve takes long
diagonal jumps at quadrant seams. That makes Hilbert ids strictly
better range keys for "nearby things in nearby key ranges" locality
(fewer, longer ranges per bbox on average).

Two implementations of the SAME canonical algorithm (the classic
iterative bit-interleave with quadrant rotation; see Wikipedia
"Hilbert curve", Hamilton's compact-Hilbert-index TR for the general
form), kept bit-identical:

- ``hilbert_xy2d`` / ``hilbert_d2xy``: vectorized NumPy (the spec
  kernel, mirroring curves/zorder.py's role for Z2).
- ``hilbert_col``: a pure Column expression — ONE ``aggregate`` fold
  over the bit levels, integer shift/mask arithmetic only (the XOR in
  the textbook step is replaced by the equivalent polynomial
  3rx + ry − 2·rx·ry so no engine-specific xor operator is needed),
  whole-stage-codegen eligible, replayed level-for-level by the
  ``hilbert_cells`` DuckDB oracle as a recursive CTE.

No range planner is provided (Hilbert range decomposition needs the
rotation state per prefix — out of scope); use Z2's BIGMIN planner for
range scans and Hilbert ids for LOCALITY-sensitive layout (bucketing /
sorting / block assignment), which is how S2 deployments use them too.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["hilbert_xy2d", "hilbert_d2xy", "hilbert_col"]


def hilbert_xy2d(p: int, x, y):
    """Vectorized Hilbert index of integer cell coords in [0, 2^p)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    n = np.int64(1) << p
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate: where ry==0 → (flip when rx==1) then swap x/y
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, n - 1 - x, x)
        y2 = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def hilbert_d2xy(p: int, d):
    """Inverse: Hilbert index → (x, y), vectorized."""
    d = np.asarray(d, dtype=np.int64)
    n = np.int64(1) << p
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    s = np.int64(1)
    while s < n:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # rotate back
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        x = x + s * rx
        y = y + s * ry
        t //= 4
        s <<= 1
    return x, y


def hilbert_col(ix, iy, p: int) -> Column:
    """Hilbert index of integer cell-coordinate COLUMNS in [0, 2^p) —
    one fold over the p bit levels, integers end to end."""
    n = 1 << p
    expr = f"""
        aggregate(
          sequence({p - 1}, 0, -1),
          named_struct('x', CAST(({ix}) AS BIGINT), 'y', CAST(({iy}) AS BIGINT),
                       'd', CAST(0 AS BIGINT)),
          (a, i) -> named_struct(
            'x', IF(((a.y >> i) & 1) = 0,
                    IF(((a.x >> i) & 1) = 1, {n - 1} - a.y, a.y), a.x),
            'y', IF(((a.y >> i) & 1) = 0,
                    IF(((a.x >> i) & 1) = 1, {n - 1} - a.x, a.x), a.y),
            'd', a.d + CAST(1 AS BIGINT) * shiftleft(1L, 2 * i)
                 * (3 * ((a.x >> i) & 1) + ((a.y >> i) & 1)
                    - 2 * ((a.x >> i) & 1) * ((a.y >> i) & 1))),
          acc -> acc.d)
    """
    return F.expr(expr)
