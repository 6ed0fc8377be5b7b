"""Query planning: spatial/temporal predicates → cell-range DataFrame
predicates.

The reference needs key-range planning + a custom Catalyst pushdown rule
(geomesa-index-api/.../index/planning/QueryPlanner.scala,
FilterSplitter.scala; spark sql SQLRules.SpatialOptimizationsRule)
because pushdown crosses into a foreign store. Here the "index" is a
plain int64 cell column on a parquet/Iceberg layout, so the planner just
computes z-ranges driver-side (pure Python, bounded work) and emits an
ordinary ``Column`` predicate — Catalyst pushes it into the parquet scan
(row-group min/max + partition pruning) with no custom rule (SURVEY.md
§4.3).

Two-phase contract: the returned predicate is COARSE (over-covers by
curve construction); callers conjoin the exact refinement (bbox compare /
PIP kernel) — Catalyst collapses both into one scan stage.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column
from pyspark.sql import functions as F

from geomesa_spark.curves import Z2SFC, Z3SFC, BinnedTime
from geomesa_spark.curves.xz import XZ2SFC

__all__ = [
    "z2_range_predicate",
    "z3_range_predicate",
    "xz2_range_predicate",
    "xz3_range_predicate",
    "bbox_predicate",
]

_Z2 = Z2SFC()
_Z3 = Z3SFC()
_XZ2 = XZ2SFC()
_BT = BinnedTime("week")


def _ranges_to_pred(col: Column, ranges: list[tuple[int, int]]) -> Column:
    if not ranges:
        return F.lit(False)
    terms = [col.between(lo, hi) for lo, hi in ranges]
    return functools.reduce(operator.or_, terms)


def z2_range_predicate(
    bboxes: list[tuple[float, float, float, float]],
    cell_col: str = "cell_z2",
    max_ranges: int = 64,
) -> Column:
    """Coarse predicate on the z2 cell column covering the given bboxes.

    max_ranges defaults small: each range is one parquet row-group
    pushdown term; 64 BETWEENs prune well without bloating the filter.
    """
    ranges = _Z2.ranges(bboxes, max_ranges=max_ranges)
    return _ranges_to_pred(F.col(cell_col), ranges)


def z3_range_predicate(
    bboxes: list[tuple[float, float, float, float]],
    t_lo_millis: int,
    t_hi_millis: int,
    bin_col: str = "epoch_bin",
    cell_col: str = "cell_z3",
    max_ranges_per_bin: int = 32,
) -> Column:
    """Coarse predicate on (epoch_bin, cell_z3) for bbox × time interval.

    Mirrors the reference's per-epoch-bin range planning
    (Z3IndexKeySpace.getRangeBytes): whole interior bins take the full
    cell range; the partial first/last bins get offset-restricted ranges.
    """
    lo_bin, lo_off = _BT.to_bin(t_lo_millis)
    hi_bin, hi_off = _BT.to_bin(t_hi_millis)
    lo_bin, lo_off, hi_bin, hi_off = int(lo_bin), int(lo_off), int(hi_bin), int(hi_off)

    preds = []
    for b in range(lo_bin, hi_bin + 1):
        o_lo = lo_off if b == lo_bin else 0
        o_hi = hi_off if b == hi_bin else _BT.max_offset()
        ranges = _Z3.ranges(bboxes, [(o_lo, o_hi)], max_ranges=max_ranges_per_bin)
        preds.append((F.col(bin_col) == b) & _ranges_to_pred(F.col(cell_col), ranges))
    if not preds:
        return F.lit(False)
    return functools.reduce(operator.or_, preds)


def xz2_range_predicate(
    bboxes: list[tuple[float, float, float, float]],
    cell_col: str = "cell_xz2",
    max_ranges: int = 256,
) -> Column:
    """Coarse predicate on the XZ2 sequence-code column for layers of
    EXTENDED geometries (one key per geometry, reference XZ2SFC.ranges):
    selects every geometry whose bbox may intersect a query bbox;
    callers conjoin the exact intersection refine."""
    ranges = _XZ2.ranges(bboxes, max_ranges=max_ranges)
    return _ranges_to_pred(F.col(cell_col), ranges)


def xz3_range_predicate(
    bboxes: list[tuple[float, float, float, float]],
    t_lo_millis: int,
    t_hi_millis: int,
    bin_col: str = "epoch_bin",
    cell_col: str = "cell_xz3",
    max_ranges: int = 256,
) -> Column:
    """Coarse predicate for extended geometries × time interval
    (reference XZ3IndexKeySpace): every whole or partial epoch bin in
    the interval gets the XZ2 cover ranges (a geometry indexed in a bin
    may extend across it, so bins are not offset-restricted — the exact
    time refine conjoins afterwards)."""
    lo_bin = int(t_lo_millis // _BT.period_millis)
    hi_bin = int(t_hi_millis // _BT.period_millis)
    xz = _ranges_to_pred(F.col(cell_col), _XZ2.ranges(bboxes, max_ranges=max_ranges))
    return F.col(bin_col).between(lo_bin, hi_bin) & xz


def bbox_predicate(
    bbox: tuple[float, float, float, float],
    lon: str = "lon",
    lat: str = "lat",
) -> Column:
    """Exact bbox refinement predicate (closed bounds, matching the ANSI
    oracle's comparisons)."""
    x0, y0, x1, y1 = bbox
    return (
        (F.col(lon) >= x0) & (F.col(lon) <= x1) & (F.col(lat) >= y0) & (F.col(lat) <= y1)
    )
