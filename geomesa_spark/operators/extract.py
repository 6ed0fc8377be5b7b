"""Geo-span extraction + cell assignment.

The engine's input is the interleaved document table
(doc_id, spans:array<struct<kind,text,media_ref,offset>>). Geometry
lives inside spans with kind='geo' as WKT in ``text``. Extraction is a
pure DataFrame pipeline: explode → filter → JVM regexp point parse →
lon/lat columns — everything whole-stage-codegen, zero Python in the
hot path. The original ``spans`` column is never modified, preserving
the span-sequence invariant (join extraction results back by doc_id
when both are needed).

Cell assignment replaces the reference's key generation
(geomesa-index-api/.../index/index/z2/Z2IndexKeySpace.scala::toIndexKey,
z3/Z3IndexKeySpace.scala). The Morton interleave itself is expressed as
built-in Column bit-arithmetic (the same 5-step bit-spread the NumPy
kernel in curves/zorder.py uses) so the whole scan → extract → encode →
join pipeline is one codegen'd JVM stage. The pandas-UDF variants remain
for parity tests and for callers that already hold Arrow batches.

Measured (local[16], 77K points, broadcast join + refine downstream):
JVM path 1.8s steady-state vs 19-60s with a pandas-UDF extraction
chained into the same stage — Python-runner chaining dominates
otherwise.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_spark.curves import Z2SFC, Z3SFC, BinnedTime

__all__ = [
    "extract_geo_points",
    "with_z2_cell",
    "with_z3_cell",
    "with_xz2_cell",
    "with_xz3_cell",
    "z2_col",
    "z3_col",
    "grid_cell",
    "z2_prefix",
    "parse_point_wkt",
    "Z2",
    "Z3",
    "WEEK_BT",
]

Z2 = Z2SFC()
Z3 = Z3SFC()
WEEK_BT = BinnedTime("week")

# POINT(x y) — tolerate optional space after POINT and inside parens
_POINT_RE = r"POINT\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)\s*\)"


_POINT_STRUCT = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)


@F.pandas_udf(_POINT_STRUCT)
def parse_point_wkt(wkt: pd.Series) -> pd.DataFrame:
    """Vectorized POINT-WKT parse over an Arrow batch (parity/test path;
    the hot path uses the JVM regexp in extract_geo_points)."""
    ext = wkt.str.extract(_POINT_RE)
    return pd.DataFrame(
        {"lon": pd.to_numeric(ext[0]), "lat": pd.to_numeric(ext[1])}
    )


@F.pandas_udf(T.LongType())
def _z2_index(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(Z2.index(lon.to_numpy(), lat.to_numpy()))


@F.pandas_udf(T.LongType())
def _z3_index(lon: pd.Series, lat: pd.Series, offset_millis: pd.Series) -> pd.Series:
    return pd.Series(
        Z3.index(lon.to_numpy(), lat.to_numpy(), offset_millis.to_numpy())
    )


@F.pandas_udf(T.LongType())
def _xz2_index(
    xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series
) -> pd.Series:
    from geomesa_spark.curves.xz import XZ2SFC

    sfc = XZ2SFC()
    return pd.Series(
        sfc.index(xmin.to_numpy(), ymin.to_numpy(), xmax.to_numpy(), ymax.to_numpy())
    )


def with_xz2_cell(
    df: DataFrame,
    xmin: str = "min_lon",
    ymin: str = "min_lat",
    xmax: str = "max_lon",
    ymax: str = "max_lat",
    out: str = "cell_xz2",
) -> DataFrame:
    """XZ2 sequence code for extended geometries from their envelope
    columns — ONE key per geometry (reference XZ2IndexKeySpace); pairs
    with plans.planner.xz2_range_predicate for bbox-query pruning."""
    return df.withColumn(out, _xz2_index(F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax)))


def with_xz3_cell(
    df: DataFrame,
    xmin: str = "min_lon",
    ymin: str = "min_lat",
    xmax: str = "max_lon",
    ymax: str = "max_lat",
    dtg: str = "dtg",
    bin_out: str = "epoch_bin",
    out: str = "cell_xz3",
) -> DataFrame:
    """XZ3 = XZ2 ⊗ binned time (reference XZ3IndexKeySpace): extended
    geometries with an event time get (epoch_bin, xz2-of-envelope) —
    the reference composes the same way (per-bin XZ planes). The time
    bin is plain column math; only the sequence code is a pandas UDF."""
    period = F.lit(WEEK_BT.period_millis)
    millis = (F.unix_timestamp(F.col(dtg)) * 1000 + F.date_format(F.col(dtg), "SSS").cast("long"))
    df = df.withColumn(bin_out, F.floor(millis / period).cast("int"))
    return with_xz2_cell(df, xmin, ymin, xmax, ymax, out)


def extract_geo_points(docs: DataFrame) -> DataFrame:
    """documents → doc_points(doc_id, span_offset, lon, lat).

    `posexplode` is not needed: span structs carry their own offset.
    Pure built-ins: explode, filter, regexp_extract, cast — one codegen
    stage fused with whatever consumes it.
    """
    geo = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "geo")
    )
    # try_cast, not cast: Catalyst may merge downstream predicates (e.g.
    # a z2 range filter) into this stage and evaluate them before the
    # kind='geo' conjunct — ANSI cast('') would throw on non-geo spans
    return geo.select(
        "doc_id",
        F.col("s.offset").alias("span_offset"),
        F.regexp_extract(F.col("s.text"), _POINT_RE, 1).try_cast("double").alias("lon"),
        F.regexp_extract(F.col("s.text"), _POINT_RE, 2).try_cast("double").alias("lat"),
    )


# --- Morton interleave as built-in Column bit-arithmetic -----------------
# Mirrors curves/zorder.py::part1by1 / part1by2 (NumPy) step for step; the
# NumPy kernels are the tested spec (tests assert column == kernel).

_SPREAD1_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]

_SPREAD2_STEPS = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def _spread(x: Column, steps) -> Column:
    for shift, mask in steps:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def _normalize(v: Column, lo: float, hi: float, bits: int) -> Column:
    bins = 1 << bits
    scale = bins / (hi - lo)
    i = F.floor((F.least(F.greatest(v, F.lit(lo)), F.lit(hi)) - lo) * scale)
    return F.least(i, F.lit(bins - 1)).cast("long")


def z2_col(lon: Column, lat: Column, bits: int = 31) -> Column:
    """Z2 cell id (reference Z2SFC.index) as a pure built-in expression."""
    x = _spread(_normalize(lon, -180.0, 180.0, bits), _SPREAD1_STEPS)
    y = _spread(_normalize(lat, -90.0, 90.0, bits), _SPREAD1_STEPS)
    return x.bitwiseOR(F.shiftleft(y, 1))


def z3_col(lon: Column, lat: Column, offset_millis: Column, bits: int = 21) -> Column:
    """Z3 cell id (reference Z3SFC.index) as a pure built-in expression."""
    x = _spread(_normalize(lon, -180.0, 180.0, bits), _SPREAD2_STEPS)
    y = _spread(_normalize(lat, -90.0, 90.0, bits), _SPREAD2_STEPS)
    t = _spread(
        _normalize(offset_millis.cast("double"), 0.0, float(WEEK_BT.period_millis), bits),
        _SPREAD2_STEPS,
    )
    return x.bitwiseOR(F.shiftleft(y, 1)).bitwiseOR(F.shiftleft(t, 2))


def with_z2_cell(df: DataFrame, lon: str = "lon", lat: str = "lat", out: str = "cell_z2") -> DataFrame:
    return df.withColumn(out, z2_col(F.col(lon), F.col(lat)))


def with_z3_cell(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
    bin_out: str = "epoch_bin",
    out: str = "cell_z3",
) -> DataFrame:
    """Adds (epoch_bin, cell_z3); plain column math, whole-stage codegen."""
    millis = (F.unix_timestamp(F.col(dtg)) * 1000 + F.date_format(F.col(dtg), "SSS").cast("long"))
    period = F.lit(WEEK_BT.period_millis)
    df = df.withColumn("__millis", millis)
    df = df.withColumn(bin_out, F.floor(F.col("__millis") / period).cast("int"))
    offset = F.col("__millis") - F.col(bin_out).cast("long") * period
    return df.withColumn(out, z3_col(F.col(lon), F.col(lat), offset)).drop("__millis")


def grid_cell(lon: Column, lat: Column, bits: int) -> Column:
    """Fixed-resolution grid cell id as a pure built-in expression:
    row-major (y * 2^bits + x) over a 2^bits × 2^bits lon/lat grid.

    Used as the equi-join key for spatial joins and as the tile id for
    density aggregation — stays inside whole-stage codegen (no UDF), and
    is reproducible in ANSI SQL for the DuckDB oracle.
    """
    n = 1 << bits
    xi = F.least(F.floor((lon + 180.0) / 360.0 * n), F.lit(n - 1)).cast("long")
    yi = F.least(F.floor((lat + 90.0) / 180.0 * n), F.lit(n - 1)).cast("long")
    return (yi * n + xi).alias(f"grid{bits}")


def z2_prefix(cell: Column, bits_kept: int) -> Column:
    """Truncate a 31-bit/dim z2 cell to its top ``bits_kept`` bits per dim
    (S2-style parent: prefix truncation)."""
    return F.shiftrightunsigned(cell, 2 * (31 - bits_kept))
