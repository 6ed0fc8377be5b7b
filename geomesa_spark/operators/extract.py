"""Geo-span extraction + cell assignment.

The engine's input is the interleaved document table
(doc_id, spans:array<struct<kind,text,media_ref,offset>>). Geometry
lives inside spans with kind='geo' as WKT in ``text``. Extraction is a
pure DataFrame pipeline: explode → filter → vectorized WKT-point parse
(Arrow-batched pandas UDF, no per-row Python) → lon/lat columns — the
original ``spans`` column is never modified, preserving the span-sequence
invariant (join extraction results back by doc_id when both are needed).

Cell assignment wraps the NumPy curve kernels (curves/zorder.py) as
pandas UDFs. Replaces the reference's key generation
(geomesa-index-api/.../index/index/z2/Z2IndexKeySpace.scala::toIndexKey,
z3/Z3IndexKeySpace.scala) — here a cell is a plain int64 column that
Parquet min/max stats and partition pruning understand.
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
    "grid_cell",
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
    """Vectorized POINT-WKT parse (C-level regex over an Arrow batch)."""
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


def extract_geo_points(docs: DataFrame) -> DataFrame:
    """documents → doc_points(doc_id, span_offset, lon, lat).

    `posexplode` is not needed: span structs carry their own offset.
    """
    geo = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "geo")
        .select(
            "doc_id",
            F.col("s.offset").alias("span_offset"),
            parse_point_wkt(F.col("s.text")).alias("pt"),
        )
    )
    return geo.select("doc_id", "span_offset", F.col("pt.lon").alias("lon"), F.col("pt.lat").alias("lat"))


def with_z2_cell(df: DataFrame, lon: str = "lon", lat: str = "lat", out: str = "cell_z2") -> DataFrame:
    return df.withColumn(out, _z2_index(F.col(lon), F.col(lat)))


def with_z3_cell(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
    bin_out: str = "epoch_bin",
    out: str = "cell_z3",
) -> DataFrame:
    """Adds (epoch_bin, cell_z3). The bin split is plain column math —
    stays in whole-stage codegen; only the Morton interleave is a UDF."""
    millis = (F.unix_timestamp(F.col(dtg)) * 1000 + F.date_format(F.col(dtg), "SSS").cast("long"))
    period = F.lit(WEEK_BT.period_millis)
    df = df.withColumn("__millis", millis)
    df = df.withColumn(bin_out, F.floor(F.col("__millis") / period).cast("int"))
    offset = F.col("__millis") - F.col(bin_out).cast("long") * period
    return df.withColumn(out, _z3_index(F.col(lon), F.col(lat), offset)).drop("__millis")


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
