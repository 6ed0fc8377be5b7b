"""Deterministic synthesis of the engine's input tables (FIXTURES.md).

All generation is seeded arithmetic over stable integer keys — no wall
clock, no RNG state — so every scale factor reproduces byte-identical
content, and the DuckDB oracle can re-derive the same values with plain
ANSI arithmetic (the driver's correctness gate depends on this).

Tables:
- F1 ``documents``  — interleaved text+media docs: (doc_id, spans) where
  spans is array<struct<kind,text,media_ref,offset>> and geo spans carry
  ``POINT(lon lat)`` WKT in ``text``. Shape fixed by BASELINE.json:input_hint.
- F2 ``poly_layers`` — polygon join layer (bbox / convex hexagon / holed),
  ~2% oversized for hot-tile skew tests.
- F3 ``query_points`` — kNN / DWITHIN probes.
- F4 canonical GeoMesa fixture layer ("name:String,age:Int,dtg:Date,*geom:Point")
  mirroring the reference's golden-test pattern (reference:
  geomesa-accumulo/.../AccumuloDataStoreQueryTest.scala fixture shape).

Generation runs entirely in Spark built-ins (sequence/transform/
format_string) — it scales to any row count with no driver-side loop.
NOTE: span-count hash ``i*2654435761 % 7`` wraps int64 above ~3.5e9 docs;
at larger scales the generator (not the engine) would switch to a
128-bit-safe mix. Engine operators never depend on this arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "synthesize_documents",
    "documents_from_driver_table",
    "poly_layers",
    "rect_layer",
    "query_points",
    "canonical_layer",
    "SPAN_KINDS",
]

# kind cycle per FIXTURES.md F1: geo spans at offsets 1 and 4
SPAN_KINDS = ["text", "geo", "image", "text", "geo", "audio", "text"]

_SPANS_EXPR = """
transform(sequence(0, cast((1 + (i * 2654435761) % 7) - 1 as int)), j -> named_struct(
  'kind', element_at(array('text','geo','image','text','geo','audio','text'), cast(j + 1 as int)),
  'text', CASE element_at(array('text','geo','image','text','geo','audio','text'), cast(j + 1 as int))
            WHEN 'text' THEN format_string('lorem-%d-%d', i, j)
            WHEN 'geo'  THEN concat('POINT(',
                cast(-180.0 + ((i * 31 + j * 17) % 36000) / 100.0 as string), ' ',
                cast( -85.0 + ((i * 53 + j * 29) % 17000) / 100.0 as string), ')')
            ELSE '' END,
  'media_ref', CASE WHEN element_at(array('text','geo','image','text','geo','audio','text'), cast(j + 1 as int)) IN ('image','audio')
            THEN format_string('s3://m/%d/%d-%d.bin', i % 1000, i, j) ELSE '' END,
  'offset', cast(j as int)
))
"""


def _with_spans(df: DataFrame) -> DataFrame:
    """Attach doc_id string + spans to a DataFrame that has bigint col i."""
    return df.select(
        F.format_string("doc-%012d", F.col("i")).alias("doc_id"),
        F.expr(_SPANS_EXPR).alias("spans"),
    )


def synthesize_documents(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """F1 interleaved documents for doc ids 0..n_docs-1."""
    rng = spark.range(0, n_docs, numPartitions=partitions).withColumnRenamed("id", "i")
    return _with_spans(rng)


def documents_from_driver_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 interleaved documents keyed by the driver documents table's
    doc_id column (so row count tracks the scale factor)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("i")
    )
    return _with_spans(base)


def poly_layers(spark: SparkSession, n_polys: int, skew: bool = True) -> DataFrame:
    """F2 polygon layer. WKT is assembled by a vectorized Arrow batch
    kernel (hexagon vertices need trig over arrays); the envelope columns
    are exact and enable bbox pruning + the DuckDB oracle."""
    base = (
        spark.range(0, n_polys)
        .withColumnRenamed("id", "k")
        .select(
            "k",
            F.format_string("poly-%06d", F.col("k")).alias("poly_id"),
            F.element_at(
                F.array(F.lit("bbox"), F.lit("convex"), F.lit("holed")),
                (F.col("k") % 3 + 1).cast("int"),
            ).alias("kind"),
            (F.lit(-180.0) + (F.col("k") * 97 % 36000) / 100.0).alias("lon_c"),
            (F.lit(-85.0) + (F.col("k") * 61 % 17000) / 100.0).alias("lat_c"),
            (
                (F.lit(0.1) + (F.col("k") % 50) * 0.05)
                * (F.when(F.col("k") % 50 == 7, 20.0).otherwise(1.0) if skew else F.lit(1.0))
            ).alias("size_deg"),
        )
    )

    def make_wkt(it):
        for pdf in it:
            kind = pdf["kind"].to_numpy()
            cx = pdf["lon_c"].to_numpy()
            cy = pdf["lat_c"].to_numpy()
            s = pdf["size_deg"].to_numpy()
            wkt = np.empty(len(pdf), dtype=object)
            half = s / 2.0
            for idx in range(len(pdf)):
                x0, y0, x1, y1 = cx[idx] - half[idx], cy[idx] - half[idx], cx[idx] + half[idx], cy[idx] + half[idx]
                if kind[idx] == "bbox":
                    wkt[idx] = (
                        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
                    )
                elif kind[idx] == "convex":
                    ang = np.pi / 3.0 * np.arange(7)  # closed hexagon
                    vx = cx[idx] + half[idx] * np.cos(ang)
                    vy = cy[idx] + half[idx] * np.sin(ang)
                    pts = ", ".join(f"{a} {b}" for a, b in zip(vx, vy))
                    wkt[idx] = f"POLYGON (({pts}))"
                else:  # holed: bbox with centered square hole of half size
                    q = half[idx] / 2.0
                    hx0, hy0, hx1, hy1 = cx[idx] - q, cy[idx] - q, cx[idx] + q, cy[idx] + q
                    wkt[idx] = (
                        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}), "
                        f"({hx0} {hy0}, {hx1} {hy0}, {hx1} {hy1}, {hx0} {hy1}, {hx0} {hy0}))"
                    )
            yield pd.DataFrame(
                {
                    "poly_id": pdf["poly_id"],
                    "kind": pdf["kind"],
                    "wkt": wkt,
                    "min_lon": cx - half,
                    "min_lat": cy - half,
                    "max_lon": cx + half,
                    "max_lat": cy + half,
                }
            )

    schema = (
        "poly_id string, kind string, wkt string, "
        "min_lon double, min_lat double, max_lon double, max_lat double"
    )
    return base.mapInPandas(make_wkt, schema=schema)


def rect_layer(spark: SparkSession, n: int) -> DataFrame:
    """Second rectangle layer for geometry×geometry joins (F2 variant).

    Pure built-ins end-to-end: the WKT ring is concatenated from
    double→string casts (Java Double.toString round-trips exactly, so
    the refine kernel parses back the precise envelope doubles the
    DuckDB oracle recomputes). Columns: rect_id, wkt + envelope."""
    half = F.col("size_deg") / 2.0
    x0, x1 = F.col("lon_c") - half, F.col("lon_c") + half
    y0, y1 = F.col("lat_c") - half, F.col("lat_c") + half

    def pt(x, y):
        return F.concat(x.cast("string"), F.lit(" "), y.cast("string"))

    wkt = F.concat(
        F.lit("POLYGON (("),
        pt(x0, y0), F.lit(", "), pt(x1, y0), F.lit(", "),
        pt(x1, y1), F.lit(", "), pt(x0, y1), F.lit(", "), pt(x0, y0),
        F.lit("))"),
    )
    return (
        spark.range(0, n)
        .select(
            F.format_string("rect-%05d", F.col("id")).alias("rect_id"),
            (F.lit(-180.0) + (F.col("id") * 137 % 36000) / 100.0).alias("lon_c"),
            (F.lit(-85.0) + (F.col("id") * 89 % 17000) / 100.0).alias("lat_c"),
            (F.lit(0.2) + (F.col("id") % 40) * 0.07).alias("size_deg"),
        )
        .select(
            "rect_id",
            wkt.alias("wkt"),
            x0.alias("min_lon"), y0.alias("min_lat"),
            x1.alias("max_lon"), y1.alias("max_lat"),
        )
    )


def query_points(spark: SparkSession, n_queries: int) -> DataFrame:
    """F3 kNN / DWITHIN probe points."""
    return (
        spark.range(0, n_queries)
        .withColumnRenamed("id", "m")
        .select(
            F.format_string("q-%04d", F.col("m")).alias("q_id"),
            (F.lit(-180.0) + (F.col("m") * 71 % 36000) / 100.0).alias("lon"),
            (F.lit(-85.0) + (F.col("m") * 43 % 17000) / 100.0).alias("lat"),
            (F.lit(1) + F.col("m") % 20).cast("int").alias("k"),
            (F.lit(100.0) * (F.lit(1) + F.col("m") % 1000)).alias("radius_m"),
        )
    )


def canonical_layer(spark: SparkSession, n_rows: int) -> DataFrame:
    """F4 canonical fixture layer mirroring the reference's
    "name:String,age:Int,dtg:Date,*geom:Point:srid=4326" test pattern."""
    return (
        spark.range(0, n_rows)
        .withColumnRenamed("id", "i")
        .select(
            F.format_string("f-%05d", F.col("i")).alias("__fid__"),
            F.format_string("name%d", F.col("i") % 10).alias("name"),
            (F.col("i") % 100).cast("int").alias("age"),
            F.expr("timestampadd(HOUR, cast(i as int), timestamp'2024-01-01 00:00:00')").alias(
                "dtg"
            ),
            ((F.col("i") % 360) - 180 + 0.5).cast("double").alias("lon"),
            ((F.floor(F.col("i") / 360) % 170) - 85 + 0.5).cast("double").alias("lat"),
        )
    )
