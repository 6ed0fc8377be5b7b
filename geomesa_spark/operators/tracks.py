"""Track building: point sequences → line segments / track LineStrings.

Reference: geomesa-process/geomesa-process-vector/.../process/vector/
Point2PointProcess.scala — groups features by a track attribute, sorts
by time, and emits LineString features connecting consecutive points
(with per-segment time deltas). Spark-first shapes:

- ``track_segments``: lead() window per track → one row per consecutive
  pair with the 2-point segment WKT, dt seconds and haversine length —
  pure built-ins, one shuffle on the track key, codegen end-to-end.
- ``track_lines``: one LINESTRING per track via
  sort_array(collect_list(struct)) → transform → concat. Per-track
  collection is bounded by the track length (the reference materializes
  each group the same way); tracks beyond ~10^5 vertices should use
  ``track_segments`` or densify/window pipelines instead.

Coordinates are written with %.6f formatting (format_string), matching
the engine-wide WKT text convention so the DuckDB oracle's printf
produces byte-identical strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.operators.joins import haversine_m_col

__all__ = ["track_segments", "track_lines"]


def track_segments(
    df: DataFrame,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
) -> DataFrame:
    """One row per consecutive point pair within a track (ordered by
    ``dtg``): (track, seg_idx, wkt LINESTRING of the 2 points, dt_s,
    length_m)."""
    w = Window.partitionBy(track_col).orderBy(F.col(dtg).asc())
    t = (
        df.withColumn("__nlon", F.lead(lon).over(w))
        .withColumn("__nlat", F.lead(lat).over(w))
        .withColumn("__ndtg", F.lead(dtg).over(w))
        .withColumn("seg_idx", F.row_number().over(w))
        .where(F.col("__nlon").isNotNull())
    )
    wkt = F.concat(
        F.lit("LINESTRING ("),
        F.format_string("%.6f %.6f", F.col(lon), F.col(lat)),
        F.lit(", "),
        F.format_string("%.6f %.6f", F.col("__nlon"), F.col("__nlat")),
        F.lit(")"),
    )
    return t.select(
        F.col(track_col).alias("track"),
        F.col("seg_idx").cast("int"),
        wkt.alias("wkt"),
        (F.unix_timestamp("__ndtg") - F.unix_timestamp(dtg)).alias("dt_s"),
        haversine_m_col(F.col(lon), F.col(lat), F.col("__nlon"), F.col("__nlat")).alias(
            "length_m"
        ),
    )


def track_lines(
    df: DataFrame,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
) -> DataFrame:
    """One LINESTRING per track, vertices in time order: (track,
    n_points, wkt)."""
    pts = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(dtg).alias("o"),
                F.format_string("%.6f %.6f", F.col(lon), F.col(lat)).alias("p"),
            )
        )
    )
    return df.groupBy(F.col(track_col).alias("track")).agg(
        F.count("*").cast("int").alias("n_points"),
        F.concat(
            F.lit("LINESTRING ("),
            F.array_join(F.transform(pts, lambda s: s["p"]), ", "),
            F.lit(")"),
        ).alias("wkt"),
    )
