"""k-nearest-neighbors via grid ring expansion.

Reference semantics: geomesa-process/.../query/
KNearestNeighborSearchProcess.scala — iterative expanding-window search:
start with a small ring of cells around each probe, grow until k
neighbors are found AND the k-th distance is provably inside the
searched ring (no closer point can exist outside it), then re-rank by
exact haversine.

Spark-first shape: probes are the small side — each iteration explodes
the pending probes' ring cells (built-ins), broadcast-joins against the
cell-keyed point table, and re-ranks with a window. The driver loop only
doubles the ring radius for unresolved probes; all data work is
distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.operators.joins import haversine_m_col

__all__ = ["knn"]

_M_PER_DEG = 111_195.0


def knn(
    points: DataFrame,
    probes: DataFrame,
    bits: int = 6,
    k_col: str = "k",
    max_radius_cells: int | None = None,
    order_cols: tuple = ("doc_id", "span_offset"),
) -> DataFrame:
    """For each probe (q_id, lon, lat, k): the k nearest points.

    points: must have lon/lat (+ identifying columns in ``order_cols``
    used as deterministic distance tie-breaks).
    Returns probe cols + point cols + dist_m + rank.
    """
    n = 1 << bits
    max_r = max_radius_cells or n  # full grid in the worst case
    cell_h_deg = 180.0 / n
    cell_w_deg = 360.0 / n

    pts = points.withColumn(
        "__xi", F.least(F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1))
    ).withColumn(
        "__yi", F.least(F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * n), F.lit(0)), F.lit(n - 1))
    )
    pts = pts.withColumn("cell", F.col("__yi") * n + F.col("__xi")).drop("__xi", "__yi").cache()

    probes = probes.withColumn(
        "__qxi", F.least(F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1))
    ).withColumn(
        "__qyi", F.least(F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * n), F.lit(0)), F.lit(n - 1))
    )
    probes = probes.withColumnRenamed("lon", "q_lon").withColumnRenamed("lat", "q_lat")

    pending = probes
    done_parts: list[DataFrame] = []
    r = 1
    while r <= max_r:
        is_last = r * 2 > max_r
        ring = (
            pending.withColumn(
                "__yi",
                F.explode(
                    F.sequence(
                        F.greatest(F.col("__qyi") - r, F.lit(0)),
                        F.least(F.col("__qyi") + r, F.lit(n - 1)),
                    )
                ),
            )
            .withColumn(
                "__xi",
                F.explode(
                    F.sequence(
                        F.greatest(F.col("__qxi") - r, F.lit(0)),
                        F.least(F.col("__qxi") + r, F.lit(n - 1)),
                    )
                ),
            )
            .withColumn("cell", F.col("__yi") * n + F.col("__xi"))
            .drop("__xi", "__yi")
        )
        cand = pts.join(F.broadcast(ring), on="cell", how="inner").drop("cell")
        cand = cand.withColumn(
            "dist_m",
            haversine_m_col(F.col("lon"), F.col("lat"), F.col("q_lon"), F.col("q_lat")),
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("dist_m").asc(), *[F.col(c).asc() for c in order_cols]
        )
        ranked = cand.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= F.col(k_col)
        )
        if is_last:
            done_parts.append(ranked.drop("__qxi", "__qyi"))
            break
        # guarantee check: the k-th distance must be closer than any
        # unexplored cell. Nearest unexplored region is >= r cells away;
        # meters bound uses lat cell height and cos-shrunk lon width.
        guard_lat_m = r * cell_h_deg * _M_PER_DEG
        guard_lon_m = (
            r
            * cell_w_deg
            * _M_PER_DEG
            * F.greatest(
                F.cos(
                    F.radians(
                        F.least(F.abs(F.col("q_lat")) + (r + 1) * cell_h_deg, F.lit(89.0))
                    )
                ),
                F.lit(0.0),
            )
        )
        guard_m = F.least(F.lit(guard_lat_m), guard_lon_m)
        stats = ranked.groupBy("q_id", k_col).agg(
            F.count("*").alias("__found"),
            F.max("dist_m").alias("__dk"),
            F.first(guard_m).alias("__guard"),
        )
        resolved_ids = stats.where(
            (F.col("__found") >= F.col(k_col)) & (F.col("__dk") <= F.col("__guard"))
        ).select("q_id")
        done = ranked.join(F.broadcast(resolved_ids), "q_id", "inner")
        done_parts.append(done.drop("__qxi", "__qyi"))
        pending = pending.join(F.broadcast(resolved_ids), "q_id", "left_anti")
        if pending.limit(1).count() == 0:
            break
        r *= 2

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out
