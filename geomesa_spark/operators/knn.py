"""k-nearest-neighbors via grid ring expansion.

Reference semantics: geomesa-process/.../query/
KNearestNeighborSearchProcess.scala — expanding-window search: look in a
ring of cells around each probe, check that the k-th distance is provably
inside the searched ring (no closer point can exist outside it), widen
for probes that fail, re-rank by exact haversine.

Spark-first shape — TWO fixed passes, no data-dependent loop (bounded
stage count is what survives a 1000-executor plan):

1. RING PASS: every probe explodes a (2R+1)² cell window (R sized from
   global point density so ~4·k points are expected inside), broadcast-
   joins the cell-keyed point table, and re-ranks with a window. A probe
   is *resolved* when it found k neighbors and the k-th distance is
   smaller than the distance to any unexplored cell (the guard).
2. FALLBACK PASS: the (rare) unresolved probes — empty neighborhoods —
   are broadcast against the full point table and re-ranked exactly.
   One extra scan, still no iteration; lazily planned, so if no probe is
   pending AQE sees an empty broadcast side.

Distance = haversine column expression (whole-stage codegen); ties break
deterministically on ``order_cols``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.operators.joins import haversine_m_col

__all__ = ["knn"]

_M_PER_DEG = 111_195.0


def _estimated_rows(df: DataFrame) -> float:
    """Row-count estimate from Catalyst plan statistics (no job): exact
    rowCount when CBO/AQE provides one, else sizeInBytes over a schema-
    derived row width. Replaces a driver-side count() — at 10^12 rows a
    full scan just to size a search ring is unacceptable."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return float(str(rc.get()))
        width = 8 * len(df.schema.fields) + 20
        return max(float(str(stats.sizeInBytes())) / width, 1.0)
    except Exception:
        return 1e6  # conservative default density


def _rank_topk(cand: DataFrame, k_col: str, order_cols: tuple) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(
        F.col("dist_m").asc(), *[F.col(c).asc() for c in order_cols]
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= F.col(k_col))


def knn(
    points: DataFrame,
    probes: DataFrame,
    bits: int = 6,
    k_col: str = "k",
    ring_cells: int | None = None,
    max_ring: int = 8,
    order_cols: tuple = ("doc_id", "span_offset"),
    k_max: int | None = None,
) -> DataFrame:
    """For each probe (q_id, lon, lat, k): the k nearest points.

    points: lon/lat plus identifying columns (``order_cols``) used as
    deterministic distance tie-breaks. Returns probe cols + point cols +
    dist_m + rank (1-based).
    """
    n = 1 << bits
    if ring_cells is None:
        # size the ring from Catalyst plan statistics — free, no job
        # (the old points.count() was a full extra scan per call, and
        # the round-2 probes.agg(max(k)).collect() fallback was still a
        # job per call); k_max now defaults to a fixed conservative 32
        # when the caller doesn't pass it — the estimate only tunes
        # performance: the guard + fallback pass keep the result exact
        # whatever ring size is chosen
        n_pts = _estimated_rows(points)
        kmax = k_max if k_max is not None else 32
        per_cell = max(n_pts / float(n * n), 1e-12)
        # window with ~4·kmax expected points: (2R+1)^2 · per_cell ≥ 4·kmax
        r = int(math.ceil((math.sqrt(4.0 * kmax / per_cell) - 1.0) / 2.0))
        ring_cells = max(1, min(r, max_ring))
    r = ring_cells

    cell_h_deg = 180.0 / n
    cell_w_deg = 360.0 / n

    xi = F.least(F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1))
    yi = F.least(F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * n), F.lit(0)), F.lit(n - 1))
    pts = (
        points.withColumn("__xi", xi)
        .withColumn("__yi", yi)
        .withColumn("cell", F.col("__yi") * n + F.col("__xi"))
        .drop("__xi", "__yi")
    )

    probes = (
        probes.withColumn("__qxi", xi)
        .withColumn("__qyi", F.least(F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * n), F.lit(0)), F.lit(n - 1)))
        .withColumnRenamed("lon", "q_lon")
        .withColumnRenamed("lat", "q_lat")
    )

    # --- pass 1: ring window join -------------------------------------
    ring = (
        probes.withColumn(
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
            # no ±180 clamp: raw indices wrap via pmod so a probe near
            # the antimeridian explores cells on both sides (the guard
            # stays valid — every cell within r columns IS explored);
            # span capped at n columns so no cell repeats
            F.explode(
                F.sequence(
                    F.col("__qxi") - r,
                    F.least(F.col("__qxi") + r, F.col("__qxi") - r + F.lit(n - 1)),
                )
            ),
        )
        .withColumn("cell", F.col("__yi") * n + F.pmod(F.col("__xi"), F.lit(n)))
        .drop("__xi", "__yi")
    )
    # ring side broadcast via the stats decider: probes explode by the
    # (2R+1)² window, so a large probe table at a wide ring falls back
    # to AQE's own join choice instead of a forced broadcast build
    from geomesa_spark.plans.decider import auto_broadcast

    bc_probes = auto_broadcast(probes, float((2 * r + 1) ** 2))
    cand = pts.join(
        F.broadcast(ring) if bc_probes else ring, on="cell", how="inner"
    ).drop("cell")
    cand = cand.withColumn(
        "dist_m",
        haversine_m_col(F.col("lon"), F.col("lat"), F.col("q_lon"), F.col("q_lat")),
    )
    ranked = _rank_topk(cand, k_col, order_cols)

    # guard: nearest unexplored cell is ≥ r cell-heights away vertically,
    # or r cos-shrunk cell-widths horizontally
    guard_lat_m = r * cell_h_deg * _M_PER_DEG
    guard_lon_m = (
        r
        * cell_w_deg
        * _M_PER_DEG
        * F.greatest(
            F.cos(F.radians(F.least(F.abs(F.col("q_lat")) + (r + 1) * cell_h_deg, F.lit(89.0)))),
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
    out1 = ranked.join(F.broadcast(resolved_ids), "q_id", "inner").drop("__qxi", "__qyi")

    # --- pass 2: exact fallback for unresolved probes -----------------
    pending = probes.join(resolved_ids, "q_id", "left_anti").drop("__qxi", "__qyi")
    cand2 = points.crossJoin(F.broadcast(pending) if bc_probes else pending)
    cand2 = cand2.withColumn(
        "dist_m",
        haversine_m_col(F.col("lon"), F.col("lat"), F.col("q_lon"), F.col("q_lat")),
    )
    out2 = _rank_topk(cand2, k_col, order_cols)

    return out1.unionByName(out2)
