"""k-nearest-neighbors via grid ring expansion.

Reference semantics: geomesa-process/.../query/
KNearestNeighborSearchProcess.scala — expanding-window search: look in a
ring of cells around each probe, check that the k-th distance is provably
inside the searched ring (no closer point can exist outside it), widen
for probes that fail, re-rank by exact haversine.

Spark-first shape — THREE fixed passes, no data-dependent loop (bounded
stage count is what survives a 1000-executor plan):

1. RING PASS: every probe explodes a (2R+1)² cell window (R sized from
   global point density so ~4·k points are expected inside), broadcast-
   joins the cell-keyed point table, and re-ranks with a window. A probe
   is *resolved* when it found k neighbors and the k-th distance is
   smaller than the distance to any unexplored cell (the guard).
2. WIDENED RING PASS: unresolved probes re-run the same ring join at 2R
   (the reference's iterative widening, unrolled once). This bounds the
   exact fallback: only probes whose 2R neighborhood is still too empty
   reach pass 3, so a pathological probe set over sparse regions costs a
   4×-area window join, not |pending| full scans.
3. FALLBACK PASS: the (rare) still-unresolved probes — essentially empty
   neighborhoods — are broadcast against the full point table and
   re-ranked exactly. One extra scan, still no iteration; if no probe is
   pending AQE sees an empty broadcast side and prunes the scan.

Execution model: each pass's ranked result (≤ |probes|·k rows) is
lazily persisted at the pass boundary, so at action time the point
table is scanned at most once per pass — three bounded scans total.
Without the shared materialization the nested anti-joins re-derive
earlier passes per consumer and the scan count grows with pass depth
(measured 14 scans for this 3-pass plan). knn() itself stays plan-only
(zero jobs until the caller acts), and the cached pass blocks are
recomputable on executor loss. Ring SIZING is job-free too (Catalyst
plan stats, never a count()).

Distance = haversine column expression (whole-stage codegen); ties break
deterministically on ``order_cols``.
"""

from __future__ import annotations

import math
import threading
import weakref

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.operators.joins import haversine_m_col

__all__ = ["knn", "clear_knn_cache"]

#: pass-boundary frames persisted by knn() calls whose RESULT is still
#: alive in this process. Entries are auto-released: each knn() ties its
#: two pass caches to the returned DataFrame with a weakref finalizer,
#: so dropping the result (after the consuming action) unpersists them
#: — a long-lived service cannot accumulate CacheManager entries and a
#: stale cache cannot outlive the result that was built from it. Guarded
#: by a lock: concurrent knn() calls register/release safely.
_CACHED_PASSES: list = []
# RLock, and the py4j unpersist calls happen OUTSIDE the lock: the
# release path runs from a weakref.finalize callback, which cyclic GC
# may fire synchronously in a thread that already holds the lock — a
# plain Lock would self-deadlock there
_CACHE_LOCK = threading.RLock()


def _register_pass_caches(result: DataFrame, frames: list) -> None:
    """Tie ``frames``' persist lifetime to ``result``'s Python lifetime.

    weakref.finalize fires when the caller drops the returned DataFrame
    (or at interpreter exit) and unpersists the pass-boundary caches.
    The frames also ride on the result as ``_knn_pass_caches`` so a
    caller deriving a new frame can extend the scope (see knn())."""
    with _CACHE_LOCK:
        _CACHED_PASSES.extend(frames)
    result._knn_pass_caches = frames

    def _release(frames=frames):
        to_drop = []
        with _CACHE_LOCK:
            for f in frames:
                try:
                    _CACHED_PASSES.remove(f)
                    to_drop.append(f)
                except ValueError:
                    pass  # already released by clear_knn_cache()
        for f in to_drop:
            try:
                f.unpersist()
            except Exception:
                pass

    weakref.finalize(result, _release)


def clear_knn_cache() -> int:
    """Unpersist every pass-boundary cache still registered by live
    knn() results. Usually UNNECESSARY — caches auto-release when the
    returned DataFrame is garbage-collected — but a service holding
    many results can force an early release (their plans then recompute
    from lineage on the next action). Returns entries released."""
    with _CACHE_LOCK:
        drained, _CACHED_PASSES[:] = list(_CACHED_PASSES), []
    n = 0
    for df in drained:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n

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


def _ring_pass(
    pts: DataFrame,
    probes: DataFrame,
    r: int,
    n: int,
    k_col: str,
    order_cols: tuple,
    bc_probes: bool,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ring-window join at radius ``r``: returns (ranked candidates,
    resolved q_ids). A probe resolves when it found k neighbors and the
    k-th distance provably beats any unexplored cell (the guard)."""
    cell_h_deg = 180.0 / n
    cell_w_deg = 360.0 / n
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
    cand = pts.join(
        F.broadcast(ring) if bc_probes else ring, on="cell", how="inner"
    ).drop("cell")
    cand = cand.withColumn(
        "dist_m",
        haversine_m_col(F.col("lon"), F.col("lat"), F.col("q_lon"), F.col("q_lat")),
    )

    # rank + resolution stats in ONE shuffle: both windows partition on
    # q_id, so they share a single Exchange.
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("dist_m").asc(), *[F.col(c).asc() for c in order_cols]
    )
    w_all = Window.partitionBy("q_id")
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
    # a ring spanning the whole grid IS a full scan: everything resolves.
    # Longitude wraps (2r+1 >= n covers all columns) but latitude CLAMPS,
    # so a probe in the bottom row only reaches row qyi + r — every row is
    # covered for every probe only when r >= n-1. Using the longitude
    # criterion here would skip the guard while polar rows sit unexplored.
    full_cover = r >= n - 1
    flagged = (
        cand.withColumn("rank", F.row_number().over(w_rank))
        .withColumn("__found", F.max("rank").over(w_all))
        .withColumn(
            "__dk",
            F.max(
                F.when(F.col("rank") <= F.col(k_col), F.col("dist_m"))
            ).over(w_all),
        )
        .where(F.col("rank") <= F.col(k_col))
    )
    cond = F.col("__found") >= F.col(k_col)
    if not full_cover:
        cond = cond & (F.col("__dk") <= guard_m)
    # PASS BOUNDARY: persist (cache) here. ``flagged`` is ≤ |probes|·k
    # rows, but its lineage holds the full point scan + ring join, and it
    # feeds three consumers (the pass output, the resolved ids, the next
    # pass's anti join) which later passes nest — without a shared
    # materialization the point table is re-scanned once per consumer
    # per nesting level (measured: 14 parquet scans for the 3-pass plan;
    # with it: one per pass). persist is LAZY (knn() stays plan-only,
    # zero jobs at call time) and RECOMPUTABLE (an executor losing a
    # cached block recomputes from lineage instead of failing the job —
    # the property a 1000-executor deployment needs; a localCheckpoint
    # here both ran the shuffle eagerly at plan time and died with the
    # executor). Measured on the bench workload: 0.97 s vs 2.33 s with
    # checkpoints vs ~10 s with neither. The cache entries are scoped to
    # the knn() RESULT: knn() ties them to the returned DataFrame with a
    # weakref finalizer, so they release when the caller drops it —
    # bounded by |probes|·k rows per pass, spillable (MEMORY_AND_DISK).
    flagged = flagged.persist(StorageLevel.MEMORY_AND_DISK)
    resolved = flagged.where(cond).drop("__found", "__dk")
    resolved_ids = resolved.where(F.col("rank") == 1).select("q_id")
    return resolved, resolved_ids, flagged


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
        # performance: the guard + widened/fallback passes keep the
        # result exact whatever ring size is chosen
        n_pts = _estimated_rows(points)
        kmax = k_max if k_max is not None else 32
        per_cell = max(n_pts / float(n * n), 1e-12)
        # window with ~4·kmax expected points: (2R+1)^2 · per_cell ≥ 4·kmax
        r = int(math.ceil((math.sqrt(4.0 * kmax / per_cell) - 1.0) / 2.0))
        ring_cells = max(1, min(r, max_ring))
    r = ring_cells

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

    # ring side broadcast via the stats decider, RE-EVALUATED PER PASS
    # (ADVICE r4): each pass's explode factor differs — (2R+1)² at pass
    # 1, (2·2R+1)² (~4×) at pass 2, plain |pending| rows at pass 3 — so
    # a probe table near the threshold at R must be allowed to fall back
    # to AQE's own join choice at 2R instead of riding a forced
    # broadcast past the budget. pending1/pending2 carry anti-join
    # lineage, which Catalyst stats bound by the left side — a safe
    # over-estimate for a broadcast decision.
    from geomesa_spark.plans.decider import auto_broadcast

    r2 = min(2 * r, n)

    # --- pass 1: ring window join (rows come back already resolved) ----
    bc1 = auto_broadcast(probes, float((2 * r + 1) ** 2))
    out1_rows, resolved1, cache1 = _ring_pass(pts, probes, r, n, k_col, order_cols, bc1)
    out1 = out1_rows.drop("__qxi", "__qyi")

    # --- pass 2: widened 2R ring for unresolved probes -----------------
    # (the reference's iterative widening, unrolled once — bounds the
    # exact fallback to probes whose 2R neighborhood is still empty)
    pending1 = probes.join(resolved1, "q_id", "left_anti")
    bc2 = auto_broadcast(pending1, float((2 * r2 + 1) ** 2))
    out2_rows, resolved2, cache2 = _ring_pass(pts, pending1, r2, n, k_col, order_cols, bc2)
    out2 = out2_rows.drop("__qxi", "__qyi")

    # --- pass 3: exact fallback for still-unresolved probes ------------
    pending2 = pending1.join(resolved2, "q_id", "left_anti").drop("__qxi", "__qyi")
    bc3 = auto_broadcast(pending2, 1.0)
    cand3 = points.crossJoin(F.broadcast(pending2) if bc3 else pending2)
    cand3 = cand3.withColumn(
        "dist_m",
        haversine_m_col(F.col("lon"), F.col("lat"), F.col("q_lon"), F.col("q_lat")),
    )
    out3 = _rank_topk(cand3, k_col, order_cols)

    result = out1.unionByName(out2).unionByName(out3)
    # scope the pass caches to the result's lifetime: dropping the
    # returned DataFrame (after the consuming action) unpersists both.
    # CALLERS THAT DERIVE: a frame built from the result does NOT hold
    # a Python reference to it — if you derive and drop the result
    # before acting (``knn(...).select(...)``), extend the scope by
    # attaching it (``out = res.select(...); out._knn_scope = res``) or
    # act while holding the result; otherwise the caches release early
    # and the plan recomputes per consumer (correct, measured ~10x
    # slower).
    _register_pass_caches(result, [cache1, cache2])
    return result
