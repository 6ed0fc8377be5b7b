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

__all__ = [
    "track_segments",
    "track_lines",
    "track_label",
    "track_length",
    "hausdorff_pairs",
    "encounters",
    "geofence_events",
    "sinuosity",
    "flow_field",
    "speed_legs",
    "dwell_episodes",
    "od_matrix",
    "resample_tracks",
    "route_search",
]


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

def track_length(
    df: DataFrame,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
) -> DataFrame:
    """Great-circle length per track (reference TrackLabelProcess /
    track statistics): consecutive-leg haversine distances summed in
    time order — (track, n_points, length_m).

    Cross-engine exactness: each leg's haversine double is computed by
    the SAME expression both engines run bit-identically; legs are cast
    to DECIMAL(18,6) before summing, so the per-track total is exact
    and independent of aggregation order (a raw double sum would depend
    on partial-aggregate ordering). One window + one hash aggregate,
    both partitioned on the track key — a single shuffle."""
    w = Window.partitionBy(track_col).orderBy(F.col(dtg).asc())
    nlon = F.lead(lon).over(w)
    # explicit NULL guard: the haversine kernel clamps with least(x, 1)
    # and Spark's (and DuckDB's) least/greatest IGNORE nulls, so a NULL
    # next-point would otherwise collapse to asin(1) — half the Earth's
    # circumference added per trailing point (caught by the unit test)
    leg = F.when(
        nlon.isNotNull(),
        haversine_m_col(F.col(lon), F.col(lat), nlon, F.lead(lat).over(w)),
    )
    t = df.withColumn("__leg", leg.cast("decimal(18,6)"))
    return t.groupBy(F.col(track_col).alias("track")).agg(
        F.count("*").cast("int").alias("n_points"),
        F.coalesce(F.sum("__leg"), F.lit(0).cast("decimal(18,6)"))
        .cast("double")
        .alias("length_m"),
    )


def hausdorff_pairs(
    df: DataFrame,
    pairs: DataFrame,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Discrete Hausdorff distance between candidate track pairs —
    the classic trajectory-similarity measure: H(A,B) =
    max(max_a min_b d(a,b), max_b min_a d(a,b)) over the tracks'
    point sets (great-circle meters).

    ``pairs`` (track_a, track_b) FENCES the point-pair product — like
    jaccard_pairs' mandatory block_col, the caller supplies candidate
    pairs (bbox-overlap, same-cell, explicit list) and the cost is
    Σ |A|·|B| over candidates, never all-tracks². Shape: the per-pair
    point product is built ONCE (two equi-joins on the track keys);
    each joined row then explodes into its two directed roles (source
    = a-point / b-point) so BOTH direction reductions come from the
    same single pass — a naive fwd/bwd union would re-derive the whole
    product per direction (the dominant cost) where the explode is one
    Generate. min-per-source then max-per-pair hash aggregates finish.
    min/max of identical haversine doubles — exact with NO float-order
    concerns. Output: (track_a, track_b, hausdorff_m) round 6.
    """
    pa = df.select(
        F.col(track_col).alias("track_a"),
        F.col(lon).alias("a_lon"),
        F.col(lat).alias("a_lat"),
    )
    pb = df.select(
        F.col(track_col).alias("track_b"),
        F.col(lon).alias("b_lon"),
        F.col(lat).alias("b_lat"),
    )
    prod = (
        pairs.join(pa, "track_a")
        .join(pb, "track_b")
        .withColumn(
            "d",
            haversine_m_col(
                F.col("a_lon"), F.col("a_lat"), F.col("b_lon"), F.col("b_lat")
            ),
        )
    )
    src = F.explode(
        F.array(
            F.struct(F.lit(0).alias("dir"), F.col("a_lon").alias("sx"), F.col("a_lat").alias("sy")),
            F.struct(F.lit(1).alias("dir"), F.col("b_lon").alias("sx"), F.col("b_lat").alias("sy")),
        )
    ).alias("s")
    return (
        prod.select("track_a", "track_b", "d", src)
        .groupBy("track_a", "track_b", "s.dir", "s.sx", "s.sy")
        .agg(F.min("d").alias("mn"))
        .groupBy("track_a", "track_b")
        .agg(F.round(F.max("mn"), 6).alias("hausdorff_m"))
    )


def encounters(
    points: DataFrame,
    track_col: str,
    delta_s_m: float,
    delta_t_s: int,
    ts_col: str = "dtg",
    bits: int = 5,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Encounter detection between tracks (the AIS/rendezvous
    analytic): per unordered CROSS-track pair, the number of ping
    pairs simultaneously within ``delta_s_m`` meters and ``delta_t_s``
    seconds, plus the closest approach observed among them.

    One cell-cover self-join at delta_s (distance_join) — the time
    window and the cross-track/dedup order (track_a < track_b, which
    also drops intra-track pairs) are refinement filters on the same
    join, so proximity in TIME never widens the spatial candidate set.
    Counts are exact integers; min over identical haversine doubles is
    exact. Output: (track_a, track_b, n_close, min_dist_m) round 6.
    """
    from geomesa_spark.operators.joins import distance_join

    pts = points.select(
        F.col(track_col).alias("__trk"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
        F.unix_seconds(F.col(ts_col).cast("timestamp")).alias("__t"),
    )
    probes = pts.select(
        F.col("__trk").alias("q_trk"),
        "lon",
        "lat",
        F.col("__t").alias("q_t"),
        F.lit(float(delta_s_m)).alias("radius_m"),
    )
    cand = distance_join(pts, probes, bits=bits).where(
        (F.col("__trk") < F.col("q_trk"))
        & (F.abs(F.col("__t") - F.col("q_t")) <= F.lit(int(delta_t_s)))
    )
    return cand.groupBy(
        F.col("__trk").alias("track_a"), F.col("q_trk").alias("track_b")
    ).agg(
        F.count("*").alias("n_close"),
        F.round(F.min("dist_m"), 6).alias("min_dist_m"),
    )


def geofence_events(
    points: DataFrame,
    fences: DataFrame,
    track_col: str = "track",
    ts_col: str = "dtg",
    lon: str = "lon",
    lat: str = "lat",
    tie_cols: tuple = (),
) -> DataFrame:
    """Geofence monitoring: enter/exit events per (fence, track) — the
    transition edges of the inside-fence indicator along each track's
    time-ordered pings (the streaming geofence alert, batch form).

    ``fences`` is a small dimension (fence_id, min_lon, min_lat,
    max_lon, max_lat; CLOSED envelopes) and is broadcast — the
    points×fences product is a broadcast nested-loop over a dim table,
    never a shuffle of the fact side; the single Exchange is the
    (fence, track) window partition. A ping with no predecessor emits
    nothing (state unknown before the first fix). Output: (fence_id,
    track, ts, event∈{enter, exit}).
    """
    j = points.crossJoin(F.broadcast(fences))
    inside = (
        (F.col(lon) >= F.col("min_lon"))
        & (F.col(lon) <= F.col("max_lon"))
        & (F.col(lat) >= F.col("min_lat"))
        & (F.col(lat) <= F.col("max_lat"))
    ).cast("int")
    w = Window.partitionBy("fence_id", track_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tie_cols]
    )
    t = j.withColumn("__in", inside).withColumn("__prev", F.lag("__in").over(w))
    return (
        t.where(F.col("__prev").isNotNull() & (F.col("__prev") != F.col("__in")))
        .select(
            "fence_id",
            F.col(track_col).alias("track"),
            F.col(ts_col).alias("ts"),
            F.when(F.col("__in") == 1, F.lit("enter")).otherwise(F.lit("exit")).alias("event"),
        )
    )


def sinuosity(
    df: DataFrame,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
) -> DataFrame:
    """Track sinuosity (route-efficiency QC): great-circle path length
    divided by the straight-line (chord) distance between the first
    and last fix — 1.0 = dead straight, large = loitering/circling.

    Legs sum as exact DECIMAL(18,6) (the track_length discipline, so
    the total ignores aggregation order); the chord endpoints come from
    min_by/max_by on the timestamp in the SAME single hash aggregate —
    one window + one shuffle total. Requires unique timestamps per
    track (min_by tie order is engine-defined). A zero chord (closed
    loop / single fix) yields NULL sinuosity. Output: (track, n_points,
    path_m, chord_m, sinuosity) round 6.
    """
    w = Window.partitionBy(track_col).orderBy(F.col(dtg).asc())
    nlon = F.lead(lon).over(w)
    leg = F.when(
        nlon.isNotNull(),
        haversine_m_col(F.col(lon), F.col(lat), nlon, F.lead(lat).over(w)),
    )
    t = df.withColumn("__leg", leg.cast("decimal(18,6)"))
    agg = t.groupBy(F.col(track_col).alias("track")).agg(
        F.count("*").cast("int").alias("n_points"),
        F.coalesce(F.sum("__leg"), F.lit(0).cast("decimal(18,6)"))
        .cast("double")
        .alias("__path"),
        F.min_by(F.struct(F.col(lon).alias("x"), F.col(lat).alias("y")), F.col(dtg)).alias("__a"),
        F.max_by(F.struct(F.col(lon).alias("x"), F.col(lat).alias("y")), F.col(dtg)).alias("__b"),
    )
    chord = haversine_m_col(
        F.col("__a.x"), F.col("__a.y"), F.col("__b.x"), F.col("__b.y")
    )
    return agg.select(
        "track",
        "n_points",
        F.round(F.col("__path"), 6).alias("path_m"),
        F.round(chord, 6).alias("chord_m"),
        F.round(
            F.when(chord > 0.0, F.col("__path") / chord), 6
        ).alias("sinuosity"),
    )


def flow_field(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
) -> DataFrame:
    """Grid flow field (the movement "vector map"): per grid cell, the
    mean displacement vector of the track legs STARTING in it — where
    traffic in that cell is headed on average.

    One (track)-window derives each leg's displacement; displacements
    subtract as exact DECIMAL(12,2) coordinates (2-dp rationals), so
    the per-cell sums are order-exact decimals and the mean is one
    double division. Legs assign to the cell of their start fix; the
    window shuffle (track) and the aggregate shuffle (cell) are the
    only two. Output: (ix, iy, n_legs, mean_dx, mean_dy) round 6.
    """
    x0, y0, x1, y1 = bbox
    dx_cell = (x1 - x0) / width
    dy_cell = (y1 - y0) / height
    w = Window.partitionBy(track_col).orderBy(F.col(dtg).asc())
    xd = F.col(lon).cast("decimal(12,2)")
    yd = F.col(lat).cast("decimal(12,2)")
    legs = (
        points.withColumn("__dx", F.lead(xd).over(w) - xd)
        .withColumn("__dy", F.lead(yd).over(w) - yd)
        .where(F.col("__dx").isNotNull())
    )
    inb = legs.where(
        (F.col(lon) >= x0) & (F.col(lon) < x1) & (F.col(lat) >= y0) & (F.col(lat) < y1)
    )
    agg = inb.groupBy(
        F.floor((F.col(lon) - x0) / dx_cell).cast("int").alias("ix"),
        F.floor((F.col(lat) - y0) / dy_cell).cast("int").alias("iy"),
    ).agg(
        F.count("*").alias("n_legs"),
        F.sum("__dx").alias("__sx"),
        F.sum("__dy").alias("__sy"),
    )
    return agg.select(
        "ix",
        "iy",
        "n_legs",
        F.round(F.col("__sx").cast("double") / F.col("n_legs"), 6).alias("mean_dx"),
        F.round(F.col("__sy").cast("double") / F.col("n_legs"), 6).alias("mean_dy"),
    )


def speed_legs(
    df: DataFrame,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
    vmax_ms: float = 100.0,
) -> DataFrame:
    """Per-ping ground speed + plausibility flag (GPS-trace cleaning,
    the per-leg dual of ``track_length``; reference: the query-time
    track statistics of Point2PointProcess.scala's dt/length outputs).

    speed_ms = haversine(prev → cur) / Δt over the time-ordered track
    window (NULL on the first ping and on non-positive Δt); rows whose
    speed exceeds ``vmax_ms`` are flagged, not dropped, so callers can
    either filter or sessionize around the teleports. Rounded to 6 dp
    so the double quotient hashes identically in the oracle.

    Scale: one lag() window partitioned on the track key — a single
    shuffle, whole-stage codegen, no Python."""
    w = Window.partitionBy(track_col).orderBy(F.col(dtg).asc())
    plon, plat = F.lag(lon).over(w), F.lag(lat).over(w)
    dt_s = F.unix_timestamp(F.col(dtg)) - F.unix_timestamp(F.lag(dtg).over(w))
    speed = F.when(
        plon.isNotNull() & (dt_s > 0),
        F.round(haversine_m_col(plon, plat, F.col(lon), F.col(lat)) / dt_s, 6),
    )
    return df.select(
        F.col(track_col).alias("track"),
        F.col(dtg).alias("dtg"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
        speed.alias("speed_ms"),
        (speed.isNull() | (speed <= F.lit(vmax_ms))).alias("is_valid"),
    )


def dwell_episodes(
    df: DataFrame,
    fence: tuple[float, float, float, float],
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
) -> DataFrame:
    """Geofence dwell episodes: maximal runs of consecutive pings inside
    the ``fence`` bbox (min_lon, min_lat, max_lon, max_lat) per track —
    (track, episode, enter_dtg, exit_dtg, n_pings).

    The classic GeoMesa Kafka geofencing pattern (live feature index +
    CQL bbox trigger) expressed as a batch gaps-and-islands shape: an
    inside/outside flag, a transition counter via a running sum of
    flag-change markers, then one hash aggregate per (track, run).

    Scale: both windows and the final aggregate share the track-key
    partitioning — a single shuffle; pure built-ins end to end."""
    lo_x, lo_y, hi_x, hi_y = fence
    inside = (
        (F.col(lon) >= lo_x) & (F.col(lon) <= hi_x)
        & (F.col(lat) >= lo_y) & (F.col(lat) <= hi_y)
    )
    w = Window.partitionBy(track_col).orderBy(F.col(dtg).asc())
    run = Window.partitionBy(track_col).orderBy(F.col(dtg).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = df.withColumn("__in", inside).withColumn(
        "__chg",
        F.when(F.lag("__in").over(w).isNull() | (F.lag("__in").over(w) != F.col("__in")), 1)
        .otherwise(0),
    )
    t = t.withColumn("__run", F.sum("__chg").over(run)).where(F.col("__in"))
    return t.groupBy(
        F.col(track_col).alias("track"), F.col("__run").cast("int").alias("episode")
    ).agg(
        F.min(dtg).alias("enter_dtg"),
        F.max(dtg).alias("exit_dtg"),
        F.count("*").cast("int").alias("n_pings"),
    )


def od_matrix(
    df: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    track_col: str = "track",
    lon: str = "lon",
    lat: str = "lat",
    dtg: str = "dtg",
) -> DataFrame:
    """Origin–destination flow matrix: count consecutive per-track cell
    transitions over a width×height grid on ``bbox`` — (o_ix, o_iy,
    d_ix, d_iy, n_trips). Same floor-binning as tiles.density_grid, so
    OD cells line up with density/tile cells.

    The aggregate-movement analogue of the reference's DensityScan
    (flows between cells instead of mass per cell). Self-transitions
    (origin cell == destination cell) are dropped — they are dwell, not
    flow (``dwell_episodes`` covers those).

    Scale: one lead() window on the track key, then one hash aggregate
    on the (origin, destination) pair — two shuffles, both with
    map-side partials; out-of-bbox pings are filtered before the
    window so the shuffle carries only in-grid traffic."""
    x0, y0, x1, y1 = bbox
    dx = (x1 - x0) / width
    dy = (y1 - y0) / height
    inb = df.where(
        (F.col(lon) >= x0) & (F.col(lon) < x1) & (F.col(lat) >= y0) & (F.col(lat) < y1)
    )
    t = inb.select(
        F.col(track_col).alias("__trk"),
        F.col(dtg).alias("__dtg"),
        F.floor((F.col(lon) - x0) / dx).cast("int").alias("o_ix"),
        F.floor((F.col(lat) - y0) / dy).cast("int").alias("o_iy"),
    )
    w = Window.partitionBy("__trk").orderBy(F.col("__dtg").asc())
    t = (
        t.withColumn("d_ix", F.lead("o_ix").over(w))
        .withColumn("d_iy", F.lead("o_iy").over(w))
        .where(
            F.col("d_ix").isNotNull()
            & ((F.col("d_ix") != F.col("o_ix")) | (F.col("d_iy") != F.col("o_iy")))
        )
    )
    return t.groupBy("o_ix", "o_iy", "d_ix", "d_iy").agg(
        F.count("*").alias("n_trips")
    )


def track_label(
    df: DataFrame,
    track_col: str = "track",
    dtg: str = "dtg",
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest feature per track (reference: geomesa-process-vector
    TrackLabelProcess — one labeling feature per track, the most recent
    point). One window pass: row_number over (track, dtg desc
    [, tiebreak desc]) = 1 — the same latest-wins shape as the Kafka
    feature cache, partial-aggregated per shuffle partition by Spark's
    window TopK pushdown."""
    order = [F.col(dtg).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(track_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def resample_tracks(
    df: DataFrame,
    track_col: str,
    ts_col: str = "dtg",
    value_cols: tuple = ("lon", "lat"),
    step_s: int = 3600,
) -> DataFrame:
    """Resample each track onto an epoch-aligned time grid with linear
    interpolation between the surrounding pings — the fixed-rate
    trajectory normalization every movement pipeline runs before
    map-matching / sequence modeling (the interpolating dual of
    Point2PointProcess's consecutive-pair segments).

    Scale shape — NOT a range join (Catalyst would nested-loop it):
    per-track [min,max] bounds (tiny aggregate) generate the tick rows;
    ticks UNION pings then ONE shuffle+sort on the track key computes
    BOTH neighbors — ``last(ignorenulls)`` over the preceding frame and
    ``first(ignorenulls)`` over the following frame share the same
    Exchange+Sort, the asof_attach union-carry trick run in both
    directions. State per key = one running ping, any track count.

    Interpolation in coordinate space (antimeridian-crossing legs
    interpolate through ±180 linearly — documented, deterministic).
    Tie-break: a ping sorts BEFORE a coincident tick, so an on-ping tick
    takes the ping's exact values (frac = 0, no 0/0). Ticks outside
    [min,max] are not emitted. Output: (track, t epoch-seconds, one
    rounded double per value col); bit-exact — frac and lerp are fixed
    IEEE expressions mirrored by the oracle.

    Internally times are epoch MICROS (not truncated seconds), so
    sub-second pings keep distinct sort positions and exact lerp
    fractions; only exact duplicate (track, timestamp) pings are the
    caller's dedup responsibility (their carry order is unspecified).
    """
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pings = df.select(
        F.col(track_col).alias("__trk"),
        t.alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(v).cast("double").alias(v) for v in value_cols],
    )
    step = int(step_s) * 1_000_000
    bounds = pings.groupBy("__trk").agg(F.min("__t").alias("t0"), F.max("__t").alias("t1"))
    start = (F.ceil(F.col("t0") / step) * step).cast("long")
    ticks = (
        bounds.select("__trk", start.alias("__s"), "t1")
        # a short track may own no aligned tick at all (first tick past
        # its last ping) — sequence() would throw on start > stop
        .where(F.col("__s") <= F.col("t1"))
        .select(
            "__trk",
            F.explode(
                F.sequence(F.col("__s"), F.col("t1"), F.lit(step).cast("long"))
            ).alias("__t"),
            F.lit(1).alias("__tag"),
            *[F.lit(None).cast("double").alias(v) for v in value_cols],
        )
    )
    u = pings.unionByName(ticks)
    order = [F.col("__t"), F.col("__tag")]
    w_prev = (
        Window.partitionBy("__trk").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("__trk").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_ping = F.col("__tag") == 0
    pt = F.last(F.when(is_ping, F.col("__t")), ignorenulls=True).over(w_prev)
    nt = F.first(F.when(is_ping, F.col("__t")), ignorenulls=True).over(w_next)
    carried = u.select(
        "__trk", "__t", "__tag",
        pt.alias("__pt"), nt.alias("__nt"),
        *[F.last(F.when(is_ping, F.col(v)), ignorenulls=True).over(w_prev).alias(f"__p_{v}")
          for v in value_cols],
        *[F.first(F.when(is_ping, F.col(v)), ignorenulls=True).over(w_next).alias(f"__n_{v}")
          for v in value_cols],
    )
    frac = (F.col("__t") - F.col("__pt")) / (F.col("__nt") - F.col("__pt"))
    lerp = lambda v: F.round(  # noqa: E731
        F.when(
            F.col("__nt").isNull() | (F.col("__nt") == F.col("__pt")),
            F.col(f"__p_{v}"),
        ).otherwise(F.col(f"__p_{v}") + (F.col(f"__n_{v}") - F.col(f"__p_{v}")) * frac),
        6,
    )
    return carried.where(F.col("__tag") == 1).select(
        F.col("__trk").alias(track_col),
        # ticks are step-aligned micros with integral step_s → exact
        (F.col("__t") / 1_000_000).cast("long").alias("t"),
        *[lerp(v).alias(v) for v in value_cols],
    )


def route_search(
    points: DataFrame,
    route: DataFrame,
    radius_m: float,
    heading_col: str = "heading",
    tolerance_deg: float = 45.0,
    bidirectional: bool = True,
    bits: int = 6,
    point_keys: tuple[str, ...] = ("doc_id", "span_offset"),
    broadcast: bool | None = None,
) -> DataFrame:
    """Match moving points to a route by proximity AND heading
    (reference: geomesa-process-vector RouteSearchProcess — features
    within a buffer of a route LineString whose course matches the
    nearest route segment's bearing within a tolerance; bidirectional
    treats the route as undirected).

    Spark-first shape, all built-ins:

    1. route vertices → segments (lead window over ``vertex_id``);
    2. each segment's bbox expands by the radius (farthest-latitude
       longitude scaling, same safety argument as distance_join_bbox)
       and explodes into its grid-cell cover — broadcast unless the
       stats decider says otherwise;
    3. points equi-join the cover on cell; the refine computes the
       nearest point of the segment in coordinate space (clamped
       projection t ∈ [0,1]) and the exact haversine to it, plus the
       segment course = atan2(dx·cos(mid_lat), dy) from north;
    4. keep dist ≤ radius and heading-vs-course deviation ≤ tolerance
       (mod 180 when bidirectional);
    5. one winner per point: row_number over (point, dist asc, seg asc).

    Everything through step 5 is whole-stage codegen; the only shuffle
    is the window partition on the point key (the candidate join is
    broadcast for any sane route size).
    """
    w = Window.partitionBy("route_id").orderBy(F.col("vertex_id").asc())
    segs = (
        route.withColumn("__blon", F.lead("lon").over(w))
        .withColumn("__blat", F.lead("lat").over(w))
        .withColumn("seg_idx", F.row_number().over(w))
        .where(F.col("__blon").isNotNull())
        .select(
            "route_id",
            "seg_idx",
            F.col("lon").alias("__ax"),
            F.col("lat").alias("__ay"),
            F.col("__blon").alias("__bx"),
            F.col("__blat").alias("__by"),
        )
    )
    r_deg_lat = radius_m / 111_195.0
    far_lat = F.least(
        F.greatest(F.abs(F.col("__ay")), F.abs(F.col("__by"))) + F.lit(r_deg_lat),
        F.lit(90.0),
    )
    coslat = F.greatest(F.cos(F.radians(far_lat)), F.lit(1e-6))
    r_deg_lon = F.lit(r_deg_lat) / coslat
    boxes = segs.select(
        "*",
        (F.least("__ax", "__bx") - r_deg_lon).alias("min_lon"),
        (F.greatest("__ax", "__bx") + r_deg_lon).alias("max_lon"),
        (F.least("__ay", "__by") - F.lit(r_deg_lat)).alias("min_lat"),
        (F.greatest("__ay", "__by") + F.lit(r_deg_lat)).alias("max_lat"),
    )
    from geomesa_spark.operators.joins import cover_cells_for_polys
    from geomesa_spark.operators.extract import grid_cell

    if broadcast is None:
        from geomesa_spark.plans.decider import auto_broadcast, cover_explode_factor

        broadcast = auto_broadcast(route, cover_explode_factor(bits))
    cover = cover_cells_for_polys(boxes, bits).drop(
        "min_lon", "max_lon", "min_lat", "max_lat"
    )
    if broadcast:
        cover = F.broadcast(cover)

    pts = points.withColumn("cell", grid_cell(F.col("lon"), F.col("lat"), bits))
    cand = pts.join(cover, on="cell", how="inner").drop("cell")

    dx = F.col("__bx") - F.col("__ax")
    dy = F.col("__by") - F.col("__ay")
    dot = (F.col("lon") - F.col("__ax")) * dx + (F.col("lat") - F.col("__ay")) * dy
    len2 = dx * dx + dy * dy
    t = F.least(F.greatest(dot / len2, F.lit(0.0)), F.lit(1.0))
    nx = F.col("__ax") + t * dx
    ny = F.col("__ay") + t * dy
    course = F.degrees(
        F.atan2(dx * F.cos(F.radians((F.col("__ay") + F.col("__by")) / 2.0)), dy)
    )
    cand = cand.withColumn(
        "dist_m", haversine_m_col(F.col("lon"), F.col("lat"), nx, ny)
    ).withColumn("course_deg", course)
    # deviation in [0,180]; route segments are undirected when bidirectional
    dev = F.abs(F.pmod(F.col(heading_col) - F.col("course_deg") + 540.0, F.lit(360.0)) - 180.0)
    if bidirectional:
        dev = F.least(dev, 180.0 - dev)
    cand = cand.where(
        (F.col("dist_m") <= radius_m) & (dev <= F.lit(float(tolerance_deg)))
    )
    pw = Window.partitionBy(*point_keys).orderBy(
        F.col("dist_m").asc(), F.col("route_id").asc(), F.col("seg_idx").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(pw))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__ax", "__ay", "__bx", "__by")
    )
