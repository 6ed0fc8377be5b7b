"""Driver contract: entry (flagship), queries() and oracle_sql().

Every queries() entry is a Spark-first implementation of an operator
from SURVEY.md §2; the matching oracle_sql() entry re-derives the same
result in pure ANSI SQL (DuckDB) from the driver's parquet tables. The
engine's synthetic geo inputs (interleaved documents, polygon layers,
probe points — FIXTURES.md) are deterministic arithmetic over the
driver tables' keys, so the oracle can rebuild them term-for-term with
bit-identical IEEE doubles.

Run ``python tools/check_correctness.py`` to verify locally before the
driver does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared oracle CTE fragments (DuckDB ANSI SQL).
#
# pts: geo points hidden in the interleaved document spans — span offsets
# 1 and 4 carry POINT WKT (tables.py::_SPANS_EXPR); the arithmetic below
# mirrors it operation-for-operation so doubles match bit-exactly.
# ---------------------------------------------------------------------------

SQL_PTS = """
pts AS (
  SELECT printf('doc-%012d', d.doc_id) AS doc_id,
         CAST(g.j AS INT) AS span_offset,
         CAST(-18000 + (d.doc_id * 31 + g.j * 17) % 36000 AS DOUBLE) / 100.0 AS lon,
         CAST(-8500 + (d.doc_id * 53 + g.j * 29) % 17000 AS DOUBLE) / 100.0 AS lat
  FROM documents d CROSS JOIN (VALUES (1), (4)) AS g(j)
  WHERE g.j < 1 + (d.doc_id * 2654435761) % 7
)
"""
# NOTE on float parity: Spark parses the span-WKT literals from exact
# DECIMAL arithmetic (SQL literal 100.0 is DECIMAL in Spark), so the
# engine's lon/lat doubles are the correctly-rounded values of exact
# 2-decimal rationals. A single double division of the combined integer
# reproduces them bit-exactly (IEEE division is correctly rounded);
# two-step double arithmetic (-180.0 + h/100.0) would double-round.

# polygon layer (tables.py::poly_layers, n=200, skew on): bbox / convex /
# holed kinds; envelope = center ± size/2; holed = outer minus centered
# square hole of side size/2. The engine's ray-crossing kernel treats an
# axis-aligned ring as the half-open box [x0,x1)×[y0,y1) (geom.py::
# points_in_rings), and bbox-kind polygons are exact after the CLOSED
# envelope filter (joins.py refine='auto') — the oracle mirrors both.
SQL_POLYS = """
polys AS (
  SELECT printf('poly-%06d', t.k) AS poly_id,
         CASE CAST(t.k % 3 AS INT) WHEN 0 THEN 'bbox' WHEN 1 THEN 'convex' ELSE 'holed' END AS kind,
         -180.0 + CAST(t.k * 97 % 36000 AS DOUBLE) / 100.0 AS lon_c,
         -85.0 + CAST(t.k * 61 % 17000 AS DOUBLE) / 100.0 AS lat_c,
         (CAST(0.1 AS DOUBLE) + (t.k % 50) * CAST(0.05 AS DOUBLE))
           * (CASE WHEN t.k % 50 = 7 THEN CAST(20.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS size_deg
  FROM range(0, 2000) t(k)
),
polys_env AS (
  SELECT poly_id, kind,
         lon_c - size_deg / 2.0 AS min_lon, lat_c - size_deg / 2.0 AS min_lat,
         lon_c + size_deg / 2.0 AS max_lon, lat_c + size_deg / 2.0 AS max_lat,
         lon_c - size_deg / 2.0 / 2.0 AS hx0, lat_c - size_deg / 2.0 / 2.0 AS hy0,
         lon_c + size_deg / 2.0 / 2.0 AS hx1, lat_c + size_deg / 2.0 / 2.0 AS hy1
  FROM polys
)
"""

# second rectangle layer (tables.py::rect_layer, n=500) for the
# geometry×geometry joins; envelope arithmetic mirrored op-for-op
N_RECTS = 500
SQL_RECTS = f"""
rects AS (
  SELECT printf('rect-%05d', t.m) AS rect_id,
         -180.0 + CAST(t.m * 137 % 36000 AS DOUBLE) / 100.0 AS lon_c,
         -85.0 + CAST(t.m * 89 % 17000 AS DOUBLE) / 100.0 AS lat_c,
         0.2 + CAST(t.m % 40 AS DOUBLE) * 0.07 AS size_deg
  FROM range(0, {N_RECTS}) t(m)
),
rects_env AS (
  SELECT rect_id,
         lon_c - size_deg / 2.0 AS min_lon, lat_c - size_deg / 2.0 AS min_lat,
         lon_c + size_deg / 2.0 AS max_lon, lat_c + size_deg / 2.0 AS max_lat
  FROM rects
)
"""

# probe points (tables.py::query_points)
def _sql_probes(n: int) -> str:
    return f"""
probes AS (
  SELECT printf('q-%04d', t.m) AS q_id,
         -180.0 + CAST(t.m * 71 % 36000 AS DOUBLE) / 100.0 AS lon,
         -85.0 + CAST(t.m * 43 % 17000 AS DOUBLE) / 100.0 AS lat,
         CAST(1 + t.m % 20 AS INT) AS k,
         CAST(100.0 AS DOUBLE) * (1 + t.m % 1000) AS radius_m
  FROM range(0, {n}) t(m)
)
"""


# haversine distance matching operators/joins.py::haversine_m_col
# term-for-term (1=point, 2=probe)
def _sql_haversine(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    return (
        f"2.0 * 6371008.8 * asin(sqrt(least("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / 2), 2), 1.0)))"
    )


# point-in-polygon condition matching the engine's two-phase join
# (closed envelope for bbox kind; half-open ray-crossing box minus
# half-open hole for holed kind)
SQL_PIP_COND = """
CASE WHEN q.kind = 'bbox' THEN
       p.lon >= q.min_lon AND p.lon <= q.max_lon AND p.lat >= q.min_lat AND p.lat <= q.max_lat
     ELSE
       p.lon >= q.min_lon AND p.lon < q.max_lon AND p.lat >= q.min_lat AND p.lat < q.max_lat
       AND NOT (p.lon >= q.hx0 AND p.lon < q.hx1 AND p.lat >= q.hy0 AND p.lat < q.hy1)
END
"""

# z2 cell (curves/zorder.py::Z2SFC.index at 31 bits/dim) in pure SQL:
# normalize each dim then Morton-interleave with shift/or arithmetic.
SQL_Z2 = """
cells AS (
  SELECT doc_id, span_offset, lon, lat,
         CAST(least(CAST(floor((lon - (-180.0)) * (2147483648.0 / 360.0)) AS BIGINT), 2147483647) AS BIGINT) AS xi,
         CAST(least(CAST(floor((lat - (-90.0)) * (2147483648.0 / 180.0)) AS BIGINT), 2147483647) AS BIGINT) AS yi
  FROM pts
)
"""
SQL_MORTON = (
    "CAST(list_sum(list_transform(generate_series(0, 30), "
    "b -> (((xi >> b) & 1) << (2 * b)) + (((yi >> b) & 1) << (2 * b + 1)))) AS BIGINT)"
)

BBOX = (-150.0, -40.0, -50.0, 40.0)  # lon0, lat0, lon1, lat1 for filter queries

N_POLYS = 2000
N_PROBES = 5000
N_KNN_PROBES = 20


# ---------------------------------------------------------------------------
# Spark-side builders
# ---------------------------------------------------------------------------

def _utc(spark: SparkSession) -> None:
    """Epoch arithmetic (unix_timestamp) and timestamp outputs must be
    session-TZ-independent to match the naive-timestamp DuckDB oracle —
    the driver's session may not be UTC."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geomesa_spark.operators.extract import extract_geo_points
    from geomesa_spark.tables import documents_from_driver_table

    return extract_geo_points(documents_from_driver_table(spark, sf_dir))


def q_extract_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/ingest: geo-span extraction from interleaved documents."""
    return _points(spark, sf_dir)


def q_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 bbox predicate with Z2 coarse range pruning + exact refine."""
    from geomesa_spark.operators.extract import with_z2_cell
    from geomesa_spark.plans.planner import bbox_predicate, z2_range_predicate

    x0, y0, x1, y1 = BBOX
    # materialize the cell column BEFORE the multi-range predicate (the
    # stored-index-table shape, same as z3_select): filtering the
    # in-flight Morton expression clones it into every BETWEEN term and
    # the fused generate+filter method blows the JVM JIT size limit —
    # Spark then runs the stage INTERPRETED (observed 10-20× slower)
    pts = with_z2_cell(_points(spark, sf_dir)).localCheckpoint(eager=False)
    pred = z2_range_predicate([(x0, y0, x1, y1)]) & bbox_predicate((x0, y0, x1, y1))
    return pts.where(pred).select("doc_id", "span_offset", "lon", "lat")


def q_tile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 end-to-end with an oracle: points materialized through
    write_tiles' bucketed layout, read back with the bbox-PRUNED reader
    (only the prefix-hashed bucket dirs are listed; the cell ranges
    prune row groups inside) + exact refine — same rows as a plain bbox
    filter, via the storage-resident index-table path."""
    import os
    import shutil
    import tempfile

    from geomesa_spark.operators.extract import with_z2_cell
    from geomesa_spark.operators.tiles import read_tiles, write_tiles
    from geomesa_spark.plans.planner import bbox_predicate

    pts = with_z2_cell(_points(spark, sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), f"geomesa_tile_scan_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(path, ignore_errors=True)
    write_tiles(pts, path, cell_col="cell_z2", prefix_bits=8, n_buckets=16)
    t = read_tiles(spark, path, BBOX)
    return t.where(bbox_predicate(BBOX)).select(
        "doc_id", "span_offset", "lon", "lat"
    )


def q_z2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z2 index-key encoding (reference Z2SFC.index) as a column."""
    from geomesa_spark.operators.extract import with_z2_cell

    return with_z2_cell(_points(spark, sf_dir)).select(
        "doc_id", "span_offset", "cell_z2"
    )


def q_z3_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z3 spatio-temporal index-key encoding (reference Z3SFC.index,
    week-binned): (epoch_bin, cell_z3) per point with a deterministic
    event time."""
    from geomesa_spark.operators.extract import with_z3_cell

    pts = _points(spark, sf_dir)
    i = F.substring("doc_id", 5, 12).cast("long")
    pts = pts.withColumn(
        "dtg", F.timestamp_seconds(F.lit(1704067200) + i * 37 + F.col("span_offset") * 13)
    )
    return with_z3_cell(pts).select("doc_id", "span_offset", "epoch_bin", "cell_z3")


def q_z3_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Z3Histogram (geomesa-utils stats): counts per
    (epoch_bin, coarse z3 prefix) — the spatio-temporal heatmap the
    reference maintains as a mergeable stat; here one partial/final
    hash aggregation over the encoded keys."""
    from geomesa_spark.operators.extract import with_z3_cell

    _utc(spark)
    pts = _points(spark, sf_dir)
    i = F.substring("doc_id", 5, 12).cast("long")
    pts = pts.withColumn(
        "dtg", F.timestamp_seconds(F.lit(1704067200) + i * 37 + F.col("span_offset") * 13)
    )
    pts = with_z3_cell(pts)
    return (
        pts.groupBy(
            "epoch_bin",
            F.shiftrightunsigned(F.col("cell_z3"), 48).alias("z3_prefix"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def q_z3_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P6 end-to-end spatio-temporal indexed scan: Z3 coarse range
    predicate (per-epoch-bin BIGMIN ranges → parquet pushdown) + exact
    bbox/time refine — the full planner path, not just key encoding.

    The cell-keyed table is MATERIALIZED first (localCheckpoint), as a
    stored Z3 index table would be: filtering the in-flight encoding
    expression instead would clone the 63-bit interleave into every
    range term (each BETWEEN gets its own copy once the filter pushes
    through the projection) and Catalyst optimization explodes."""
    from geomesa_spark.operators.extract import with_z3_cell
    from geomesa_spark.plans.planner import bbox_predicate, z3_range_predicate

    _utc(spark)
    pts = _points(spark, sf_dir)
    i = F.substring("doc_id", 5, 12).cast("long")
    pts = pts.withColumn(
        "dtg", F.timestamp_seconds(F.lit(1704067200) + i * 37 + F.col("span_offset") * 13)
    )
    pts = with_z3_cell(pts).localCheckpoint(eager=False)
    t_lo = 1704067200 * 1000
    t_hi = (1704067200 + 250_000) * 1000
    x0, y0, x1, y1 = BBOX
    pred = (
        z3_range_predicate([(x0, y0, x1, y1)], t_lo, t_hi)
        & bbox_predicate((x0, y0, x1, y1))
        & (F.unix_timestamp("dtg") * 1000).between(t_lo, t_hi)
    )
    return pts.where(pred).select("doc_id", "span_offset", "lon", "lat")


def q_xz2_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 extended-geometry indexed scan: XZ2 sequence-code coarse
    ranges (Böhm enlarged cells, one key per geometry) + exact closed
    envelope-intersection refine over the polygon layer."""
    from geomesa_spark.operators.extract import with_xz2_cell
    from geomesa_spark.plans.planner import xz2_range_predicate

    x0, y0, x1, y1 = BBOX
    p = with_xz2_cell(_polys(spark, False))
    pred = (
        xz2_range_predicate([(x0, y0, x1, y1)])
        & (F.col("max_lon") >= x0) & (F.col("min_lon") <= x1)
        & (F.col("max_lat") >= y0) & (F.col("min_lat") <= y1)
    )
    return p.where(pred).select("poly_id", "kind")


def q_xz3_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 spatio-temporal EXTENDED-geometry indexed scan (reference
    XZ3IndexKeySpace): polygons with a deterministic event time get
    (epoch_bin, cell_xz3) keys; the query applies the XZ3 coarse range
    predicate + exact closed envelope-intersection and time refine."""
    from geomesa_spark.operators.extract import with_xz3_cell
    from geomesa_spark.plans.planner import xz3_range_predicate

    _utc(spark)
    p = _polys(spark, False)
    k = F.substring("poly_id", 6, 6).cast("long")
    p = p.withColumn("dtg", F.timestamp_seconds(F.lit(1704067200) + k * 3600))
    p = with_xz3_cell(p)
    x0, y0, x1, y1 = BBOX
    t_lo = 1704067200 * 1000
    t_hi = (1704067200 + 500 * 3600) * 1000
    pred = (
        xz3_range_predicate([(x0, y0, x1, y1)], t_lo, t_hi)
        & (F.col("max_lon") >= x0) & (F.col("min_lon") <= x1)
        & (F.col("max_lat") >= y0) & (F.col("min_lat") <= y1)
        & (F.unix_timestamp("dtg") * 1000).between(t_lo, t_hi)
    )
    return p.where(pred).select("poly_id", "kind")


def _polys(spark: SparkSession, oracle_kinds_only: bool) -> DataFrame:
    from geomesa_spark.tables import poly_layers

    p = poly_layers(spark, N_POLYS)
    if oracle_kinds_only:
        p = p.where(F.col("kind") != "convex")
    return p


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 spatial join (two-phase) vs bbox+holed polygons; the join
    shape (broadcast here — the layer fits) comes from the stats
    decider, not a hardcoded hint."""
    from geomesa_spark.operators.joins import spatial_join_points_in_polys

    j = spatial_join_points_in_polys(
        _points(spark, sf_dir), _polys(spark, True), bits=6, strategy="auto"
    )
    return j.select("doc_id", "span_offset", "poly_id")


def q_pip_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 variant: salted partitioned-hash spatial join — same rows as
    q_pip_join by construction (skew path exercised end-to-end)."""
    from geomesa_spark.operators.joins import spatial_join_points_in_polys

    j = spatial_join_points_in_polys(
        _points(spark, sf_dir), _polys(spark, True), bits=6,
        broadcast=False, salt_buckets=4,
    )
    return j.select("doc_id", "span_offset", "poly_id")


def q_pip_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.2 SQL-text surface WITHOUT the rewriter: raw spark.sql
    over the registered st_* catalog, certifying the identity-fallback
    semantics (BroadcastNestedLoopJoin + vectorized grouped kernel —
    every WKT ring goes through the ray-cast, so bbox-kind polygons use
    half-open semantics here, unlike the two-phase operator's
    closed-envelope fast path). Input is reduced (1-in-37 docs) so the
    deliberate cartesian stays cheap; the REWRITTEN path on full input
    is certified separately by pip_join_sql_pruned — the pair now
    exercises two different plans, not the same one twice."""
    from geomesa_spark.functions.st import register_st_functions

    register_st_functions(spark)
    pts = _points(spark, sf_dir).where(
        F.substring("doc_id", 5, 12).cast("long") % 37 == 0
    )
    pts.createOrReplaceTempView("doc_pts_small_v")
    _polys(spark, True).createOrReplaceTempView("polys_v")
    return spark.sql(
        """
        SELECT p.doc_id, p.span_offset, q.poly_id
        FROM doc_pts_small_v p JOIN polys_v q
          ON st_contains(q.wkt, st_point(p.lon, p.lat))
        """
    )


def q_pip_join_sql_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same SQL-text join routed through the spatial rewriter
    (plans/sql_rewrite.py, reference SQLRules.SpatialOptimizationsRule
    analogue): the st_contains join condition becomes a cell-cover
    equi-join (BroadcastHashJoin, not BroadcastNestedLoopJoin) with the
    st_contains kernel as residual refine — identical rows to
    q_pip_join_sql, scale-safe plan."""
    from geomesa_spark.plans.sql_rewrite import spatial_sql

    _points(spark, sf_dir).createOrReplaceTempView("doc_pts_v")
    _polys(spark, True).createOrReplaceTempView("polys_v")
    return spatial_sql(
        spark,
        """
        SELECT p.doc_id, p.span_offset, q.poly_id
        FROM doc_pts_v p JOIN polys_v q
          ON st_contains(q.wkt, st_point(p.lon, p.lat))
        """,
    )


def q_pip_join_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 over all polygon kinds incl. convex hexagons (PIP kernel path;
    hexagon refinement is oracle'd by the NumPy brute force in pytest)."""
    from geomesa_spark.operators.joins import spatial_join_points_in_polys

    j = spatial_join_points_in_polys(
        _points(spark, sf_dir), _polys(spark, False), bits=6, broadcast=True
    )
    return j.select("doc_id", "span_offset", "poly_id")


def _geom_layers(spark: SparkSession):
    from geomesa_spark.tables import rect_layer

    left = _polys(spark, False).where(F.col("kind") == "bbox").select(
        F.col("poly_id").alias("left_id"),
        "wkt", "min_lon", "min_lat", "max_lon", "max_lat",
    )
    right = rect_layer(spark, N_RECTS).withColumnRenamed("rect_id", "right_id")
    return left, right


def q_geom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 general form: geometry×geometry (layer-to-layer) spatial join
    with ST_Intersects — both sides explode their cell cover, pair-dedup
    before refine, batched NumPy predicate kernel (geom.batch_predicate,
    zero per-pair Python). Rect×rect intersects reduces to the CLOSED
    bbox-overlap test (pytest-proven kernel property), which the oracle
    states in ANSI SQL."""
    from geomesa_spark.operators.joins import spatial_join_geoms

    left, right = _geom_layers(spark)
    return spatial_join_geoms(left, right, bits=6).select("left_id", "right_id")


def q_geom_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry×geometry join with the CONTAINS predicate (left as
    container). For rect pairs the kernel's half-open vertex rule plus
    the collinear edge-touch rejection make containment ⇔ strictly
    inside — the oracle's strict-inequality form."""
    from geomesa_spark.operators.joins import spatial_join_geoms

    left, right = _geom_layers(spark)
    return spatial_join_geoms(left, right, bits=6, predicate="contains").select(
        "left_id", "right_id"
    )


def q_geom_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layer×layer join written as SQL text: the rewriter turns
    ``ON st_intersects(a.wkt, b.wkt)`` into a both-sides cell-cover
    equi-join with a reference-point dedup conjunct (one row per pair,
    no DISTINCT needed) + the batched st_intersects kernel as residual
    — BroadcastHashJoin, not the BroadcastNestedLoopJoin cartesian the
    raw UDF condition would plan."""
    from geomesa_spark.plans.sql_rewrite import spatial_sql

    left, right = _geom_layers(spark)
    left.createOrReplaceTempView("layer_a_v")
    right.createOrReplaceTempView("layer_b_v")
    return spatial_sql(
        spark,
        """
        SELECT a.left_id, b.right_id
        FROM layer_a_v a JOIN layer_b_v b
          ON st_intersects(a.wkt, b.wkt)
        """,
    )


def q_dwithin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/P5 proximity (DWITHIN) join against probe circles."""
    from geomesa_spark.operators.joins import distance_join
    from geomesa_spark.tables import query_points

    j = distance_join(_points(spark, sf_dir), query_points(spark, N_PROBES), bits=6)
    return j.select("q_id", "doc_id", "span_offset")


def q_dwithin_geom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 extended-geometry DWITHIN: points within 250 km of each rect
    layer feature — clamp-to-box + haversine refine (codegen), cover
    expanded by the radius with farthest-latitude lon scaling."""
    from geomesa_spark.operators.joins import distance_join_bbox
    from geomesa_spark.tables import rect_layer

    boxes = rect_layer(spark, N_RECTS).withColumnRenamed("rect_id", "box_id").drop("wkt")
    j = distance_join_bbox(_points(spark, sf_dir), boxes, radius_m=250_000.0, bits=6)
    return j.select("box_id", "doc_id", "span_offset")


def q_beyond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 BEYOND (ECQL dwithin complement): points farther than 500 km
    from EVERY probe — the DWITHIN join's matched keys anti-joined back
    against the point table (two codegen stages, no new kernel)."""
    from geomesa_spark.operators.joins import distance_join
    from geomesa_spark.tables import query_points

    pts = _points(spark, sf_dir)
    probes = query_points(spark, N_KNN_PROBES).withColumn("radius_m", F.lit(500_000.0))
    hit = distance_join(pts, probes, bits=6).select("doc_id", "span_offset").distinct()
    return pts.join(hit, ["doc_id", "span_offset"], "left_anti").select(
        "doc_id", "span_offset"
    )


def q_multi_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 multi-range scan: an OR of two disjoint bboxes through the Z2
    range planner (per-box BIGMIN ranges OR'd — the reference's
    FilterSplitter multi-range path) + exact refine."""
    from geomesa_spark.operators.extract import with_z2_cell
    from geomesa_spark.plans.planner import bbox_predicate, z2_range_predicate

    b1 = (-150.0, -40.0, -100.0, 10.0)
    b2 = (30.0, 20.0, 80.0, 60.0)
    # materialized cell column before the (two-box, even longer) range
    # list — see q_bbox_filter
    pts = with_z2_cell(_points(spark, sf_dir)).localCheckpoint(eager=False)
    pred = z2_range_predicate([b1, b2]) & (bbox_predicate(b1) | bbox_predicate(b2))
    return pts.where(pred).select("doc_id", "span_offset", "lon", "lat")


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 kNN via ring expansion + exact haversine re-rank."""
    from geomesa_spark.operators.knn import knn
    from geomesa_spark.tables import query_points

    probes = query_points(spark, N_KNN_PROBES).drop("radius_m")
    r = knn(_points(spark, sf_dir), probes, bits=6, k_max=20)
    out = r.select("q_id", "doc_id", "span_offset", F.col("rank").cast("int").alias("rank"))
    # keep the result alive for the driver's later action: knn's pass
    # caches are scoped to r's Python lifetime, and a derived frame
    # holds no reference to its parent (review finding r5 — without
    # this the caches released at return and the 3-scan plan reverted
    # to the measured 14-scan shape)
    out._knn_scope = r
    return out


def q_hex_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 on the HEXAGONAL grid (H3-style axial cells, curves/
    hexgrid.py): per-hex point counts — assignment is pure codegen
    (fractional axial transform + cube rounding with floor(x+0.5), no
    banker's ties), mirrored double-for-double by the oracle."""
    from geomesa_spark.curves.hexgrid import hex_qr

    pts = _points(spark, sf_dir)
    q, r = hex_qr(F.col("lon"), F.col("lat"), 5.0)
    return (
        pts.select(q.alias("hq"), r.alias("hr"))
        .groupBy("hq", "hr")
        .agg(F.count("*").alias("cnt"))
    )


def q_hex_ring_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex ring-expansion join (the H3 kRing neighborhood query): each
    probe explodes its kRing(2) cell array (codegen array literal) and
    broadcast-equi-joins the hex-celled point table. Oracle: hex cells
    recomputed in SQL + the exact axial-distance condition
    (|dq|+|dr|+|dq+dr|)/2 ≤ k."""
    from geomesa_spark.curves.hexgrid import hex_cell, hex_neighbors
    from geomesa_spark.tables import query_points

    pts = _points(spark, sf_dir).withColumn(
        "hcell", hex_cell(F.col("lon"), F.col("lat"), 5.0)
    )
    probes = query_points(spark, N_KNN_PROBES).select(
        "q_id", hex_cell(F.col("lon"), F.col("lat"), 5.0).alias("hcell")
    )
    ring = probes.select(
        "q_id", F.explode(hex_neighbors(F.col("hcell"), 2)).alias("hcell")
    )
    j = pts.join(F.broadcast(ring), on="hcell", how="inner")
    return j.select("q_id", "doc_id", "span_offset")


def q_density_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 DensityScan: 72×34 heatmap over the full domain."""
    from geomesa_spark.operators.tiles import density_grid

    return density_grid(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_smooth_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 focal variant: tent-kernel (radius 1) convolution of the
    72×34 density grid — the heatmap smoothing pass, computed over the
    aggregated grid, not the raw points."""
    from geomesa_spark.operators.tiles import smooth_density

    return smooth_density(
        _points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34, radius=1
    )


def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 converter ingest certified end-to-end: the customer table is
    written to CSV, re-ingested through the SFT-typed converter
    (read_delimited with an SFT spec), and must reproduce the original
    rows bit-for-bit (doubles round-trip through Spark's full-precision
    CSV writer)."""
    import tempfile

    from geomesa_spark.sources.convert import read_delimited

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    tmp = tempfile.mkdtemp(prefix="csv_ingest_")
    c.coalesce(4).write.mode("overwrite").option("header", "true").csv(tmp)
    return read_delimited(
        spark,
        tmp,
        "c_custkey:Long,c_name:String,c_nationkey:Long,c_acctbal:Double,c_mktsegment:String",
        header=True,
    )


def q_orc_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 export sink certified end-to-end: nation exported to ORC via
    the export layer, read back, joined shape preserved."""
    import tempfile

    from geomesa_spark.sources.export import export

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    tmp = tempfile.mkdtemp(prefix="orc_export_") + "/t"
    export(n, tmp, "orc")
    return spark.read.orc(tmp)


def q_query_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 unified Query surface end-to-end: ECQL filter + DENSITY_*
    hints through plans/query.py::run_query — certifies the reference's
    single-query-object front door at the driver level (filter wider
    than the density bbox so each conjunct is exercised separately)."""
    from geomesa_spark.plans.query import run_query

    return run_query(
        _points(spark, sf_dir),
        filter="BBOX(geom, -120, -60, 120, 60)",
        hints={"density_bbox": (-90.0, -45.0, 90.0, 45.0),
               "density_width": 36, "density_height": 18},
    )


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster pyramid rollup: density tiles at zoom levels 6→3, each
    parent aggregating its four children."""
    from geomesa_spark.operators.tiles import tile_pyramid

    return tile_pyramid(_points(spark, sf_dir), max_bits=6, min_bits=3)


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiling: fixed-resolution tile id per point (bits=8 grid)."""
    from geomesa_spark.operators.extract import grid_cell

    return _points(spark, sf_dir).select(
        "doc_id", "span_offset",
        grid_cell(F.col("lon"), F.col("lat"), 8).alias("tile_id"),
    )


def q_vectorize_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster → vector: thresholded density cells merged into
    4-adjacent connected regions with envelope + stats (inverse of the
    DensityScan direction; oracle re-derives the regions with a
    recursive-CTE closure)."""
    from geomesa_spark.operators.tiles import vectorize_density

    return vectorize_density(
        _points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34, min_weight=2.0
    )


def q_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row invariant: span sequence (kind,text,media_ref,order) is
    untouched after the document flows through the spatial-join pipeline.
    Output: docs that matched ≥1 polygon with an md5 signature of their
    full span sequence — the oracle recomputes the signature from
    scratch; equality proves byte-level preservation."""
    from geomesa_spark.operators.joins import spatial_join_points_in_polys
    from geomesa_spark.tables import documents_from_driver_table

    docs = documents_from_driver_table(spark, sf_dir)
    pairs = spatial_join_points_in_polys(
        _points(spark, sf_dir), _polys(spark, True), bits=6, broadcast=True
    )
    hit = pairs.select("doc_id").distinct()
    out = docs.join(hit, "doc_id", "inner")
    sig = F.md5(
        F.concat_ws(
            "|",
            F.transform(
                F.col("spans"),
                lambda s: F.concat_ws(
                    ":",
                    s["kind"],
                    s["offset"].cast("string"),
                    s["text"],
                    s["media_ref"],
                ),
            ),
        )
    )
    return out.select(
        "doc_id", F.size("spans").alias("n_spans"), sig.alias("span_sig")
    )


# ---------------------------------------------------------------------------
# Relational / stats queries (SURVEY §2.4-2.7) over the driver tables
# ---------------------------------------------------------------------------

def q_media_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, driver-checked: media spans (image/audio)
    extracted from the interleaved documents with their refs — the
    typed-metadata side of the opaque-binary pipeline (decode itself is
    the documented codec seam, pytest-gated)."""
    from geomesa_spark.tables import documents_from_driver_table

    docs = documents_from_driver_table(spark, sf_dir)
    s = docs.select("doc_id", F.explode("spans").alias("s")).where(
        F.col("s.kind").isin("image", "audio")
    )
    return s.select(
        "doc_id",
        F.col("s.offset").alias("span_offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
    )


def q_stats_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 Stat DSL certified end-to-end: the reference's nested spec
    string (GroupBy(attr, TopK(...))) parsed and evaluated by
    run_stats_dsl — the text surface over the aggregation layer."""
    from geomesa_spark.operators.stats import run_stats_dsl

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spec = "GroupBy(event_type,TopK(user_id,3))"
    return run_stats_dsl(ev, spec)[spec]


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing, driver-checked end-to-end: media
    refs → Arrow-batched load (deterministic md5-keyed fake payload) →
    decode dims (first two payload bytes). Certifies the full
    mapInPandas chain — schema evolution, batch shape, null handling —
    with the codec itself remaining the documented strict-mode seam."""
    from geomesa_spark.operators.multimodal import (
        decode_image, extract_media_refs, load_media,
    )
    from geomesa_spark.tables import documents_from_driver_table

    docs = documents_from_driver_table(spark, sf_dir)
    m = decode_image(load_media(extract_media_refs(docs)))
    return m.select(
        "doc_id", "span_offset", "media_ref", "width", "height", "channels"
    )


def q_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 MinMax + count over events."""
    from geomesa_spark.operators.stats import minmax

    _utc(spark)
    return minmax(spark.read.parquet(f"{sf_dir}/events.parquet"), ["value", "ts"])


def q_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 GroupBy stat: per-event-type count/min/max."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 sketch form END-TO-END with an exact oracle: Spark's mergeable
    count_min_sketch aggregate over event_id%97 (partial sketches per
    partition, merged in the final agg — the reference Frequency.scala
    distribution shape), the one-row binary decoded driver-side
    (stats.cms_decode — the documented client-side merge seam) and
    queried for every live item. With 97 items in a 2000-wide × 7-deep
    seeded sketch no item collides in all rows, so the estimates equal
    the exact counts and the oracle is a plain GROUP BY."""
    from geomesa_spark.operators.stats import (
        cms_decode, cms_estimate_long, frequency_sketch,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "item", (F.col("event_id") % 97).cast("long")
    )
    buf = frequency_sketch(ev, "item", eps=0.001, confidence=0.99, seed=42).collect()[
        0
    ]["cms"]
    sk = cms_decode(bytes(buf))
    rows = [(i, cms_estimate_long(sk, i)) for i in range(97)]
    return spark.createDataFrame(rows, "item bigint, est bigint").where(
        F.col("est") > 0
    )


def q_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O4 TopK heavy hitters with deterministic tie-break."""
    from geomesa_spark.operators.stats import topk

    return topk(spark.read.parquet(f"{sf_dir}/events.parquet"), "user_id", 10)


def q_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 fixed-width histogram of events.value (20 bins over [0,500])."""
    from geomesa_spark.operators.stats import histogram

    return histogram(spark.read.parquet(f"{sf_dir}/events.parquet"), "value", 20, 0.0, 500.0)


def q_descriptive_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 descriptive stats, decimal-exact for cross-engine sums."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = F.sum(F.col("value").cast("decimal(18,6)"))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        s.cast("double").alias("sum_value"),
        (s.cast("double") / F.count("*")).alias("avg_value"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (union + ordered-window carry — one shuffle, no range
    join): each click event attaches the most recent prior-or-equal
    view event's value for the same user; oracle = correlated
    latest-row subquery."""
    from geomesa_spark.operators.temporal import asof_attach

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click")
    views = ev.where(F.col("event_type") == "view")
    out = asof_attach(
        clicks, views, keys=["user_id"], value_cols=("value",),
        right_tiebreak="event_id",
    )
    return out.select("event_id", "user_id", F.col("value_asof"))


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join via time-bin cover equi-join (the
    temporal analogue of the cell-cover spatial join — no nested-loop
    range join): 50 deterministic intervals against the event stream."""
    from geomesa_spark.operators.temporal import interval_join

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = spark.range(0, 50).select(
        F.format_string("iv-%03d", F.col("id")).alias("interval_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 50400).alias("start"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("id") * 50400 + (F.col("id") % 5 + 1) * 3600
        ).alias("end"),
    )
    return interval_join(ev, iv, bin_s=3600).select("interval_id", "event_id")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min-gap analogue at 1h): per-user
    session index from one window pass — the batch form of streaming
    session windows."""
    from geomesa_spark.operators.temporal import sessionize

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, ["user_id"], "ts", gap_s=3600, tiebreak="event_id").select(
        "event_id", "user_id", F.col("session_idx").cast("int").alias("session_idx")
    )


def q_window_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 'latest per key' window (Kafka cache latest-state analogue)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


def q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 per-key 1-in-k sampling (reference SamplingIterator)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") % 10 == 1)
        .select("event_type", "event_id")
    )


def q_or_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 OR-split union + dedup (reference FilterSplitter OR handling)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.where(F.col("value") < 50.0)
    b = ev.where((F.col("event_type") == "click") & (F.col("value") < 200.0))
    return a.unionByName(b).select("event_id").dropDuplicates(["event_id"])


def q_lambda_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 lambda latest-wins merge of transient + persistent layers."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    persistent = ev.where(F.col("event_id") % 2 == 0).withColumn("prio", F.lit(0))
    transient = ev.where(F.col("event_id") % 3 == 0).withColumn("prio", F.lit(1))
    u = persistent.unionByName(transient)
    w = Window.partitionBy("event_id").orderBy(F.col("prio").desc())
    return (
        u.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", F.col("prio").cast("int").alias("prio"))
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (general relational agg parity;
    decimal-exact sums so the oracle matches bit-for-bit)."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    d = lambda c: c.cast("decimal(28,6)")  # noqa: E731
    disc_price = d(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    charge = d(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        * (F.lit(1.0) + F.col("l_tax"))
    )
    out = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(d(F.col("l_quantity"))).cast("double").alias("sum_qty"),
        F.sum(d(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )
    return out.orderBy("l_returnflag", "l_linestatus")


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue (pure filter + aggregate; exact
    decimal sum so the oracle matches bit-for-bit)."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    f = l.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,6)"))
    return f.agg(rev.cast("double").alias("revenue"), F.count("*").alias("n_items"))


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority shape (adapted to the driver schema:
    no o_shippriority column — o_orderpriority carried instead):
    3-way join, decimal-exact revenue, deterministic top-10."""
    _utc(spark)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    j = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(28,6)")
    )
    out = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        rev.cast("double").alias("revenue")
    )
    return out.orderBy(
        F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
    ).limit(10)


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier-volume shape: 6-way join with the
    dimension chain (region→nation→supplier/customer) broadcast and the
    fact-fact join (lineitem⋈orders) left to Catalyst/AQE — decimal-
    exact revenue for bit-equal oracle sums."""
    _utc(spark)
    r = spark.read.parquet(f"{sf_dir}/region.parquet").where(F.col("r_name") == "ASIA")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    sn = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey)
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .join(c, (o.o_custkey == F.col("c_custkey")) & (F.col("c_nationkey") == sn.s_nationkey))
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(28,6)")
    )
    return (
        j.groupBy("n_name")
        .agg(rev.cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting shape: 4-way join (fact chain
    + broadcast nation dim), revenue per customer over returned items,
    deterministic top-20."""
    _utc(spark)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_returnflag") == "R"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(28,6)")
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion-effect shape: fact⋈dim join with a LIKE-prefix
    conditional aggregate; both sums decimal-exact, final ratio computed
    in double from identical operands so the oracle matches bit-for-bit."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    dp = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    promo = F.sum(F.when(F.col("p_type").like("PROMO%"), dp).otherwise(F.lit(0).cast("decimal(28,6)")))
    total = F.sum(dp)
    return j.agg(
        (F.lit(100.0) * promo.cast("double") / total.cast("double")).alias("promo_pct"),
        F.count("*").alias("n_items"),
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted-revenue shape (p_size stands in for the
    missing p_container): a disjunction of brand/size/quantity conjunct
    groups that Catalyst pushes into both scans as an OR filter."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    br = lambda b, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(1, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    f = j.where(br("Brand#12", 5, 1, 11) | br("Brand#13", 10, 10, 20) | br("Brand#14", 15, 20, 30))
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(28,6)")
    )
    return f.agg(rev.cast("double").alias("revenue"), F.count("*").alias("n_items"))


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority-checking shape (late shipment stands in
    for the missing commit/receipt dates): EXISTS-correlated lineitem
    probe planned as a left-semi hash join, counts per priority."""
    _utc(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume-customer shape: HAVING-filtered aggregate
    over the fact table planned as a semi join back onto orders, then
    the customer dim; decimal-exact quantity sums."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("__sq"))
        .where(F.col("__sq") > 300)
        .select("l_orderkey")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # no broadcast hint on the HAVING key list: its size is data-dependent
    # (could be huge at scale), so AQE's runtime size check picks the
    # semi-join strategy
    j = (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity shape (every customer here has
    orders, so 'lapsed since 2000' replaces 'never ordered'): scalar
    aggregate threshold + anti join, grouped by market segment.
    Threshold is decimal-sum/count evaluated in double on both sides so
    the boundary compare is bit-identical."""
    _utc(spark)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thr = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("__thr")
        )
    )
    wealthy = c.crossJoin(F.broadcast(thr)).where(F.col("c_acctbal") > F.col("__thr"))
    lapsed = wealthy.join(o, wealthy.c_custkey == o.o_custkey, "left_anti")
    return (
        lapsed.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer-distribution shape: left outer join + count,
    then the distribution of counts — two aggregations with the outer
    join preserving zero-order customers."""
    _utc(spark)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top-supplier shape: revenue aggregate reused twice —
    once per supplier, once for the global max — joined on equality
    (aggregate-over-aggregate, the classic CTE reuse)."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(28,6)")
        ).alias("__r")
    )
    mx = rev.agg(F.max("__r").alias("__m"))
    top = rev.join(mx, rev.__r == mx.__m).select("l_suppkey", "__r")
    return (
        s.join(top, s.s_suppkey == top.l_suppkey)
        .select("s_suppkey", "s_name", F.col("__r").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order shape: correlated scalar
    aggregate subquery (per-part average quantity) de-correlated into
    an aggregate + join; threshold compare in double from decimal-exact
    operands on both sides."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)
    )
    avg_q = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double")
            / F.count("*")
        ).alias("__avg")
    )
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_q, l.l_partkey == F.col("__pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("__avg"))
    )
    return j.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based window analytics: per-user 4-row moving average of
    event values (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) — the
    sliding-frame analogue next to the latest-per-key window; sum/count
    computed exactly, one double division."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("mavg"),
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume-shipping shape: two nation roles (supplier vs
    customer side) with the bidirectional pair condition as an OR in
    the join, grouped by nation pair and shipment year."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n1 = n.select(F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("__ck"), F.col("n_name").alias("cust_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("__sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("__ck"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(28,6)")
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(rev.cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 market-share shape: conditional-sum ratio per year —
    the target nation's revenue share of a region's volume for one part
    type; both sums decimal-exact, ratio in double."""
    _utc(spark)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").where(
        F.col("p_type").like("ECONOMY%")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").where(F.col("r_name") == "ASIA")
    # customers restricted to the ASIA region (the market); the share is
    # the fraction supplied by NATION_3
    cn = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    sn = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("__snk"),
    ).select("s_suppkey", "supp_nation")
    vol = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(28,6)")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey, "left_semi")
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
    )
    share = (
        F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(28,6)"))).cast("double")
        / F.sum(vol).cast("double")
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(share.alias("mkt_share"), F.count("*").alias("n_items"))
        .orderBy("o_year")
    )


def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset window analytics: per-user value delta vs the previous
    event (lag) and next event id (lead) — the offset-window primitives
    next to the sliding frame; subtraction of identical doubles is
    bit-exact across engines."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta"),
        F.lead("event_id", 1).over(w).alias("next_event"),
    )


def q_bin_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 BIN record packing: (track, secs, lon, lat) over the canonical
    fixture layer (reference BinAggregatingScan 16-byte records)."""
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    lay = canonical_layer(spark, 2000)
    return lay.select(
        F.col("__fid__").alias("fid"),
        F.col("name").alias("track"),
        F.unix_timestamp("dtg").alias("secs"),
        "lon",
        "lat",
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations: INTERSECT and EXCEPT between two event
    slices (absent in the reference; Spark built-ins per SURVEY)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.where(F.col("value") < 100.0).select("event_id")
    b = ev.where(F.col("event_type").isin("click", "view")).select("event_id")
    inter = a.intersect(b).withColumn("op", F.lit("intersect"))
    exc = a.exceptAll(b).distinct().withColumn("op", F.lit("except"))
    return inter.unionByName(exc)


def q_sorted_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 sort + limit with deterministic tie-break."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.orderBy(F.col("value").desc(), F.col("event_id").asc()).limit(20).select(
        "event_id", "value"
    )


def q_attr_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 attribute-index join: filtered attribute projection → fid →
    record lookup."""
    from geomesa_spark.operators.joins import attribute_join
    from geomesa_spark.tables import canonical_layer

    lay = canonical_layer(spark, 2000)
    attr_idx = lay.select("name", "__fid__").where(F.col("name") == "name3")
    return attribute_join(attr_idx, lay, broadcast=True).select(
        F.col("__fid__").alias("fid"), "name", "age"
    )


def q_tube_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 tube-select: spatio-temporal corridor join along a track."""
    from geomesa_spark.operators.joins import tube_select

    pts = _points(spark, sf_dir)
    # deterministic event time per point, derived from the doc number
    i = F.substring("doc_id", 5, 12).cast("long")
    pts = pts.withColumn(
        "dtg", F.timestamp_seconds(F.lit(1704067200) + i * 37 + F.col("span_offset") * 13)
    )
    tube = spark.range(0, 21).select(
        F.lit("t0").alias("tube_id"),
        F.col("id").cast("int").alias("vertex_id"),
        (F.lit(-150.0) + F.col("id") * 2.0).alias("lon"),
        (F.lit(-40.0) + F.col("id") * 3.0).alias("lat"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias("dtg"),
    )
    out = tube_select(pts, tube, radius_m=500_000.0, time_window_s=14400, bits=6)
    return out.select("doc_id", "span_offset", "vertex_id")


def q_track_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point2PointProcess analogue: canonical-layer points grouped into
    per-name tracks, time-ordered, emitted as LINESTRING WKT (%.6f
    coordinate text — oracle printf parity)."""
    from geomesa_spark.operators.tracks import track_lines
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    lay = canonical_layer(spark, 2000)
    return track_lines(lay, track_col="name")


def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F4 geohash surface as a HOT-PATH codegen expression
    (st_geoHash / st_geomFromGeoHash back the scalar catalog; this is
    the column form — curves/geohash.py): precision-8 base-32 geohash
    per point plus the precision-4 prefix counts the reference's
    GeoHash-gridded aggregations use, one projection + one hash agg."""
    from geomesa_spark.curves.geohash import geohash_col

    pts = _points(spark, sf_dir)
    gh = pts.withColumn("gh8", geohash_col(F.col("lon"), F.col("lat"), 8))
    return gh.select(
        "doc_id", "span_offset", "gh8", F.substring("gh8", 1, 4).alias("gh4")
    )


def q_ecql_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECQL filter-language front-end end-to-end through the
    QueryPlanner analogue: parse text → FilterSplitter primary (bbox +
    DURING interval) → coarse Z3 range predicate on the materialized
    index columns → exact compiled residual (reference: every GeoMesa
    entry point accepts ECQL — CLI -q/--cql, GeoMesaRelation CQL;
    planning per FilterSplitter.scala). DURING is exclusive (OGC
    temporal During), mirrored in the oracle."""
    from geomesa_spark.operators.extract import with_z3_cell
    from geomesa_spark.plans.ecql import plan_ecql

    _utc(spark)
    pts = _points(spark, sf_dir)
    i = F.substring("doc_id", 5, 12).cast("long")
    pts = pts.withColumn(
        "dtg", F.timestamp_seconds(F.lit(1704067200) + i * 37 + F.col("span_offset") * 13)
    )
    idx = with_z3_cell(pts).localCheckpoint(eager=False)
    x0, y0, x1, y1 = BBOX
    text = (
        f"BBOX(geom, {x0}, {y0}, {x1}, {y1}) "
        "AND dtg DURING 2024-01-01T00:00:00Z/2024-01-03T21:26:40Z "
        "AND doc_id LIKE 'doc-%' AND span_offset BETWEEN 0 AND 3"
    )
    return plan_ecql(idx, text, z3_cols=("epoch_bin", "cell_z3")).select(
        "doc_id", "span_offset", "lon", "lat"
    )


# ECQL polygon literal: an L1 diamond centered off the 0.01 coordinate
# grid (center .005, radius 40.0033) so no synthesized point lies on the
# boundary — the kernel's crossing-parity decision and the oracle's
# closed-form |dx|+|dy| < r test then agree everywhere with a >=1.7e-3
# margin (grid sums are exact multiples of 0.01)
_ECQL_DIAMOND = (
    "POLYGON((-39.9983 0.005, 0.005 40.0083, 40.0083 0.005, "
    "0.005 -39.9983, -39.9983 0.005))"
)


def q_ecql_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECQL INTERSECTS against a constant (non-rectangular) polygon
    literal: compiles to ONE Arrow-vectorized PIP kernel closed over the
    driver-parsed geometry — no join, no per-row Python — plus a negated
    attribute conjunct exercising NOT/AND compilation."""
    from geomesa_spark.plans.ecql import compile_ecql

    pts = _points(spark, sf_dir)
    text = f"INTERSECTS(geom, {_ECQL_DIAMOND}) AND NOT (span_offset = 4 AND lat < 0)"
    return pts.where(compile_ecql(text)).select("doc_id", "span_offset", "lon", "lat")


def q_ecql_dwithin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECQL DWITHIN with unit conversion (kilometers), compiled to the
    pure-codegen haversine — term-for-term the oracle's SQL expression."""
    from geomesa_spark.plans.ecql import compile_ecql

    pts = _points(spark, sf_dir)
    text = "DWITHIN(geom, POINT(-100.005 20.005), 2500, kilometers)"
    return pts.where(compile_ecql(text)).select("doc_id", "span_offset", "lon", "lat")


def q_ecql_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECQL attribute-only filter (the attribute-index/full-scan path):
    IN / BETWEEN / NOT LIKE / IS NOT NULL / AFTER / nested NOT-AND over
    the events table — everything stays in whole-stage codegen."""
    from geomesa_spark.plans.ecql import compile_ecql

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    text = (
        "event_type IN ('click','view') AND value BETWEEN 10 AND 200 "
        "AND props NOT LIKE '%7%' AND user_id IS NOT NULL "
        "AND ts AFTER 2024-01-05T00:00:00Z "
        "AND NOT (event_type = 'view' AND value > 150)"
    )
    return ev.where(compile_ecql(text)).select(
        "event_id", "event_type", "value", "user_id"
    )


def q_ecql_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query TRANSFORMS: GeoMesa's relational projection with derived
    attributes in the GeoTools expression language (reference:
    QueryPlanner transform handling / TransformProcess) — filter + the
    derived-column projection compile to one select over one scan,
    Catalyst prunes to exactly the referenced columns."""
    from geomesa_spark.plans.ecql import plan_ecql

    x0, y0, x1, y1 = BBOX
    return plan_ecql(
        _points(spark, sf_dir),
        f"BBOX(geom, {x0}, {y0}, {x1}, {y1}) AND span_offset <= 4",
        transforms=[
            "doc_id",
            "span_offset",
            "label=strConcat(strToUpperCase(strSubstring(doc_id, 0, 3)), '-X')",
            "x2=getX(geom) * 2 + 1",
            "dy=abs(floor(getY(geom)))",
        ],
    )


def q_ecql_within_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OGC boundary semantics of WITHIN/TOUCHES/INTERSECTS (round-4
    ADVICE fix, reference: GeoTools/JTS DE-9IM — Within is T*F**F***,
    a point ON the polygon boundary intersects and touches but is NOT
    within). Points snap to a coarse grid so rows land EXACTLY on the
    rectangle's edges; the oracle states the three predicates
    arithmetically."""
    from geomesa_spark.plans.ecql import compile_ecql

    pts = _points(spark, sf_dir).select(
        "doc_id",
        "span_offset",
        (F.floor(F.col("lon") / 50) * 50).cast("double").alias("px"),
        (F.floor(F.col("lat") / 20) * 20).cast("double").alias("py"),
    )
    wkt = "POLYGON((-100 -40, 0 -40, 0 40, -100 40, -100 -40))"
    w = compile_ecql(f"WITHIN(geom, {wkt})", lon="px", lat="py")
    t = compile_ecql(f"TOUCHES(geom, {wkt})", lon="px", lat="py")
    i = compile_ecql(f"INTERSECTS(geom, {wkt})", lon="px", lat="py")
    return (
        pts.withColumn("w", w).withColumn("t", t).where(i)
        .select("doc_id", "span_offset", "px", "py", "w", "t")
    )


def q_ecql_or_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive OPEN temporal intervals through the planner (round-4
    ADVICE fix: `AFTER t1 OR BEFORE t2` with t1 > t2 covers ALL time —
    the split must widen to the open union, never the inverted (t1,t2)
    z3 range that silently dropped every row). Runs the full
    parse → split → coarse-z3 → residual path on materialized index
    columns."""
    from geomesa_spark.operators.extract import with_z3_cell
    from geomesa_spark.plans.ecql import plan_ecql

    _utc(spark)
    pts = _points(spark, sf_dir)
    i = F.substring("doc_id", 5, 12).cast("long")
    pts = pts.withColumn(
        "dtg", F.timestamp_seconds(F.lit(1704067200) + i * 37 + F.col("span_offset") * 13)
    )
    idx = with_z3_cell(pts).localCheckpoint(eager=False)
    x0, y0, x1, y1 = BBOX
    text = (
        f"BBOX(geom, {x0}, {y0}, {x1}, {y1}) AND "
        "(dtg AFTER 2024-01-03T00:00:00Z OR dtg BEFORE 2024-01-02T00:00:00Z)"
    )
    return plan_ecql(idx, text, z3_cols=("epoch_bin", "cell_z3")).select(
        "doc_id", "span_offset", "lon", "lat"
    )


def q_sampling_k1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key sampling at fraction 1.0 through the query facade
    (round-4 ADVICE fix: k == 1 must keep EVERY row — the old
    `rn % k == 1` test is never true at k = 1)."""
    from geomesa_spark.plans.query import run_query

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id"
    )
    return run_query(ev, hints={"sampling": 1.0, "sample_by": "event_type"})


def q_sampling_per_key3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key deterministic 1-in-3 sampling through the query facade
    (SamplingIterator per-key thinning; the oracle replays the exact
    window-rank-mod rule)."""
    from geomesa_spark.plans.query import run_query

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id"
    )
    return run_query(ev, hints={"sampling": 1 / 3, "sample_by": "event_type"})


def q_csv_ingest_scripted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 converter ingest with a SCRIPTED transform (reference
    geomesa-convert-common .../transforms/ScriptingFunctionFactory.scala
    — converter configs calling user functions): the customer table
    round-trips through CSV and a registered vectorized Python function
    builds a derived attribute via udf:tag($2, $3); the oracle states
    the same derivation in SQL."""
    import tempfile

    from geomesa_spark.sources.convert import (
        read_delimited,
        register_script,
        unregister_script,
    )

    def tag(name, nationkey):
        return name.str.upper() + "#" + nationkey

    register_script("tag", tag, "string")
    try:
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        tmp = tempfile.mkdtemp(prefix="csv_scripted_")
        c.coalesce(4).write.mode("overwrite").option("header", "true").csv(tmp)
        # the compiled Column closes over the UDF object itself, so the
        # registry entry may be released as soon as compile finishes
        return read_delimited(
            spark,
            tmp,
            "c_custkey:Long,label:String",
            transforms={"c_custkey": "$1", "label": "udf:tag($2, $3)"},
            header=True,
        )
    finally:
        unregister_script("tag")


def q_track_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrackLabelProcess analogue: one labeling feature per track — the
    most recent point (reference geomesa-process-vector
    TrackLabelProcess). Single window pass over the canonical layer;
    dtg is strictly increasing per track so the winner is unique."""
    from geomesa_spark.operators.tracks import track_label
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    lay = canonical_layer(spark, 2000)
    out = track_label(lay, track_col="name")
    return out.select(
        F.col("name").alias("track"), "age", "dtg", "lon", "lat"
    )


def q_route_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RouteSearchProcess analogue: geo points (with a deterministic
    synthetic heading) matched to a 24-segment route when within 600 km
    of a segment AND heading within 45° of the segment course
    (bidirectional); nearest segment wins per point. Cell-cover
    broadcast join + codegen clamp/haversine/bearing refine + one
    window argmin — mirrored term-for-term by the oracle."""
    from geomesa_spark.operators.tracks import route_search

    pts = _points(spark, sf_dir)
    i = F.substring("doc_id", 5, 12).cast("long")
    pts = pts.withColumn(
        "heading", ((i * 7 + F.col("span_offset") * 11) % 360).cast("double")
    )
    route = spark.range(0, 25).select(
        # non-foldable constant: a literal route_id would be inlined into
        # route_search's per-route window partition spec and folded away,
        # planning a "No Partition Defined" global WindowExec
        F.when(F.col("id") >= 0, "r0").otherwise("rX").alias("route_id"),
        F.col("id").cast("int").alias("vertex_id"),
        (F.lit(-160.0) + F.col("id") * 7.0).alias("lon"),
        (F.lit(-50.0) + F.col("id") * 3.5).alias("lat"),
    )
    out = route_search(
        pts, route, radius_m=600_000.0, tolerance_deg=45.0, bidirectional=True, bits=6
    )
    return out.select(
        "doc_id", "span_offset", F.col("seg_idx").cast("int").alias("seg_idx"),
        "dist_m", "course_deg",
    )


def q_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumeration stat / UniqueProcess analogue (geomesa-utils stats
    EnumerationStat; geomesa-process-vector UniqueProcess): exact
    value→count map for an attribute plus first/last timestamps —
    one partial/final hash aggregation."""
    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(F.col("event_type").alias("value")).agg(
        F.count("*").alias("cnt"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def q_hash_attribute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashAttributeProcess analogue: deterministic hash of an
    attribute mod n_bins (the reference adds hash%bins for viz
    bucketing/coloring). Hash contract = the engine-wide polynomial
    rolling hash (text.with_fingerprint); per-bin counts certify the
    full per-row hash assignment."""
    from geomesa_spark.operators.text import with_fingerprint

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn(
        "__k", F.format_string("u-%d|%s", F.col("user_id"), F.col("event_type"))
    )
    hashed = with_fingerprint(ev, text_col="__k", out="__h")
    return hashed.groupBy(
        F.pmod(F.col("__h"), F.lit(16)).cast("int").alias("bin")
    ).agg(F.count("*").alias("cnt"))


def q_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 visibility filtering: deterministic Accumulo-style label per
    event, filtered for auths {user, internal} through the expression
    evaluator (operators/visibility.py). The oracle enumerates which
    label classes the auth set satisfies."""
    from geomesa_spark.operators import visibility as V

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    labeled = ev.withColumn(
        "visibility",
        F.element_at(
            F.array(
                F.lit(""),                          # everyone
                F.lit("user"),                      # granted
                F.lit("admin"),                     # denied
                F.lit("admin|(user&internal)"),     # granted via conjunction
                F.lit("user&admin"),                # denied
            ),
            (F.col("event_id") % 5 + 1).cast("int"),
        ),
    )
    return V.filter_by_auths(labeled, ("user", "internal")).select(
        "event_id", "visibility"
    )


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 writer semantics end-to-end: init a fid-bucketed table from
    events, apply an upsert delta (value+1000 for event_id%5==0, two
    synthetic inserts dropped again by a later delete) and delete-by-fid
    tombstones (event_id%7==0), COMPACT (bucket-scoped rewrite), and
    read the final state — the oracle recomputes it relationally."""
    import os
    import shutil
    import tempfile

    from geomesa_spark.sources import upsert as U

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = os.path.join(tempfile.gettempdir(), f"geomesa_upsert_q_{os.path.basename(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    U.init_table(ev, path, fid_col="event_id", n_buckets=8)
    U.append_upserts(
        ev.where(F.col("event_id") % 5 == 0).withColumn("value", F.col("value") + 1000.0),
        path,
    )
    U.append_deletes(ev.where(F.col("event_id") % 7 == 0).select("event_id"), path)
    U.compact(spark, path)
    return U.read_latest(spark, path).select("event_id", "user_id", "event_type", "value")


def q_upsert_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 snapshot time travel: the same upsert table read AS OF the
    upsert delta (sequence 1) — updated values visible, the later
    delete tombstones not yet applied. Certifies the log-structured
    snapshot contract (read_asof) end-to-end against a relational
    reconstruction of that point in history."""
    import os
    import shutil
    import tempfile

    from geomesa_spark.sources import upsert as U

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"geomesa_upsert_asof_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(path, ignore_errors=True)
    U.init_table(ev, path, fid_col="event_id", n_buckets=8)
    s1 = U.append_upserts(
        ev.where(F.col("event_id") % 5 == 0).withColumn("value", F.col("value") + 1000.0),
        path,
    )
    U.append_deletes(ev.where(F.col("event_id") % 7 == 0).select("event_id"), path)
    return U.read_asof(spark, path, s1).select(
        "event_id", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# Training-data pipeline queries (dedup / text / similarity)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy."""
    from geomesa_spark.operators.dedup import exact_dedup

    return exact_dedup(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geomesa_spark.operators.text import with_token_stats

    return with_token_stats(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "n_chars_calc"
    )


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pretoken counts (token-budget estimation): JVM
    regexp_extract_all with a lookahead-free GPT-2-style pattern that
    Java regex and DuckDB's RE2 tokenize identically."""
    from geomesa_spark.operators.text import with_bpe_token_count

    return with_bpe_token_count(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "n_bpe_tokens")


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geomesa_spark.operators.text import with_language_id

    return with_language_id(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "stopword_ratio", "lang_pred"
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geomesa_spark.operators.text import with_quality_score

    return with_quality_score(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "diversity", "mean_tok_len", "punct_ratio", "quality"
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geomesa_spark.operators.text import with_fingerprint

    return with_fingerprint(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "fp"
    )


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join certified end-to-end: events and a
    per-user aggregate both persist as bucketBy(user_id)+sortBy tables
    (one pre-sorted file per bucket), the join plans with NO Exchange
    on either side (asserted), and the result matches the plain SQL
    join — the pay-the-shuffle-once layout for repeated big-x-big
    joins at 100 TB."""
    import os
    import tempfile

    from geomesa_spark.sources.bucketed import (
        bucketed_join_is_colocated,
        read_bucketed,
        write_bucketed,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull()
    )
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    # STABLE temp location: the harness invokes queries repeatedly and a
    # fresh mkdtemp per call would leak two table copies per invocation
    # (saveAsTable overwrite repoints the catalog without deleting the
    # old external path)
    # per-process path: stable across repeated invocations in ONE
    # process (no leak per call), isolated across concurrent processes
    # (driver + standalone gate) that would otherwise clobber each
    # other's buckets mid-query
    tmp = os.path.join(tempfile.gettempdir(), f"geomesa_spark_bucketed_join_{os.getpid()}")
    write_bucketed(ev.select("event_id", "user_id", "value"), "bj_events",
                   n_buckets=8, bucket_col="user_id", path=f"{tmp}/ev")
    write_bucketed(agg, "bj_users", n_buckets=8, bucket_col="user_id",
                   path=f"{tmp}/agg")
    # merge-join hint pins the big-x-big shape (a broadcast would hide
    # whether the bucketing carries the join); with both sides bucketed
    # the SortMergeJoin needs NO shuffle exchange
    j = read_bucketed(spark, "bj_events").hint("merge").join(
        read_bucketed(spark, "bj_users").hint("merge"), "user_id"
    )
    if not bucketed_join_is_colocated(j):  # not assert: survives python -O
        raise RuntimeError("bucketed join planned a shuffle")
    return j.select("event_id", "user_id", "value", "n_events", "total_value")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (the data-loader contiguous-fill
    step): docs in deterministic order within each language group are
    assigned pack ids + token offsets against a 512-token budget; the
    oracle replays the same prefix-sum arithmetic."""
    from geomesa_spark.operators.corpus import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, seq_tokens=512, by=["lang"]).select(
        "doc_id", "lang", "n_tokens", "pack_id", "pack_offset"
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: email/phone/IPv4/card spans
    replaced with typed placeholders + per-kind audit counts, all JVM
    regexp built-ins (no UDF). PII-shaped spans are synthesized
    deterministically into every third document IN BOTH ENGINES, then
    both scrub with the identical pattern strings (Java regex and RE2
    agree on this conservative subset — verified char-for-char)."""
    from geomesa_spark.operators.text import scrub_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@ex.com or +1 555 123 4567 ip 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    out = scrub_pii(aug)
    return out.select(
        "doc_id",
        "scrubbed",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_card").cast("int").alias("n_card"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geomesa_spark.operators.dedup import with_simhash

    return with_simhash(spark.read.parquet(f"{sf_dir}/documents.parquet")).select(
        "doc_id", "simhash"
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup JOIN: Hamming ≤ 5 pairs via 6-band blocking —
    EXACT by pigeonhole (d < bands ⇒ some band slice matches), so the
    oracle is the brute-force all-pairs Hamming filter, which also
    certifies the banding loses nothing."""
    from geomesa_spark.operators.dedup import simhash_pairs, with_simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(with_simhash(docs), max_hamming=5, bands=6).select(
        "key_a", "key_b", F.col("hamming").cast("int").alias("hamming")
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (token sets, 16 perms,
    4 bands × 4 rows)."""
    from geomesa_spark.operators.dedup import lsh_candidate_pairs, with_minhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = with_minhash(docs, n_hashes=16, shingle_k=1)
    return lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components (HashMin
    label propagation) over the MinHash-LSH candidate-pair graph — the
    canonical-representative assignment a dedup pipeline keys its
    keep/drop decision on. Oracle: recursive-CTE transitive closure
    with min-label aggregation."""
    from geomesa_spark.operators.dedup import (
        dedup_clusters, lsh_candidate_pairs, with_minhash,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = with_minhash(docs, n_hashes=16, shingle_k=1)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    return dedup_clusters(pairs)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs blocked by source."""
    from geomesa_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(
        docs, block_col="source", shingle_k=1, threshold=0.7
    )


def q_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (the embedding leg of the dedup
    suite): self-join within hyperplane-LSH buckets + exact cosine
    refine. The oracle mirrors the bucket bits AND the sequential-fold
    dot/norm arithmetic bit-for-bit, so the threshold decision is
    identical. (The synthetic embeddings have no true near-dups — the
    0.3 threshold certifies the candidate+refine machinery on the
    upper tail of the similarity distribution.)"""
    from geomesa_spark.operators.ann import cosine_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_dup_pairs(emb, threshold=0.3, n_planes=4)


def q_embed_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTER resolution — the composition that
    closes the embedding dedup loop: cosine_dup_pairs (LSH buckets +
    exact refine) feeds dedup_clusters (pointer-jumping HashMin CC),
    reported as (cluster, n_members)."""
    from geomesa_spark.operators.ann import cosine_dup_pairs
    from geomesa_spark.operators.dedup import dedup_clusters

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = cosine_dup_pairs(emb, threshold=0.3, n_planes=4)
    labels = dedup_clusters(pairs)
    return labels.groupBy(F.col("label").alias("cluster")).agg(
        F.count("*").alias("n_members")
    )


def q_corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus keep/drop decision, composed from
    the pipeline's own operators: exact-dedup representative (min doc_id
    per content hash) ∧ language = 'en' ∧ quality ≥ 0.3 — one
    declarative plan (two scans fused by Catalyst, one aggregation for
    the dedup winners, broadcast semi-join back)."""
    from geomesa_spark.operators.dedup import exact_dedup
    from geomesa_spark.operators.text import with_language_id, with_quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keep = exact_dedup(docs).select(F.col("keep_key").alias("doc_id"))
    scored = with_quality_score(with_language_id(docs))
    return (
        scored.join(F.broadcast(keep), "doc_id", "inner")
        .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.3))
        .select("doc_id", "quality")
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: at most 5 docs per (lang, source) stratum, picked
    by md5-of-id order — deterministic, partition-layout-independent."""
    from geomesa_spark.operators.corpus import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(docs, ["lang", "source"], quota=5).select(
        "doc_id", "lang", "source"
    )


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainer sharding: deterministic global shuffle into 8 shards
    (rolling-hash of the id) with a stable in-shard position."""
    from geomesa_spark.operators.corpus import shard_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shard_assign(docs, 8).select(
        "doc_id", "shard", F.col("shard_pos").cast("int").alias("shard_pos")
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: word-3-gram overlap of every training
    doc against the held-out eval slice (doc_id % 97 == 0)."""
    from geomesa_spark.operators.corpus import contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    return contamination(train, bench, n=3)


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-document repetition removal: 8-token chunks, first occurrence
    wins, survivors rejoin in original order."""
    from geomesa_spark.operators.corpus import chunk_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_dedup(docs, chunk_tokens=8).select(
        "doc_id", "dedup_text", "n_kept_chunks", "n_dropped_chunks"
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: deterministic top-20 tokens by
    occurrence count with document frequency — the vocab-coverage table
    a tokenizer build reads first."""
    from geomesa_spark.operators.corpus import vocab_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_stats(docs, top_k=20)


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 5 probe vectors."""
    from geomesa_spark.operators.ann import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=5)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN (scale path; approximate)."""
    from geomesa_spark.operators.ann import lsh_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=5, n_planes=4)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (inverted-file scale path): deterministic coarse
    quantizer (first-8 vectors as centroids), nprobe=2 — oracle
    re-derives the clustering and probing bit-exactly."""
    from geomesa_spark.operators.ann import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, emb.where(F.col("vec_id") < 5), k=5, n_centroids=8, nprobe=2)


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------
# Round-5 operators: web-mercator tiling, zonal stats, track length,
# extent aggregate, TF-IDF, ANN range search, ROLLUP, self-proximity,
# span analytics, bucketed-layout restore
# ---------------------------------------------------------------------------

def q_web_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ (slippy-map) web-mercator tile assignment at z=6 + per-tile
    counts and the Bing quadkey (prefix-orderable tile key — ancestors
    are prefixes, so prefix ranges select subtrees like Z-prefixes do).
    Pure codegen floor/ln/tan column math; one hash aggregate."""
    from geomesa_spark.operators.tiles import web_mercator_tiles

    t = web_mercator_tiles(_points(spark, sf_dir), zoom=6)
    return t.groupBy("zx", "zy", "quadkey").agg(F.count("*").alias("n"))


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector zonal statistics: the 5° density grid aggregated
    per rectangle zone (count of cells, decimal-exact sum, min/max of
    the cell counts) — broadcast envelope join + one hash aggregate."""
    from geomesa_spark.operators.tiles import density_grid, zonal_stats
    from geomesa_spark.tables import rect_layer

    dens = density_grid(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)
    dens = dens.withColumn("lon_c", -180.0 + (F.col("ix") + 0.5) * 5.0).withColumn(
        "lat_c", -85.0 + (F.col("iy") + 0.5) * 5.0
    )
    # zones = rect envelopes buffered by 3° (a catchment margin — and it
    # keeps the zonal result non-trivially populated against the sparse
    # 5° cell lattice at sf0.01; exact double arithmetic both engines)
    zones = rect_layer(spark, N_RECTS).select(
        "rect_id",
        (F.col("min_lon") - 3.0).alias("min_lon"),
        (F.col("min_lat") - 3.0).alias("min_lat"),
        (F.col("max_lon") + 3.0).alias("max_lon"),
        (F.col("max_lat") + 3.0).alias("max_lat"),
    )
    return zonal_stats(dens, zones, zone_id="rect_id", value_col="cnt")


def q_track_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-track great-circle length (TrackLabel/track-statistics
    analogue): consecutive-leg haversine summed in time order, legs
    cast to DECIMAL(18,6) so the total is aggregation-order exact."""
    from geomesa_spark.operators.tracks import track_length
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return track_length(canonical_layer(spark, 2000), track_col="name")


def q_extent_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_extent bounding-box aggregate per group (the reference's
    MinMax-over-geometry stat): exact min/max envelope + count per
    track name — map-side partials, |groups| rows shuffle."""
    from geomesa_spark.operators.stats import extent
    from geomesa_spark.tables import canonical_layer

    return extent(canonical_layer(spark, 2000), group_cols=["name"])


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms. idf as the raw N/df ratio (ln
    is monotonic — identical ranking, zero transcendentals), so the
    score is one exact-integer double division: bit-stable in DuckDB."""
    from geomesa_spark.operators.text import tfidf_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_topk(docs, k=3)


def q_ann_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius similarity search (range-query dual of ann_cosine): all
    corpus vectors with rounded cosine ≥ 0.25 per probe, probes
    broadcast, zero shuffle."""
    from geomesa_spark.operators.ann import range_search

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return range_search(emb, emb.where(F.col("vec_id") < 5), tau=0.25)


def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP ROLLUP counts over (event_type, day): every prefix level +
    grand total in ONE Expand+hash-aggregate pass; gid is Catalyst's
    grouping_id ≡ ANSI GROUPING() bitmask."""
    from geomesa_spark.operators.stats import rollup_counts

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    r = rollup_counts(ev, ["event_type", "day"])
    # subtotal rows carry NULL group keys; stringify + sentinel so the
    # cross-engine compare isn't at the mercy of None-vs-NaT semantics
    # (gid already disambiguates subtotals from null data values)
    return r.select(
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        F.coalesce(F.col("day").cast("string"), F.lit("<all>")).alias("day"),
        "n",
        "gid",
    )


def q_self_dwithin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity SELF-join (reference ProximitySearchProcess on one
    layer): unordered point pairs within 75 km, cell-cover equi-join +
    exact haversine refine, pair de-dup by id order."""
    from geomesa_spark.operators.joins import distance_join

    pts = _points(spark, sf_dir)
    pid = F.concat_ws(":", F.col("doc_id"), F.col("span_offset").cast("string"))
    probes = pts.select(
        pid.alias("q_id"),
        "lon",
        "lat",
        F.lit(75000.0).alias("radius_m"),
    )
    pairs = distance_join(pts.withColumn("pid", pid), probes, bits=6)
    return pairs.where(F.col("pid") < F.col("q_id")).select(
        F.col("pid").alias("a_id"), F.col("q_id").alias("b_id"), "dist_m"
    )


def q_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-sequence analytics on the interleaved documents: per doc
    the span count by kind and the first media offset — the span-order
    invariant surfaced as queryable columns (one explode + one hash
    aggregate)."""
    from geomesa_spark.tables import documents_from_driver_table

    docs = documents_from_driver_table(spark, sf_dir)
    s = docs.select("doc_id", F.explode("spans").alias("s"))
    kind = F.col("s.kind")
    return s.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_spans"),
        F.sum(F.when(kind == "text", 1).otherwise(0)).cast("int").alias("n_text"),
        F.sum(F.when(kind == "geo", 1).otherwise(0)).cast("int").alias("n_geo"),
        F.sum(F.when(kind.isin("image", "audio"), 1).otherwise(0))
        .cast("int")
        .alias("n_media"),
        F.min(F.when(kind.isin("image", "audio"), F.col("s.offset"))).alias(
            "first_media_offset"
        ),
    )


def q_bucketed_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-layout durability end-to-end: write two co-bucketed
    tables, DROP them from the catalog (a fresh session's view of the
    world), re-register from the data-side _bucket_spec.json manifests,
    and the join still plans with NO shuffle Exchange (verified) —
    matching the plain SQL join row-for-row."""
    import os
    import tempfile

    from geomesa_spark.sources.bucketed import (
        bucketed_join_is_colocated,
        restore_bucketed,
        write_bucketed,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id").isNotNull()
    )
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("value").alias("max_value"),
    )
    tmp = os.path.join(tempfile.gettempdir(), f"geomesa_spark_bucketed_restore_{os.getpid()}")
    write_bucketed(ev.select("event_id", "user_id", "value"), "br_events",
                   n_buckets=8, bucket_col="user_id", path=f"{tmp}/ev")
    write_bucketed(agg, "br_users", n_buckets=8, bucket_col="user_id",
                   path=f"{tmp}/agg")
    # catalog loss: only the files + manifests survive
    spark.sql("DROP TABLE br_events")
    spark.sql("DROP TABLE br_users")
    left = restore_bucketed(spark, f"{tmp}/ev", "br_events")
    right = restore_bucketed(spark, f"{tmp}/agg", "br_users")
    j = left.hint("merge").join(right.hint("merge"), "user_id")
    if not bucketed_join_is_colocated(j):  # not assert: survives python -O
        raise RuntimeError("restored bucketed join planned a shuffle")
    return j.select("event_id", "user_id", "value", "n_events", "max_value")


def q_sq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization of the embedding corpus (the 4x vector
    compression step before ANN serving): per-dim min-max codes,
    exploded to (vec_id, pos, code) for exact cross-engine compare."""
    from geomesa_spark.operators.ann import scalar_quantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = scalar_quantize(emb, bits=8)
    return q.select(
        "vec_id", F.posexplode("codes").alias("pos", "code")
    ).select("vec_id", F.col("pos").cast("int").alias("pos"), "code")


def q_quadkey_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-pyramid rollup: per-tile point counts at zooms 4-6 in one
    pass via quadkey-prefix aggregation (the post-ingest pyramid
    materialization of a tile server)."""
    from geomesa_spark.operators.tiles import quadkey_pyramid, web_mercator_tiles

    t = web_mercator_tiles(_points(spark, sf_dir), zoom=6)
    return quadkey_pyramid(t, zoom=6, min_zoom=4)


def _pq_setup(spark: SparkSession, sf_dir: str):
    from geomesa_spark.operators.ann import pq_codebooks_from_rows

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # data-seeded codebooks (rows 0..15 per block) — the same
    # centroids-are-data-rows device the ann_ivf oracle uses, so the
    # encode/ADC mechanics are certified independently of training
    return emb, pq_codebooks_from_rows(emb, m=8, k=16)


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode (m=8 blocks, k=16 codes): 64-dim
    float vectors -> 8 small-int codes (~32x compression), one codegen
    projection with the codebook as a nested array literal."""
    from geomesa_spark.operators.ann import pq_encode

    emb, cbs = _pq_setup(spark, sf_dir)
    enc = pq_encode(emb, cbs)
    return enc.select(
        "vec_id", F.posexplode("codes").alias("block", "code")
    ).select("vec_id", F.col("block").cast("int").alias("block"), "code")


def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5: queries scored against the corpus
    through its 8-byte codes only (codebook-lookup fold, broadcast
    probes, no shuffle before the rank window)."""
    from geomesa_spark.operators.ann import pq_adc_topk, pq_encode

    emb, cbs = _pq_setup(spark, sf_dir)
    enc = pq_encode(emb, cbs)
    return pq_adc_topk(enc, emb.where(F.col("vec_id") < 3), cbs, k=5)


def q_raster_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local map algebra: the density grids of the even- and odd-doc
    halves ADD back to the full-corpus grid — a self-validating
    cell-aligned raster op (full outer join on the cell key)."""
    from geomesa_spark.operators.tiles import density_grid, raster_algebra

    pts = _points(spark, sf_dir)
    bbox = (-180.0, -85.0, 180.0, 85.0)
    idnum = F.regexp_extract(F.col("doc_id"), r"(\d+)", 1).cast("long")
    even = density_grid(pts.where(idnum % 2 == 0), bbox, 72, 34)
    odd = density_grid(pts.where(idnum % 2 == 1), bbox, 72, 34)
    return raster_algebra(even, odd, op="add")


def q_speed_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPS-trace cleaning: per-ping ground speed over the time-ordered
    track window with a plausibility flag (vmax 40 m/s) — the per-leg
    dual of track_length. The canonical layer's 10-hour 10° legs sit
    near 31·cos(lat) m/s with lat/antimeridian wraps supplying genuine
    outliers, so both flag values occur."""
    from geomesa_spark.operators.tracks import speed_legs
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return speed_legs(canonical_layer(spark, 2000), track_col="name", vmax_ms=40.0)


def q_od_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin–destination flow matrix: consecutive per-track cell
    transitions over the 36×17 10° grid (DensityScan's movement dual —
    flows between cells instead of mass per cell); self-transitions
    dropped."""
    from geomesa_spark.operators.tracks import od_matrix
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return od_matrix(
        canonical_layer(spark, 2000), (-180.0, -85.0, 180.0, 85.0), 36, 17,
        track_col="name",
    )


def q_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence dwell episodes: maximal in-fence runs per track — the
    batch form of the reference's Kafka geofencing pattern, as a
    gaps-and-islands window + one aggregate. The fence spans the
    canonical layer's whole latitude band (−84.5..−79.5) and lon
    [−30, 30], so each track alternates in/out on its 10°-per-hop lon
    cycle — multiple multi-ping episodes per track."""
    from geomesa_spark.operators.tracks import dwell_episodes
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return dwell_episodes(
        canonical_layer(spark, 2000), (-30.0, -85.0, 30.0, -79.0), track_col="name"
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-repetition quality signals per document (top-word
    fraction, distinct-word ratio, duplicate-bigram fraction) — pure
    higher-order array expressions, zero shuffle."""
    from geomesa_spark.operators.text import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs)


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (DescriptiveStats percentile
    extension): p25/p50/p90 of event value per event_type — ANSI
    linear interpolation, rounded 6 dp to pin the cross-engine
    double."""
    from geomesa_spark.operators.stats import quantiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return quantiles(ev, "value", (0.25, 0.5, 0.9), group_cols=["event_type"])


def q_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density hotspots: strict local maxima of the 72×34 grid (Moore
    neighborhood), weight ≥ 2 — kernel-explode neighbor max, no
    inequality self-join."""
    from geomesa_spark.operators.tiles import hotspots

    return hotspots(
        _points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34, min_weight=2.0
    )


def q_gi_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* over the 72×34 count grid — statistically
    normalized hotspot scores (binary 3×3 weights incl. self,
    global moments over all 2448 cells)."""
    from geomesa_spark.operators.tiles import gi_star

    return gi_star(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K pair counts at 75/150/300 km — one cover self-join at
    the max radius, per-radius cumulative counts from the tiny explode."""
    from geomesa_spark.operators.joins import pair_correlation

    pts = _points(spark, sf_dir)
    pid = F.concat_ws(":", F.col("doc_id"), F.col("span_offset").cast("string"))
    return pair_correlation(pts, pid, (75000.0, 150000.0, 300000.0), bits=5)


def q_emerging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-hotspot analysis over the canonical tracks: per 10°
    cell, Mann-Kendall S on 500 h binned counts → intensifying /
    diminishing / stable (14/14/8 mix at n=2000)."""
    from geomesa_spark.operators.tiles import emerging_hotspots
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return emerging_hotspots(
        canonical_layer(spark, 2000), (-180.0, -85.0, 180.0, 85.0), 36, 17,
        ts_col="dtg", bin_hours=500, tau=1,
    )


def q_knox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction over the canonical tracks: pairs
    within 200 km AND 48 h vs the independence expectation. One cover
    self-join (space) + one time-bin equi-join (time) — never all
    pairs; the oracle IS the all-pairs cartesian."""
    from geomesa_spark.operators.joins import knox_test
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return knox_test(
        canonical_layer(spark, 2000),
        F.col("__fid__"),
        delta_s_m=200000.0,
        delta_t_s=48 * 3600,
        ts_col="dtg",
        bits=5,
    )


def q_clark_evans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark–Evans nearest-neighbor index over the doc points: exact NN
    distance per point via kNN k=2 (self ranks first at 0), exact
    decimal mean, R vs CSR expectation at a fixed reference area."""
    from geomesa_spark.operators.stats import clark_evans

    pts = _points(spark, sf_dir)
    pid = F.concat_ws(":", F.col("doc_id"), F.col("span_offset").cast("string"))
    return clark_evans(pts, pid, area_m2=510000000000000.0, bits=6)


def q_quadrat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat dispersion test on the 72×34 grid (gi_star's grid):
    VMR from exact integer moments — empty quadrats contribute zero to
    both sums, so they never materialize."""
    from geomesa_spark.operators.tiles import quadrat_test

    return quadrat_test(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_global_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global General G + Moran's I over the 72×34 count grid — four
    exact integer sums + two closed-form grid constants; empty-cell z
    terms folded into the W/degree arithmetic."""
    from geomesa_spark.operators.tiles import global_autocorr

    return global_autocorr(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_directional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse per span_offset group: closed-form
    covariance eigen-axes (sqrt-only — no atan/sin/cos), exact decimal
    moments."""
    from geomesa_spark.operators.stats import directional_distribution

    return directional_distribution(_points(spark, sf_dir), ["span_offset"])


def q_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Hausdorff distance between all 45 canonical track
    pairs — candidate pairs fence the point-pair product; min/max of
    identical haversine doubles, no float-order concerns."""
    from geomesa_spark.operators.tracks import hausdorff_pairs
    from geomesa_spark.tables import canonical_layer

    df = canonical_layer(spark, 2000)
    names = df.select("name").distinct()
    pairs = (
        names.select(F.col("name").alias("track_a"))
        .crossJoin(names.select(F.col("name").alias("track_b")))
        .where(F.col("track_a") < F.col("track_b"))
    )
    return hausdorff_pairs(df, pairs, track_col="name")


def q_clq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Colocation quotient between the span_offset categories of the
    doc points at k=5 — kNN-derived neighbor sets (self dropped by a
    deterministic re-rank), exact integer counts."""
    from geomesa_spark.operators.stats import colocation_quotient

    pts = _points(spark, sf_dir)
    pid = F.concat_ws(":", F.col("doc_id"), F.col("span_offset").cast("string"))
    return colocation_quotient(pts, pid, "span_offset", k=5, bits=6)


def q_encounters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-track encounter detection on the canonical tracks: ping
    pairs within 50 km AND 2 h, per unordered track pair — one cover
    self-join; time + pair-order are refinement filters on it."""
    from geomesa_spark.operators.tracks import encounters
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return encounters(
        canonical_layer(spark, 2000), "name", 50000.0, 7200, ts_col="dtg", bits=5
    )


def q_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking of the documents table (32-token
    windows, 8-token overlap): one codegen projection + one posexplode,
    no shuffle."""
    from geomesa_spark.operators.corpus import chunk_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_text(docs.select("doc_id", "text"), size=32, overlap=8)


def q_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence enter/exit events for two bbox fences over the
    canonical tracks — broadcast dim product + one (fence, track)
    window; ts reported as epoch seconds (timestamp-free compare)."""
    from geomesa_spark.operators.tracks import geofence_events
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    fences = spark.createDataFrame(
        [("f-0", -50.0, -85.0, 50.0, -80.0), ("f-1", 100.0, -83.0, 170.0, -81.0)],
        "fence_id string, min_lon double, min_lat double, max_lon double, max_lat double",
    )
    ev = geofence_events(canonical_layer(spark, 2000), fences, track_col="name")
    return ev.select(
        "fence_id",
        "track",
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("ts_s"),
        "event",
    )


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix between event types per user stream —
    one keyed window + two hash aggregates; exact counts, one ratio."""
    from geomesa_spark.operators.temporal import transition_matrix

    _utc(spark)
    return transition_matrix(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_sinuosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-track sinuosity over the canonical tracks: decimal-exact
    path length / first-to-last chord, one window + one aggregate."""
    from geomesa_spark.operators.tracks import sinuosity
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return sinuosity(canonical_layer(spark, 2000), track_col="name")


def q_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid flow field on the 36×17 (10°) grid: mean displacement
    vector of legs starting in each cell, decimal-exact sums."""
    from geomesa_spark.operators.tracks import flow_field
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    return flow_field(
        canonical_layer(spark, 2000), (-180.0, -85.0, 180.0, 85.0), 36, 17,
        track_col="name",
    )


def q_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-weighted rasterization of the 500 rects onto the 72×34
    grid: per cell, touching-rect count + exact fractional coverage."""
    from geomesa_spark.operators.tiles import rasterize_coverage
    from geomesa_spark.tables import rect_layer

    return rasterize_coverage(
        rect_layer(spark, N_RECTS), (-180.0, -85.0, 180.0, 85.0), 72, 34
    )


def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat inverted-index postings over the documents (df ≥ 50):
    one posexplode + two hash aggregates, exact integer stats."""
    from geomesa_spark.operators.text import inverted_postings

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return inverted_postings(docs.select("doc_id", "text"), min_df=50)


def q_lag_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of hourly event counts (empty hours
    zero-filled via a bounds-derived dense axis — no global window)."""
    from geomesa_spark.operators.temporal import lag_autocorr

    _utc(spark)
    return lag_autocorr(spark.read.parquet(f"{sf_dir}/events.parquet"), 3600)


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of events.value — float-free digit
    extraction via the exact fixed-point integer's decimal string."""
    from geomesa_spark.operators.stats import benford_digits

    return benford_digits(spark.read.parquet(f"{sf_dir}/events.parquet"), "value")


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention triangle over the events stream — exact
    distinct-user counts, cohort size attached by a broadcast join."""
    from geomesa_spark.operators.temporal import cohort_retention

    _utc(spark)
    return cohort_retention(spark.read.parquet(f"{sf_dir}/events.parquet"), 86400)


def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl concentration of events per user (hot-key screen) —
    two exact integer sums, one ratio."""
    from geomesa_spark.operators.stats import hhi_concentration

    return hhi_concentration(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "user_id"
    )


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint over hourly event counts — exact-integer
    argmax via one sorted in-array fold; no global window."""
    from geomesa_spark.operators.temporal import cusum_changepoint

    _utc(spark)
    return cusum_changepoint(spark.read.parquet(f"{sf_dir}/events.parquet"), 3600)


def q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event_type × ISO weekday, with
    Cramér's V — observed-cells-only telescoped sum, exact decimal
    accumulation."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.stats import chi2_contingency

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "dow", F.expr("weekday(CAST(ts AS TIMESTAMP))")
    )
    return chi2_contingency(ev, "event_type", "dow")


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of events-per-user — count-of-counts fold,
    no global window over the key table."""
    from geomesa_spark.operators.stats import gini_concentration

    return gini_concentration(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "user_id"
    )


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.25) of hourly event counts — seeded in-array fold,
    replayed ulp-identically by a recursive-CTE oracle."""
    from geomesa_spark.operators.temporal import ewma_bins

    _utc(spark)
    return ewma_bins(spark.read.parquet(f"{sf_dir}/events.parquet"), 3600, alpha=0.25)


def q_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares isolines at count threshold 9 over the 72×34
    grid — broadcast case-table join, exact-integer saddle rule."""
    from geomesa_spark.operators.tiles import contour_segments

    return contour_segments(
        _points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34, 9
    )


def q_dissolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope dissolve over the 500-rect layer — cell-cover pair
    fence + pointer-jumping CC + min/max merge (no float sums)."""
    from geomesa_spark.operators.tiles import dissolve_envelopes
    from geomesa_spark.tables import rect_layer

    return dissolve_envelopes(rect_layer(spark, N_RECTS))


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial ANTI join: geo spans outside every rect envelope — one
    LEFT ANTI hash join on the cell key, containment as residual."""
    from geomesa_spark.operators.joins import envelope_anti_join
    from geomesa_spark.tables import rect_layer

    return envelope_anti_join(_points(spark, sf_dir), rect_layer(spark, N_RECTS))


def q_allen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen relation between each user's click span and view span —
    exact epoch-micros comparisons, first-match CASE."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.temporal import allen_relations

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def span(t):
        return (
            ev.where(F.col("event_type") == t)
            .groupBy("user_id")
            .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
        )

    return allen_relations(span("click"), span("view"), "user_id")


def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 6-hour event debounce per user — per-key seeded fold,
    recursive-CTE oracle (min-ts chaining)."""
    from geomesa_spark.operators.temporal import debounce

    _utc(spark)
    return debounce(spark.read.parquet(f"{sf_dir}/events.parquet"), 21600)


def q_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: purchase×error event pairs with |Δvalue| <= 0.05 —
    bucket-fenced equi join, exact residual."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.joins import band_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    l = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"), "value"
    )
    r = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("b_id"), "value"
    )
    return band_join(l, r, "a_id", "b_id", eps=0.05)


def q_embed_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the 64 embedding dims —
    pair posexplode + decimal-exact sums, broadcast mean join."""
    from geomesa_spark.operators.ann import embedding_covariance

    return embedding_covariance(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def q_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z: purchase rate of even- vs odd-id users — one
    conditional aggregate, sqrt-only tail."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.stats import two_proportion_z

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 2 == 0).alias("grp"),
        (F.col("event_type") == "purchase").alias("succ"),
    )
    return two_proportion_z(ev, "grp", "succ")


def q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend of hourly event counts over the dense zero-filled
    axis — five exact integer sums, fixed IEEE tail."""
    from geomesa_spark.operators.temporal import trend_bins

    _utc(spark)
    return trend_bins(spark.read.parquet(f"{sf_dir}/events.parquet"), 3600)


def q_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap stats — one keyed lag window + one
    hash aggregate, micros-exact."""
    from geomesa_spark.operators.temporal import inter_arrival

    _utc(spark)
    return inter_arrival(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding by 15 min over the events stream — pins
    Spark's built-in window() semantics against an exact micros
    oracle."""
    from geomesa_spark.operators.temporal import sliding_window_counts

    _utc(spark)
    return sliding_window_counts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), 3600, 900
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the hyperplane-LSH index vs brute-force cosine —
    the index-evaluation loop, composed from the two certified ANN
    paths; oracle composes their shared SQL fragments."""
    from geomesa_spark.operators.ann import cosine_topk, lsh_cosine_topk, recall_at_k

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 5)
    return recall_at_k(
        lsh_cosine_topk(emb, probes, k=5, n_planes=4),
        cosine_topk(emb, probes, k=5),
    )


def q_focal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal min/max/sum/count over the 72×34 grid's Moore
    neighborhoods — kernel explode + one hash aggregate, all
    integers."""
    from geomesa_spark.operators.tiles import focal_stats

    return focal_stats(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn's-method slope magnitude on the count raster — exact
    integer 8×gradients, sqrt-only tail."""
    from geomesa_spark.operators.tiles import slope_grid

    return slope_grid(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_topshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows owned by the 10 heaviest users — count-of-counts block
    fold, no window over the key table."""
    from geomesa_spark.operators.stats import top_share

    return top_share(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "user_id", 10
    )


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal: words in > 50% of documents dropped,
    order-preserving rebuild — broadcast anti join on the frequent
    vocabulary."""
    from geomesa_spark.operators.corpus import remove_frequent_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return remove_frequent_lines(docs.select("doc_id", "text"))


def q_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user co-presence micros between daily click spans and
    daily view spans — one keyed sweep-line window."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.temporal import overlap_duration

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def spans(t):
        return (
            ev.where(F.col("event_type") == t)
            .groupBy(
                "user_id",
                F.expr("unix_seconds(CAST(ts AS TIMESTAMP)) DIV 86400").alias("__d"),
            )
            .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
        )

    return overlap_duration(spans("click"), spans("view"), "user_id")


def q_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal mode over the 72×34 grid — per-target partitioned
    row_number, smallest-value tie-break."""
    from geomesa_spark.operators.tiles import majority_filter

    return majority_filter(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_active_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user active micros: union measure of hourly activity spans
    (overlap counted once) — the single-set sweep."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.temporal import union_duration

    _utc(spark)
    spans = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(
            "user_id",
            F.expr("unix_seconds(CAST(ts AS TIMESTAMP)) DIV 3600").alias("__h"),
        )
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
    )
    return union_duration(spans, "user_id")


def q_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-style Hilbert cell ids of the geo spans on a 256×256 grid —
    one integer fold per row, recursive-CTE oracle replays the
    levels."""
    from geomesa_spark.curves.hilbert import hilbert_col

    pts = _points(spark, sf_dir)
    ix = F.least(F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * 256), F.lit(0)), F.lit(255))
    iy = F.least(F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * 256), F.lit(0)), F.lit(255))
    return pts.select(
        "doc_id",
        "span_offset",
        ix.cast("long").alias("ix"),
        iy.cast("long").alias("iy"),
    ).withColumn("hd", hilbert_col("ix", "iy", 8))


def q_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Hellinger drift between event-type value histograms
    (50 bins on [0, 500]) — sqrt-only, decimal-summed terms."""
    from geomesa_spark.operators.stats import hellinger_pairs

    return hellinger_pairs(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        "event_type", "value", 0.0, 500.0, 50,
    )


def q_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chebyshev distance-to-nearest-occupied-cell surface (radius 3)
    over the 72×34 grid — spread + min aggregate, exact integers."""
    from geomesa_spark.operators.tiles import proximity_grid

    return proximity_grid(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on hourly counts vs the exact integer
    mean threshold — sqrt-only tail."""
    from geomesa_spark.operators.temporal import runs_test

    _utc(spark)
    return runs_test(spark.read.parquet(f"{sf_dir}/events.parquet"), 3600)


def q_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima of hourly event counts (1-D hotspots) —
    two shifted left joins on the dense axis, exact integers."""
    from geomesa_spark.operators.temporal import peak_bins

    _utc(spark)
    return peak_bins(spark.read.parquet(f"{sf_dir}/events.parquet"), 3600)


def q_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% CI of the purchase rate per user segment
    (user_id % 10) — rank segments by ci_low, not raw rate."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.stats import wilson_intervals

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 10).alias("segment"),
        (F.col("event_type") == "purchase").alias("succ"),
    )
    return wilson_intervals(ev, "segment", "succ")


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial SEMI join: geo spans inside at least one rect envelope,
    emitted once — LEFT SEMI on the cell key."""
    from geomesa_spark.operators.joins import envelope_semi_join
    from geomesa_spark.tables import rect_layer

    return envelope_semi_join(_points(spark, sf_dir), rect_layer(spark, N_RECTS))


def q_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user view→purchase conversion latency (first view to first
    purchase at/after it); censored keys keep NULL latency."""
    from geomesa_spark.operators.temporal import time_to_event

    _utc(spark)
    return time_to_event(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "view", "purchase"
    )


def q_tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain Ruggedness Index per occupied cell of the 72×34 count
    grid — exact integer neighbor-difference sum, sqrt-only tail."""
    from geomesa_spark.operators.tiles import tri_grid

    return tri_grid(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: token-weighted keep rates for 3 synthetic
    domains against fixed targets; the untargeted domain reports
    NULL."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.corpus import mixture_rates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.expr("CAST(doc_id % 3 AS STRING)").alias("domain"),
        F.size(F.split(F.col("text"), " ")).alias("w"),
    )
    return mixture_rates(docs, "domain", "w", {"0": 5000, "1": 2000})


def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise L2 distance between the 10 label centroids of the
    embedding table — decimal-exact means and term sums."""
    from geomesa_spark.operators.ann import centroid_distances

    return centroid_distances(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per embedding label — centroid-based,
    decimal-exact distances, one conditional aggregate per point."""
    from geomesa_spark.operators.ann import silhouette_simplified

    return silhouette_simplified(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day de-seasonalized residuals of hourly counts (period
    24) — phase means broadcast back over the dense axis."""
    from geomesa_spark.operators.temporal import seasonal_residuals

    _utc(spark)
    return seasonal_residuals(
        spark.read.parquet(f"{sf_dir}/events.parquet"), 3600, 24
    )


def q_cohens_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's h effect size for the even-vs-odd-user purchase rates
    — the magnitude companion to the abtest z."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.stats import cohens_h

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 2 == 0).alias("grp"),
        (F.col("event_type") == "purchase").alias("succ"),
    )
    return cohens_h(ev, "grp", "succ")


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-count ACF at lags 1..48 in one pass — exposes the daily
    cycle at lag 24; per-lag six-sum Pearson r."""
    from geomesa_spark.operators.temporal import acf_profile

    _utc(spark)
    return acf_profile(spark.read.parquet(f"{sf_dir}/events.parquet"), 3600, 48)


def q_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect octants from the Horn gradients — pure integer
    comparisons, no atan2; flat cells NULL."""
    from geomesa_spark.operators.tiles import aspect_grid

    return aspect_grid(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio for the even-vs-odd-user purchase outcome — exact
    integer cross products, one division."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.stats import odds_ratio

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 2 == 0).alias("grp"),
        (F.col("event_type") == "purchase").alias("succ"),
    )
    return odds_ratio(ev, "grp", "succ")


def q_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Moran's I (LISA) over the 72×34 count grid — binary Moore
    weights excluding self; empty-cell z terms folded into window
    arithmetic so only occupied cells ever join."""
    from geomesa_spark.operators.tiles import local_moran

    return local_moran(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type quantile-transform of value: SQL percent_rank,
    deterministic under ties."""
    from geomesa_spark.operators.stats import percent_rank_norm

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    return percent_rank_norm(ev, "value", ["event_type"])


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view→click→purchase per user: furthest step
    reached in order (one collect+fold per user, exact ints). The
    early-history slice (event_id < 1200) spreads users across every
    depth (32/39/37/42 at sf0.01); the full history converges to
    all-complete."""
    from geomesa_spark.operators.temporal import funnel_depths

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_id") < 1200
    )
    return funnel_depths(
        ev, ("view", "click", "purchase"), key_col="user_id",
        ts_col="ts", tiebreak="event_id",
    )


def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations: top-20 word bigrams by PMI (ranked by the
    exact ratio n_xy·N²/(B·n_x·n_y) — ln-free, bit-exact), support
    filter n_xy ≥ 5 before any join."""
    from geomesa_spark.operators.text import pmi_collocations

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pmi_collocations(docs, k=20, min_count=5)


def q_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-resolution DBSCAN over the 360×170 1° grid (minpts=8):
    core/border/noise roles + HashMin cluster labels, everything past
    the first aggregate running over occupied cells only. At sf0.01
    all three roles occur (140/164/45) across ~84 clusters."""
    from geomesa_spark.operators.tiles import grid_dbscan

    return grid_dbscan(
        _points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 360, 170, minpts=8
    )


def q_track_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory resampling: each canonical track re-sampled onto an
    epoch-aligned 9000 s grid, lon/lat linearly interpolated between
    the surrounding pings — one union-carry shuffle, no range join."""
    from geomesa_spark.operators.tracks import resample_tracks
    from geomesa_spark.tables import canonical_layer

    _utc(spark)
    out = resample_tracks(
        canonical_layer(spark, 2000), "name", ts_col="dtg",
        value_cols=("lon", "lat"), step_s=9000,
    )
    return out.withColumnRenamed("name", "track")


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data clipping: winsorize event values to each
    event_type's [p05, p95] — bounds from one aggregate,
    broadcast-joined back, clip in codegen."""
    from geomesa_spark.operators.stats import winsorize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    return winsorize(ev, "value", ["event_type"], out_col="value_w")


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data quality: per-event_type z-score anomaly filter
    (|x−μ| > 2σ, population σ) — exact decimal moments in one hash
    aggregate, broadcast-joined back; z bit-exact cross-engine."""
    from geomesa_spark.operators.stats import zscore_outliers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    return zscore_outliers(ev, "value", ["event_type"], threshold=2.0)


def q_date_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateOffsetProcess analogue: shift event timestamps by a calendar
    interval (+7 DAY) — narrow codegen column arithmetic; compared as
    exact epoch-micros integers (UTC session, so the calendar shift is
    the same +604800 s DuckDB applies to the naive timestamp)."""
    from geomesa_spark.operators.temporal import date_offset

    _utc(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "ts")
    out = date_offset(ev, "ts", "'7' DAY", out_col="ts_shifted")
    return out.select(
        "event_id",
        # ts is TIMESTAMP_NTZ; the UTC session makes the cast the same
        # wall-clock epoch DuckDB's epoch_us() reads off the naive value
        F.unix_micros(F.col("ts_shifted").cast("timestamp")).alias("ts_shifted_us"),
    )


def q_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 interpolation variant: radius-2 Shepard (1/d²) IDW surface of
    span_offset over the 72×34 grid — samples pre-aggregated per cell,
    per-target contributions folded in deterministic (d2, sx, sy) order
    so the oracle's replayed fold is ulp-identical."""
    from geomesa_spark.operators.tiles import idw_surface

    return idw_surface(
        _points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34,
        value_col="span_offset", radius=2,
    )


def q_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConvexHullProcess analogue: per-track convex hull as WKT via the
    two-stage distributed hull (shuffle-free per-batch partial hulls →
    tiny per-group merge). 1800 rows = 5 COMPLETE 360-wide lat rows, so
    each track's points form a full rectangular lattice and the hull is
    analytically its 4 corners — the oracle derives the same POLYGON
    from min/max alone (the collinear edge points are dropped by the
    strict monotone chain)."""
    from geomesa_spark.operators.stats import convex_hull_agg
    from geomesa_spark.tables import canonical_layer

    out = convex_hull_agg(canonical_layer(spark, 1800), ["name"])
    return out.withColumnRenamed("name", "track")


# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full spatial-join + tiling pipeline at sf0.001 — extract
    geo spans, two-phase polygon join (all kinds), per-polygon document
    counts + tile spread."""
    sf_dir = "/root/testdata/sf0.001"
    from geomesa_spark.operators.extract import grid_cell
    from geomesa_spark.operators.joins import spatial_join_points_in_polys
    from geomesa_spark.tables import poly_layers

    pts = _points(spark, sf_dir)
    polys = poly_layers(spark, N_POLYS)
    pairs = spatial_join_points_in_polys(pts, polys, bits=6, broadcast=True)
    return (
        pairs.withColumn("tile_id", grid_cell(F.col("lon"), F.col("lat"), 8))
        .groupBy("poly_id", "kind")
        .agg(
            F.count("*").alias("n_points"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("tile_id").alias("n_tiles"),
        )
        .orderBy("poly_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the round driver's CORRECTNESS artifact records the
    # FIRST 50 entries in dict order.  Round 5 ROTATES the window (r4 verdict
    # item 1): 10 stable flagships stay as cross-round canaries, the other 40
    # are queries that had NO driver row in any prior round — 30 from the
    # rounds-1-4 tail plus the 10 new round-5 operators.  COVERAGE.md records
    # which round driver-certified each query.  The standalone gate
    # (tools/check_correctness.py) always runs ALL entries.
    return {
        # ---- r5 certification window: 10 stable canaries ----
        "extract_points": q_extract_points,
        "pip_join": q_pip_join,
        "knn": q_knn,
        "dwithin_join": q_dwithin_join,
        "density_grid": q_density_grid,
        "ecql_select": q_ecql_select,
        "lambda_merge": q_lambda_merge,
        "minhash_lsh": q_minhash_lsh,
        "contamination": q_contamination,
        "media_decode": q_media_decode,
        # ---- 30 queries with no driver row in rounds 1-4 ----
        "ecql_within_boundary": q_ecql_within_boundary,
        "ecql_or_interval": q_ecql_or_interval,
        "sampling_k1": q_sampling_k1,
        "sampling_per_key3": q_sampling_per_key3,
        "csv_ingest_scripted": q_csv_ingest_scripted,
        "pii_scrub": q_pii_scrub,
        "pack_sequences": q_pack_sequences,
        "bucketed_join": q_bucketed_join,
        "geohash_cells": q_geohash_cells,
        "tpch_q4": q_tpch_q4,
        "tpch_q5": q_tpch_q5,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q10": q_tpch_q10,
        "tpch_q13": q_tpch_q13,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q22": q_tpch_q22,
        "moving_avg": q_moving_avg,
        "lag_delta": q_lag_delta,
        "track_lines": q_track_lines,
        "ecql_polygon": q_ecql_polygon,
        "ecql_dwithin": q_ecql_dwithin,
        "ecql_events": q_ecql_events,
        "route_search": q_route_search,
        "enumeration": q_enumeration,
        "hash_attribute": q_hash_attribute,
        # ---- 10 new round-5 operators (first driver rows) ----
        "web_tiles": q_web_tiles,
        "zonal_stats": q_zonal_stats,
        "track_length": q_track_length,
        "extent_agg": q_extent_agg,
        "tfidf_topk": q_tfidf_topk,
        "ann_range": q_ann_range,
        "rollup_counts": q_rollup_counts,
        "self_dwithin": q_self_dwithin,
        "span_stats": q_span_stats,
        "bucketed_restore": q_bucketed_restore,
        # ==== end of the driver's 50-row certification window ====
        # --- tail: previously-certified queries (rounds 1-4 rows; the
        # --- standalone gate tools/check_correctness.py runs ALL) ---
        "bbox_filter": q_bbox_filter,
        "z3_select": q_z3_select,
        "xz2_select": q_xz2_select,
        "tile_scan": q_tile_scan,
        "pip_join_salted": q_pip_join_salted,
        "geom_join": q_geom_join,
        "geom_join_sql": q_geom_join_sql,
        "attr_join": q_attr_join,
        "tube_select": q_tube_select,
        "tile_assign": q_tile_assign,
        "csv_ingest": q_csv_ingest,
        "orc_export": q_orc_export,
        "upsert_asof": q_upsert_asof,
        "sampling": q_sampling,
        "visibility": q_visibility,
        "ecql_transform": q_ecql_transform,
        "stats_dsl": q_stats_dsl,
        "bin_records": q_bin_records,
        "asof_join": q_asof_join,
        "sessionize": q_sessionize,
        "track_label": q_track_label,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "bpe_tokens": q_bpe_tokens,
        "langid": q_langid,
        "quality": q_quality,
        "fingerprint": q_fingerprint,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "jaccard_pairs": q_jaccard_pairs,
        "corpus_select": q_corpus_select,
        "stratified_sample": q_stratified_sample,
        "shard_assign": q_shard_assign,
        "chunk_dedup": q_chunk_dedup,
        "vocab_topk": q_vocab_topk,
        "cosine_dup": q_cosine_dup,
        "ann_cosine": q_ann_cosine,
        "ann_ivf": q_ann_ivf,
        "ann_lsh": q_ann_lsh,
        "cms_estimates": q_cms_estimates,
        "window_latest": q_window_latest,
        "tpch_q1": q_tpch_q1,
        "z2_cells": q_z2_cells,
        "z3_cells": q_z3_cells,
        "z3_histogram": q_z3_histogram,
        "xz3_select": q_xz3_select,
        "pip_join_sql": q_pip_join_sql,
        "pip_join_sql_pruned": q_pip_join_sql_pruned,
        "pip_join_all": q_pip_join_all,
        "geom_contains": q_geom_contains,
        "dwithin_geom": q_dwithin_geom,
        "beyond": q_beyond,
        "multi_bbox": q_multi_bbox,
        "query_density": q_query_density,
        "hex_density": q_hex_density,
        "hex_ring_join": q_hex_ring_join,
        "smooth_density": q_smooth_density,
        "vectorize_density": q_vectorize_density,
        "tile_pyramid": q_tile_pyramid,
        "span_invariant": q_span_invariant,
        "media_spans": q_media_spans,
        "stats_events": q_stats_events,
        "stats_by_type": q_stats_by_type,
        "topk_users": q_topk_users,
        "histogram_value": q_histogram_value,
        "descriptive_decimal": q_descriptive_decimal,
        "interval_join": q_interval_join,
        "or_union_dedup": q_or_union_dedup,
        "tpch_q3": q_tpch_q3,
        "tpch_q6": q_tpch_q6,
        "set_ops": q_set_ops,
        "sorted_topn": q_sorted_topn,
        "upsert_latest": q_upsert_latest,
        "sq_codes": q_sq_codes,
        "quadkey_pyramid": q_quadkey_pyramid,
        "pq_codes": q_pq_codes,
        "pq_adc": q_pq_adc,
        "raster_algebra": q_raster_algebra,
        "speed_filter": q_speed_filter,
        "od_cells": q_od_cells,
        "dwell": q_dwell,
        "repetition": q_repetition,
        "convex_hull": q_convex_hull,
        "quantiles": q_quantiles,
        "idw": q_idw,
        "zscore_outliers": q_zscore_outliers,
        "date_offset": q_date_offset,
        "track_resample": q_track_resample,
        "grid_dbscan": q_grid_dbscan,
        "pmi_bigrams": q_pmi_bigrams,
        "funnel": q_funnel,
        "hotspots": q_hotspots,
        "embed_clusters": q_embed_clusters,
        "winsorize": q_winsorize,
        "gi_star": q_gi_star,
        "local_moran": q_local_moran,
        "percent_rank": q_percent_rank,
        "emerging": q_emerging,
        "pair_correlation": q_pair_correlation,
        "knox": q_knox,
        "clark_evans": q_clark_evans,
        "quadrat": q_quadrat,
        "global_autocorr": q_global_autocorr,
        "directional": q_directional,
        "hausdorff": q_hausdorff,
        "clq": q_clq,
        "encounters": q_encounters,
        "chunks": q_chunks,
        "geofence": q_geofence,
        "transitions": q_transitions,
        "sinuosity": q_sinuosity,
        "flow": q_flow,
        "rasterize": q_rasterize,
        "postings": q_postings,
        "lag_autocorr": q_lag_autocorr,
        "benford": q_benford,
        "retention": q_retention,
        "hhi": q_hhi,
        "cusum": q_cusum,
        "chi2": q_chi2,
        "gini": q_gini,
        "ewma": q_ewma,
        "contour": q_contour,
        "dissolve": q_dissolve,
        "anti_join": q_anti_join,
        "allen": q_allen,
        "debounce": q_debounce,
        "band": q_band,
        "embed_cov": q_embed_cov,
        "abtest": q_abtest,
        "trend": q_trend,
        "gaps": q_gaps,
        "sliding": q_sliding,
        "ann_recall": q_ann_recall,
        "focal": q_focal,
        "slope": q_slope,
        "topshare": q_topshare,
        "boilerplate": q_boilerplate,
        "overlap": q_overlap,
        "majority": q_majority,
        "active_time": q_active_time,
        "hilbert_cells": q_hilbert,
        "hellinger": q_hellinger,
        "proximity": q_proximity,
        "runs": q_runs,
        "peaks": q_peaks,
        "wilson": q_wilson,
        "semi_join": q_semi_join,
        "conversion": q_conversion,
        "tri": q_tri,
        "mixture": q_mixture,
        "centroids": q_centroids,
        "silhouette": q_silhouette,
        "seasonal": q_seasonal,
        "cohens_h": q_cohens_h,
        "acf": q_acf,
        "aspect": q_aspect,
        "odds": q_odds,
    }


# hex-prefix hashes used by the dedup oracles (mirror dedup.py contract)
def _sql_hexhash(s: str, n: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1,{n}), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5({s}), i, 1)) - 1 AS BIGINT)"
        f" << (4*({n}-i)))) AS BIGINT)"
    )


SQL_MINHASH = f"""
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
shg AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(toks), 1)),
          i -> array_to_string(toks[i:i], ' '))) AS shs FROM tok),
hsh AS (SELECT doc_id, list_transform(shs, s -> {_sql_hexhash('s', 7)}) AS hh FROM shg),
mh AS (SELECT doc_id, list_transform(generate_series(0, 15), i ->
  CAST(list_min(list_transform(hh, h -> (h * (((1103515245*(i+1)+12345) % 2147483647) | 1)
    + (2654435761*(i+1)) % 2147483647) % 2147483647)) AS BIGINT)) AS sig FROM hsh)
"""

SQL_COSINE = """
qv AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
sims AS (
  SELECT e.vec_id, q.q_vec_id,
    list_sum(list_transform(generate_series(1, len(e.embedding)),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(generate_series(1, len(q.q_emb)),
         i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))))) AS sim
  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> q.q_vec_id
)
"""


def _hex_cells_sql(src: str, carry: str) -> str:
    """Nested-select fragment computing (``carry`` cols, hq, hr) from a
    source with lon/lat — the axial transform + cube rounding with the
    exact double literals hexgrid.py uses."""
    from geomesa_spark.curves.hexgrid import ONE_3, SQRT3_3, TWO_3

    return f"""(
      SELECT {carry},
             CASE WHEN abs(rx - x) > abs(ry - y) AND abs(rx - x) > abs(rz - z)
                  THEN -ry - rz ELSE rx END AS hq,
             CASE WHEN abs(rx - x) > abs(ry - y) AND abs(rx - x) > abs(rz - z)
                  THEN rz
                  WHEN abs(ry - y) > abs(rz - z) THEN rz
                  ELSE -rx - ry END AS hr
      FROM (
        SELECT {carry}, x, z, -x - z AS y,
               floor(x + 0.5) AS rx, floor(-x - z + 0.5) AS ry, floor(z + 0.5) AS rz
        FROM (
          SELECT {carry},
                 ({TWO_3!r} * lon) / 5.0 AS x,
                 ({-ONE_3!r} * lon + {SQRT3_3!r} * lat) / 5.0 AS z
          FROM {src}
        )
      )
    )"""


def _hex_density_sql() -> str:
    return f"""
        WITH {SQL_PTS}
        SELECT CAST(hq AS BIGINT) AS hq, CAST(hr AS BIGINT) AS hr, count(*) AS cnt
        FROM {_hex_cells_sql('pts', 'doc_id')} GROUP BY 1, 2
    """


def _hex_ring_join_sql() -> str:
    return f"""
        WITH {SQL_PTS}, {_sql_probes(N_KNN_PROBES)}
        SELECT q.q_id, p.doc_id, p.span_offset
        FROM {_hex_cells_sql('pts', 'doc_id, span_offset')} p
        JOIN {_hex_cells_sql('probes', 'q_id')} q
          ON (abs(p.hq - q.hq) + abs(p.hr - q.hr)
              + abs((p.hq + p.hr) - (q.hq + q.hr))) / 2 <= 2
    """


# hyperplane-LSH candidate sims: mirrors ann.py::_plane_component exactly
# (integer mix/shift is bit-exact; the projection fold is a left-fold
# from 0.0 like Spark's F.aggregate, via list_reduce with a prepended
# 0.0 so summation order matches). Shared by the ann_lsh and ann_recall
# oracles so the fragment can never drift between them.
SQL_LSH = """
lbkt AS (
  SELECT vec_id, embedding,
    CAST(list_sum(list_transform(generate_series(0, 3), p ->
      CASE WHEN list_reduce(
          list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(generate_series(1, len(embedding)), i ->
              CAST(embedding[i] AS DOUBLE) *
              CAST((((((p * 1000003) + (i - 1)) * 2654435761) >> 13) & 1) * 2 - 1 AS DOUBLE))),
          (a, x) -> a + x) > 0
      THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
  FROM embeddings
),
lqv AS (SELECT vec_id AS q_vec_id, embedding AS q_emb, bucket FROM lbkt WHERE vec_id < 5),
lsims AS (
  SELECT e.vec_id, q.q_vec_id,
    list_sum(list_transform(generate_series(1, len(e.embedding)),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(generate_series(1, len(q.q_emb)),
         i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))))) AS sim
  FROM lbkt e JOIN lqv q ON e.bucket = q.bucket AND e.vec_id <> q.q_vec_id
)
"""

def _allen_case_sql() -> str:
    """WHEN branches for the Allen classification, generated from the
    SAME ordered list the engine compiles (temporal._ALLEN_CASES) so
    first-match semantics agree by construction."""
    from geomesa_spark.operators.temporal import _ALLEN_CASES

    return " ".join(f"WHEN {cond} THEN '{name}'" for name, cond in _ALLEN_CASES)


def _contour_edge_sql(axis: str, e: str) -> str:
    """Endpoint coordinate (grid space) for marching-squares edge ``e``
    — mirrors tiles.contour_segments' _gx/_gy CASE, threshold 9."""
    if axis == "x":
        return (
            f"CASE {e} WHEN 0 THEN qx + CAST(9 - va AS DOUBLE) / CAST(vb - va AS DOUBLE)"
            f" WHEN 1 THEN CAST(qx + 1 AS DOUBLE)"
            f" WHEN 2 THEN qx + CAST(9 - vd AS DOUBLE) / CAST(vc - vd AS DOUBLE)"
            f" ELSE CAST(qx AS DOUBLE) END"
        )
    return (
        f"CASE {e} WHEN 0 THEN CAST(qy AS DOUBLE)"
        f" WHEN 1 THEN qy + CAST(9 - vb AS DOUBLE) / CAST(vc - vb AS DOUBLE)"
        f" WHEN 2 THEN CAST(qy + 1 AS DOUBLE)"
        f" ELSE qy + CAST(9 - va AS DOUBLE) / CAST(vd - va AS DOUBLE) END"
    )


def _contour_cases_sql() -> str:
    """VALUES rows for the marching-squares case table, generated from
    the SAME list the engine broadcasts (tiles._MS_CASES) so engine and
    oracle can never drift — the _allen_case_sql construction."""
    from geomesa_spark.operators.tiles import _MS_CASES

    return ",".join("(" + ",".join(str(v) for v in row) + ")" for row in _MS_CASES)


def oracle_sql() -> dict[str, str]:
    from geomesa_spark.curves.geohash import sql_geohash_chars, sql_geohash_xy
    from geomesa_spark.operators.stats import BENFORD_P

    # the SAME Python double literals the operator embeds — both engines
    # parse the 17-significant-digit strings to identical doubles
    benford_list = ", ".join(f"CAST('{p!r}' AS DOUBLE)" for p in BENFORD_P)
    hav = _sql_haversine("p.lon", "p.lat", "q.lon", "q.lat")
    gh_xi, gh_yi = sql_geohash_xy("lon", "lat", 8)
    gh_chars = sql_geohash_chars(8)
    return {
        "extract_points": f"WITH {SQL_PTS} SELECT doc_id, span_offset, lon, lat FROM pts",
        "bbox_filter": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset, lon, lat FROM pts
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]} AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
        """,
        "tile_scan": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset, lon, lat FROM pts
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]} AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
        """,
        "z2_cells": f"""
            WITH {SQL_PTS}, {SQL_Z2}
            SELECT doc_id, span_offset, {SQL_MORTON} AS cell_z2 FROM cells
        """,
        "z3_cells": f"""
            WITH {SQL_PTS},
            t AS (
              SELECT doc_id, span_offset, lon, lat,
                     (1704067200 + CAST(substr(doc_id, 5, 12) AS BIGINT) * 37
                        + span_offset * 13) * 1000 AS millis
              FROM pts
            ),
            binned AS (
              SELECT doc_id, span_offset,
                     CAST(floor(millis / 604800000) AS INT) AS epoch_bin,
                     millis - CAST(floor(millis / 604800000) AS BIGINT) * 604800000 AS off,
                     lon, lat
              FROM t
            ),
            n AS (
              SELECT doc_id, span_offset, epoch_bin,
                CAST(least(CAST(floor((lon - (-180.0)) * (2097152.0 / 360.0)) AS BIGINT), 2097151) AS BIGINT) AS xi,
                CAST(least(CAST(floor((lat - (-90.0)) * (2097152.0 / 180.0)) AS BIGINT), 2097151) AS BIGINT) AS yi,
                CAST(least(CAST(floor((CAST(off AS DOUBLE) - 0.0) * (2097152.0 / 604800000.0)) AS BIGINT), 2097151) AS BIGINT) AS ti
              FROM binned
            )
            SELECT doc_id, span_offset, epoch_bin,
                   CAST(list_sum(list_transform(generate_series(0, 20),
                     b -> (((xi >> b) & 1) << (3 * b)) + (((yi >> b) & 1) << (3 * b + 1))
                          + (((ti >> b) & 1) << (3 * b + 2)))) AS BIGINT) AS cell_z3
            FROM n
        """,
        "z3_histogram": f"""
            WITH {SQL_PTS},
            t AS (
              SELECT doc_id, span_offset, lon, lat,
                     (1704067200 + CAST(substr(doc_id, 5, 12) AS BIGINT) * 37
                        + span_offset * 13) * 1000 AS millis
              FROM pts
            ),
            binned AS (
              SELECT CAST(floor(millis / 604800000) AS INT) AS epoch_bin,
                     millis - CAST(floor(millis / 604800000) AS BIGINT) * 604800000 AS off,
                     lon, lat
              FROM t
            ),
            n AS (
              SELECT epoch_bin,
                CAST(least(CAST(floor((lon - (-180.0)) * (2097152.0 / 360.0)) AS BIGINT), 2097151) AS BIGINT) AS xi,
                CAST(least(CAST(floor((lat - (-90.0)) * (2097152.0 / 180.0)) AS BIGINT), 2097151) AS BIGINT) AS yi,
                CAST(least(CAST(floor((CAST(off AS DOUBLE) - 0.0) * (2097152.0 / 604800000.0)) AS BIGINT), 2097151) AS BIGINT) AS ti
              FROM binned
            )
            SELECT epoch_bin,
                   CAST(list_sum(list_transform(generate_series(0, 20),
                     b -> (((xi >> b) & 1) << (3 * b)) + (((yi >> b) & 1) << (3 * b + 1))
                          + (((ti >> b) & 1) << (3 * b + 2)))) AS BIGINT) >> 48 AS z3_prefix,
                   count(*) AS cnt
            FROM n GROUP BY 1, 2
        """,
        "z3_select": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset, lon, lat FROM (
              SELECT p.*,
                     1704067200 + CAST(substr(p.doc_id, 5, 12) AS BIGINT) * 37
                       + p.span_offset * 13 AS secs
              FROM pts p
            )
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]}
              AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
              AND secs * 1000 >= {1704067200 * 1000}
              AND secs * 1000 <= {(1704067200 + 250_000) * 1000}
        """,
        "xz2_select": f"""
            WITH {SQL_POLYS}
            SELECT poly_id, kind FROM polys_env
            WHERE max_lon >= {BBOX[0]} AND min_lon <= {BBOX[2]}
              AND max_lat >= {BBOX[1]} AND min_lat <= {BBOX[3]}
        """,
        "xz3_select": f"""
            WITH {SQL_POLYS}
            SELECT poly_id, kind FROM polys_env
            WHERE max_lon >= {BBOX[0]} AND min_lon <= {BBOX[2]}
              AND max_lat >= {BBOX[1]} AND min_lat <= {BBOX[3]}
              AND (1704067200 + CAST(substr(poly_id, 6, 6) AS BIGINT) * 3600) * 1000
                    >= {1704067200 * 1000}
              AND (1704067200 + CAST(substr(poly_id, 6, 6) AS BIGINT) * 3600) * 1000
                    <= {(1704067200 + 500 * 3600) * 1000}
        """,
        "pip_join": f"""
            WITH {SQL_PTS}, {SQL_POLYS}
            SELECT p.doc_id, p.span_offset, q.poly_id
            FROM pts p JOIN polys_env q ON {SQL_PIP_COND}
            WHERE q.kind <> 'convex'
        """,
        "pip_join_salted": f"""
            WITH {SQL_PTS}, {SQL_POLYS}
            SELECT p.doc_id, p.span_offset, q.poly_id
            FROM pts p JOIN polys_env q ON {SQL_PIP_COND}
            WHERE q.kind <> 'convex'
        """,
        "pip_join_sql_pruned": f"""
            WITH {SQL_PTS}, {SQL_POLYS}
            SELECT p.doc_id, p.span_offset, q.poly_id
            FROM pts p JOIN polys_env q ON
              p.lon >= q.min_lon AND p.lon < q.max_lon
              AND p.lat >= q.min_lat AND p.lat < q.max_lat
              AND NOT (q.kind = 'holed' AND p.lon >= q.hx0 AND p.lon < q.hx1
                       AND p.lat >= q.hy0 AND p.lat < q.hy1)
            WHERE q.kind <> 'convex'
        """,
        # convex hexagons: replicate the engine's ray-cast term-for-term
        # (geom.py::points_in_rings) over the 7 generated vertices —
        # vertex k = center + (size/2)·(cos, sin)((pi/3)·k); edge (7,1)
        # reproduces the kernel's ring-closing append and self-skips via
        # the ay<>by guard when the ring closes exactly. The crossing
        # expression px < ax + ((py-ay)/(by-ay))·(bx-ax) is the kernel's
        # IEEE op order.
        "pip_join_all": f"""
            WITH {SQL_PTS}, {SQL_POLYS},
            hexv AS (
              SELECT poly_id,
                     list_transform(generate_series(0, 6),
                       k -> lon_c + (size_deg / 2.0) * cos((pi() / 3.0) * k)) AS vx,
                     list_transform(generate_series(0, 6),
                       k -> lat_c + (size_deg / 2.0) * sin((pi() / 3.0) * k)) AS vy
              FROM polys WHERE kind = 'convex'
            )
            SELECT p.doc_id, p.span_offset, q.poly_id
            FROM pts p JOIN polys_env q ON {SQL_PIP_COND}
            WHERE q.kind <> 'convex'
            UNION ALL
            SELECT p.doc_id, p.span_offset, h.poly_id
            FROM pts p JOIN hexv h ON
              (list_sum(list_transform(generate_series(1, 7), k ->
                 CASE WHEN h.vy[k] <> h.vy[(k % 7) + 1]
                       AND ((h.vy[k] <= p.lat) <> (h.vy[(k % 7) + 1] <= p.lat))
                       AND p.lon < h.vx[k] + ((p.lat - h.vy[k]) / (h.vy[(k % 7) + 1] - h.vy[k]))
                                             * (h.vx[(k % 7) + 1] - h.vx[k])
                 THEN 1 ELSE 0 END)) % 2) = 1
        """,
        "pip_join_sql": f"""
            WITH {SQL_PTS}, {SQL_POLYS}
            SELECT p.doc_id, p.span_offset, q.poly_id
            FROM pts p JOIN polys_env q ON
              p.lon >= q.min_lon AND p.lon < q.max_lon
              AND p.lat >= q.min_lat AND p.lat < q.max_lat
              AND NOT (q.kind = 'holed' AND p.lon >= q.hx0 AND p.lon < q.hx1
                       AND p.lat >= q.hy0 AND p.lat < q.hy1)
            WHERE q.kind <> 'convex'
              AND CAST(substr(p.doc_id, 5, 12) AS BIGINT) % 37 = 0
        """,
        "geom_join": f"""
            WITH {SQL_POLYS}, {SQL_RECTS}
            SELECT q.poly_id AS left_id, r.rect_id AS right_id
            FROM polys_env q JOIN rects_env r
              ON q.min_lon <= r.max_lon AND r.min_lon <= q.max_lon
             AND q.min_lat <= r.max_lat AND r.min_lat <= q.max_lat
            WHERE q.kind = 'bbox'
        """,
        "geom_contains": f"""
            WITH {SQL_POLYS}, {SQL_RECTS}
            SELECT q.poly_id AS left_id, r.rect_id AS right_id
            FROM polys_env q JOIN rects_env r
              ON q.min_lon < r.min_lon AND r.max_lon < q.max_lon
             AND q.min_lat < r.min_lat AND r.max_lat < q.max_lat
            WHERE q.kind = 'bbox'
        """,
        "geom_join_sql": f"""
            WITH {SQL_POLYS}, {SQL_RECTS}
            SELECT q.poly_id AS left_id, r.rect_id AS right_id
            FROM polys_env q JOIN rects_env r
              ON q.min_lon <= r.max_lon AND r.min_lon <= q.max_lon
             AND q.min_lat <= r.max_lat AND r.min_lat <= q.max_lat
            WHERE q.kind = 'bbox'
        """,
        "dwithin_join": f"""
            WITH {SQL_PTS}, {_sql_probes(N_PROBES)}
            SELECT q.q_id, p.doc_id, p.span_offset
            FROM pts p CROSS JOIN probes q
            WHERE {hav} <= q.radius_m
        """,
        "dwithin_geom": f"""
            WITH {SQL_PTS}, {SQL_RECTS}
            SELECT r.rect_id AS box_id, p.doc_id, p.span_offset
            FROM pts p CROSS JOIN rects_env r
            WHERE {_sql_haversine(
                "p.lon", "p.lat",
                "least(greatest(p.lon, r.min_lon), r.max_lon)",
                "least(greatest(p.lat, r.min_lat), r.max_lat)",
            )} <= 250000.0
        """,
        "beyond": f"""
            WITH {SQL_PTS}, {_sql_probes(N_KNN_PROBES)}
            SELECT p.doc_id, p.span_offset FROM pts p
            WHERE NOT EXISTS (
              SELECT 1 FROM probes q
              WHERE {hav} <= 500000.0
            )
        """,
        "multi_bbox": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset, lon, lat FROM pts
            WHERE (lon >= -150.0 AND lon <= -100.0 AND lat >= -40.0 AND lat <= 10.0)
               OR (lon >= 30.0 AND lon <= 80.0 AND lat >= 20.0 AND lat <= 60.0)
        """,
        "knn": f"""
            WITH {SQL_PTS}, {_sql_probes(N_KNN_PROBES)}
            SELECT q_id, doc_id, span_offset, CAST(rnk AS INT) AS rank FROM (
              SELECT q.q_id, p.doc_id, p.span_offset, q.k,
                     row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {hav} ASC, p.doc_id ASC, p.span_offset ASC
                     ) AS rnk
              FROM pts p CROSS JOIN probes q
            ) WHERE rnk <= k
        """,
        "density_grid": f"""
            WITH {SQL_PTS}
            SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                   CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                   CAST(sum(1.0) AS DOUBLE) AS weight,
                   count(*) AS cnt
            FROM pts
            WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
            GROUP BY 1, 2
        """,
        "csv_ingest": """
            SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
        """,
        "orc_export": """
            SELECT n_nationkey, n_name, n_regionkey FROM nation
        """,
        "query_density": f"""
            WITH {SQL_PTS}
            SELECT CAST(floor((lon - (-90.0)) / 5.0) AS INT) AS ix,
                   CAST(floor((lat - (-45.0)) / 5.0) AS INT) AS iy,
                   CAST(sum(1.0) AS DOUBLE) AS weight,
                   count(*) AS cnt
            FROM pts
            WHERE lon >= -120.0 AND lon <= 120.0 AND lat >= -60.0 AND lat <= 60.0
              AND lon >= -90.0 AND lon < 90.0 AND lat >= -45.0 AND lat < 45.0
            GROUP BY 1, 2
        """,
        # axial hex transform + cube rounding replicated with the SAME
        # double literals (repr of the Python constants) and the same
        # floor(x+0.5) rounding — no banker's-rounding divergence
        "hex_density": _hex_density_sql(),
        "hex_ring_join": _hex_ring_join_sql(),
        "smooth_density": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(sum(1.0) AS DOUBLE) AS weight
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            )
            SELECT CAST(g.ix + kx.v AS INT) AS ix, CAST(g.iy + ky.v AS INT) AS iy,
                   CAST(sum(g.weight * CAST((2 - abs(kx.v)) * (2 - abs(ky.v)) AS DOUBLE)) AS DOUBLE) AS weight
            FROM grid g
            CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
            CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
            WHERE g.ix + kx.v >= 0 AND g.ix + kx.v < 72
              AND g.iy + ky.v >= 0 AND g.iy + ky.v < 34
            GROUP BY 1, 2
        """,
        "vectorize_density": f"""
            WITH RECURSIVE {SQL_PTS},
            cellsq AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(sum(1.0) AS DOUBLE) AS weight,
                     count(*) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            cells AS (
              SELECT *, CAST(iy AS BIGINT) * 72 + ix AS cell_id
              FROM cellsq WHERE weight >= 2.0
            ),
            edges AS (
              SELECT a.cell_id AS s, b.cell_id AS d
              FROM cells a JOIN cells b
                ON (b.ix = a.ix + 1 AND b.iy = a.iy) OR (b.ix = a.ix AND b.iy = a.iy + 1)
              UNION
              SELECT b.cell_id, a.cell_id
              FROM cells a JOIN cells b
                ON (b.ix = a.ix + 1 AND b.iy = a.iy) OR (b.ix = a.ix AND b.iy = a.iy + 1)
            ),
            reach (node, lbl) AS (
              SELECT s, s FROM edges
              UNION
              SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node
            ),
            lab AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node)
            SELECT COALESCE(l.label, c.cell_id) AS region_id,
                   count(*) AS n_cells,
                   CAST(sum(weight) AS DOUBLE) AS weight,
                   CAST(sum(cnt) AS BIGINT) AS cnt,
                   -180.0 + min(ix) * 5.0 AS x0,
                   -85.0 + min(iy) * 5.0 AS y0,
                   -180.0 + (max(ix) + 1) * 5.0 AS x1,
                   -85.0 + (max(iy) + 1) * 5.0 AS y1
            FROM cells c LEFT JOIN lab l ON c.cell_id = l.node
            GROUP BY 1
        """,
        "tile_assign": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset,
                   least(CAST(floor((lat - (-90.0)) / 180.0 * 256) AS BIGINT), 255) * 256
                   + least(CAST(floor((lon - (-180.0)) / 360.0 * 256) AS BIGINT), 255) AS tile_id
            FROM pts
        """,
        "tile_pyramid": f"""
            WITH {SQL_PTS}
            SELECT CAST(v.l AS INT) AS level,
                   least(CAST(floor((lon + 180.0) / 360.0 * (1 << v.l)) AS BIGINT), (1 << v.l) - 1) AS xi,
                   least(CAST(floor((lat + 90.0) / 180.0 * (1 << v.l)) AS BIGINT), (1 << v.l) - 1) AS yi,
                   CAST(sum(1.0) AS DOUBLE) AS weight,
                   count(*) AS cnt
            FROM pts CROSS JOIN (VALUES (3),(4),(5),(6)) AS v(l)
            GROUP BY 1, 2, 3
        """,
        "span_invariant": f"""
            WITH {SQL_PTS}, {SQL_POLYS},
            hit AS (
              SELECT DISTINCT p.doc_id
              FROM pts p JOIN polys_env q ON {SQL_PIP_COND}
              WHERE q.kind <> 'convex'
            ),
            spans AS (
              SELECT d.doc_id AS i, g.j AS j,
                     ['text','geo','image','text','geo','audio','text'][g.j + 1] AS kind
              FROM documents d CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) AS g(j)
              WHERE g.j < 1 + (d.doc_id * 2654435761) % 7
            ),
            -- Spark builds the WKT from scale-6 DECIMALs → always 6
            -- fractional digits; %.6f over the (exactly 2-decimal)
            -- value reproduces the byte-identical string
            span_strs AS (
              SELECT i, j, concat_ws(':', kind, CAST(j AS VARCHAR),
                CASE kind
                  WHEN 'text' THEN printf('lorem-%d-%d', i, j)
                  WHEN 'geo' THEN concat('POINT(',
                      printf('%.6f', CAST(-18000 + (i * 31 + j * 17) % 36000 AS DOUBLE) / 100.0), ' ',
                      printf('%.6f', CAST(-8500 + (i * 53 + j * 29) % 17000 AS DOUBLE) / 100.0), ')')
                  ELSE '' END,
                CASE WHEN kind IN ('image','audio')
                     THEN printf('s3://m/%d/%d-%d.bin', i % 1000, i, j) ELSE '' END
              ) AS s
              FROM spans
            ),
            sigs AS (
              SELECT printf('doc-%012d', i) AS doc_id,
                     CAST(count(*) AS INT) AS n_spans,
                     md5(string_agg(s, '|' ORDER BY j)) AS span_sig
              FROM span_strs GROUP BY i
            )
            SELECT g.doc_id, g.n_spans, g.span_sig FROM sigs g JOIN hit h ON g.doc_id = h.doc_id
        """,
        "media_spans": """
            SELECT printf('doc-%012d', d.doc_id) AS doc_id,
                   CAST(g.j AS INT) AS span_offset,
                   CASE g.j WHEN 2 THEN 'image' ELSE 'audio' END AS kind,
                   printf('s3://m/%d/%d-%d.bin', d.doc_id % 1000, d.doc_id, g.j) AS media_ref
            FROM documents d CROSS JOIN (VALUES (2), (5)) AS g(j)
            WHERE g.j < 1 + (d.doc_id * 2654435761) % 7
        """,
        "stats_dsl": """
            SELECT event_type, user_id, cnt FROM (
              SELECT event_type, user_id, count(*) AS cnt,
                     row_number() OVER (
                       PARTITION BY event_type ORDER BY count(*) DESC, user_id ASC
                     ) AS rk
              FROM events GROUP BY event_type, user_id
            ) WHERE rk <= 3
        """,
        # fake-codec dims replicated: payload = md5(ref) digest tiled,
        # width/height from its first two bytes (hex-pair arithmetic)
        "media_decode": """
            WITH m AS (
              SELECT printf('doc-%012d', d.doc_id) AS doc_id,
                     CAST(g.j AS INT) AS span_offset,
                     printf('s3://m/%d/%d-%d.bin', d.doc_id % 1000, d.doc_id, g.j) AS media_ref
              FROM documents d CROSS JOIN (VALUES (2), (5)) AS g(j)
              WHERE g.j < 1 + (d.doc_id * 2654435761) % 7
            ),
            b AS (
              SELECT *,
                     16 * (strpos('0123456789abcdef', substr(md5(media_ref), 1, 1)) - 1)
                        + (strpos('0123456789abcdef', substr(md5(media_ref), 2, 1)) - 1) AS b0,
                     16 * (strpos('0123456789abcdef', substr(md5(media_ref), 3, 1)) - 1)
                        + (strpos('0123456789abcdef', substr(md5(media_ref), 4, 1)) - 1) AS b1
              FROM m
            )
            SELECT doc_id, span_offset, media_ref,
                   CAST(8 + b0 % 24 AS INT) AS width,
                   CAST(8 + b1 % 24 AS INT) AS height,
                   CAST(3 AS INT) AS channels
            FROM b
        """,
        # --- relational / stats ------------------------------------------
        "stats_events": """
            SELECT count(*) AS count, min(value) AS min_value, max(value) AS max_value,
                   min(ts) AS min_ts, max(ts) AS max_ts
            FROM events
        """,
        "stats_by_type": """
            SELECT event_type, count(*) AS cnt, min(value) AS vmin, max(value) AS vmax,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "cms_estimates": """
            SELECT CAST(event_id % 97 AS BIGINT) AS item, count(*) AS est
            FROM events GROUP BY 1
        """,
        "topk_users": """
            SELECT user_id, count(*) AS cnt FROM events
            GROUP BY user_id ORDER BY cnt DESC, user_id ASC LIMIT 10
        """,
        "histogram_value": """
            SELECT least(greatest(CAST(floor((value - 0.0) / 25.0) AS INT), 0), 19) AS bin,
                   count(*) AS cnt
            FROM events WHERE value IS NOT NULL GROUP BY 1
        """,
        "descriptive_decimal": """
            SELECT event_type, count(*) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
            FROM events GROUP BY event_type
        """,
        "asof_join": """
            SELECT l.event_id, l.user_id,
                   (SELECT r.value FROM events r
                    WHERE r.user_id = l.user_id AND r.event_type = 'view'
                      AND (r.ts < l.ts OR (r.ts = l.ts))
                    ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS value_asof
            FROM events l WHERE l.event_type = 'click'
        """,
        "interval_join": """
            WITH iv AS (
              SELECT printf('iv-%03d', t.m) AS interval_id,
                     TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (t.m * 50400) SECOND AS s,
                     TIMESTAMP '2024-01-01 00:00:00'
                       + INTERVAL (t.m * 50400 + (t.m % 5 + 1) * 3600) SECOND AS e
              FROM range(0, 50) t(m)
            )
            SELECT iv.interval_id, ev.event_id
            FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts <= iv.e
        """,
        # gap flag + running sum, ordered (ts, event_id); gaps compare
        # SECOND-truncated epochs (Spark unix_timestamp truncates micros)
        "sessionize": """
            SELECT event_id, user_id,
                   CAST(sum(new_s) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS INT) AS session_idx
            FROM (
              SELECT event_id, user_id, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id))) > 3600
                     THEN 1 ELSE 0 END AS new_s
              FROM events
            )
        """,
        "window_latest": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "sampling": """
            SELECT event_type, event_id FROM (
              SELECT event_type, event_id,
                     row_number() OVER (PARTITION BY event_type ORDER BY event_id ASC) AS rn
              FROM events
            ) WHERE rn % 10 = 1
        """,
        "or_union_dedup": """
            SELECT DISTINCT event_id FROM events
            WHERE value < 50.0 OR (event_type = 'click' AND value < 200.0)
        """,
        "lambda_merge": """
            WITH u AS (
              SELECT event_id, 0 AS prio FROM events WHERE event_id % 2 = 0
              UNION ALL
              SELECT event_id, 1 AS prio FROM events WHERE event_id % 3 = 0
            )
            SELECT event_id, CAST(prio AS INT) AS prio FROM (
              SELECT event_id, prio, row_number() OVER (PARTITION BY event_id ORDER BY prio DESC) AS rn
              FROM u
            ) WHERE rn = 1
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q5": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC
        """,
        "tpch_q6": """
            SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "tpch_q3": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
            LIMIT 10
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "tpch_q14": """
            SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS promo_pct,
                   count(*) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
        """,
        "tpch_q19": """
            SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
              )
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "tpch_q18": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS DECIMAL(28,6))) > 300
            )
            GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 100
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "tpch_q8": """
            SELECT year(o_orderdate) AS o_year,
                   CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
                        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share,
                   count(*) AS n_items
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            WHERE p_type LIKE 'ECONOMY%'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
              AND EXISTS (
                SELECT 1 FROM customer
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region    ON n2.n_regionkey = r_regionkey
                WHERE c_custkey = o_custkey AND r_name = 'ASIA'
              )
            GROUP BY 1
            ORDER BY 1
        """,
        "tpch_q13": """
            SELECT c_count, count(*) AS custdist FROM (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey
            ) GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q15": """
            WITH rev AS (
              SELECT l_suppkey,
                     sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS r
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
            FROM supplier JOIN rev ON s_suppkey = l_suppkey
            WHERE r = (SELECT max(r) FROM rev)
            ORDER BY s_suppkey
        """,
        "tpch_q17": """
            WITH avg_q AS (
              SELECT l_partkey AS pk,
                     CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS a
              FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly,
                   count(*) AS n_items
            FROM lineitem
            JOIN part  ON l_partkey = p_partkey
            JOIN avg_q ON l_partkey = pk
            WHERE p_brand = 'Brand#13' AND p_size <= 10
              AND l_quantity < 0.2 * a
        """,
        "lag_delta": """
            SELECT event_id, user_id,
                   value - lag(value, 1) OVER w AS delta,
                   lead(event_id, 1) OVER w AS next_event
            FROM events WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        """,
        "moving_avg": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
                     / count(*) OVER w AS mavg
            FROM events WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "tpch_q22": """
            WITH thr AS (
              SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS t
              FROM customer WHERE c_acctbal > 0.0
            )
            SELECT c_mktsegment, count(*) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
            FROM customer, thr
            WHERE c_acctbal > thr.t
              AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
              )
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "bin_records": """
            SELECT printf('f-%05d', t.i) AS fid,
                   printf('name%d', t.i % 10) AS track,
                   1704067200 + t.i * 3600 AS secs,
                   (t.i % 360) - 180 + 0.5 AS lon,
                   (CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS lat
            FROM range(0, 2000) t(i)
        """,
        "set_ops": """
            WITH a AS (SELECT event_id FROM events WHERE value < 100.0),
                 b AS (SELECT event_id FROM events WHERE event_type IN ('click', 'view'))
            SELECT event_id, 'intersect' AS op FROM (SELECT event_id FROM a INTERSECT SELECT event_id FROM b)
            UNION ALL
            SELECT event_id, 'except' AS op FROM (SELECT event_id FROM a EXCEPT SELECT event_id FROM b)
        """,
        "sorted_topn": """
            SELECT event_id, value FROM events
            ORDER BY value DESC, event_id ASC LIMIT 20
        """,
        "attr_join": """
            SELECT printf('f-%05d', t.i) AS fid, printf('name%d', t.i % 10) AS name,
                   CAST(t.i % 100 AS INT) AS age
            FROM range(0, 2000) t(i) WHERE printf('name%d', t.i % 10) = 'name3'
        """,
        "tube_select": f"""
            WITH {SQL_PTS},
            pts_t AS (
              SELECT p.doc_id, p.span_offset, p.lon, p.lat,
                     1704067200 + CAST(substr(p.doc_id, 5, 12) AS BIGINT) * 37
                       + p.span_offset * 13 AS secs
              FROM pts p
            ),
            tube AS (
              SELECT CAST(t.m AS INT) AS vertex_id,
                     -150.0 + t.m * 2.0 AS t_lon,
                     -40.0 + t.m * 3.0 AS t_lat,
                     1704067200 + t.m * 3600 AS t_secs
              FROM range(0, 21) t(m)
            )
            SELECT p.doc_id, p.span_offset, q.vertex_id
            FROM pts_t p CROSS JOIN tube q
            WHERE {_sql_haversine('p.lon', 'p.lat', 'q.t_lon', 'q.t_lat')} <= 500000.0
              AND abs(p.secs - q.t_secs) <= 14400
        """,
        # canonical_layer arithmetic (bin_records oracle) + ordered
        # string_agg; dtg = 1704067200 + i*3600 is strictly increasing
        # per track so the order is total
        "track_lines": """
            SELECT printf('name%d', t.i % 10) AS track,
                   CAST(count(*) AS INT) AS n_points,
                   'LINESTRING (' || string_agg(
                     printf('%.6f %.6f',
                       CAST((t.i % 360) - 180 + 0.5 AS DOUBLE),
                       CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE)),
                     ', ' ORDER BY t.i) || ')' AS wkt
            FROM range(0, 2000) t(i)
            GROUP BY 1
        """,
        # geohash bit assembly mirrored from curves/geohash.py (floor
        # normalization, lon-first interleave, base-32 alphabet)
        "geohash_cells": f"""
            WITH {SQL_PTS},
            n AS (
              SELECT doc_id, span_offset,
                     {gh_xi} AS xi, {gh_yi} AS yi
              FROM pts
            ),
            g AS (
              SELECT doc_id, span_offset, {gh_chars} AS gh8 FROM n
            )
            SELECT doc_id, span_offset, gh8, substr(gh8, 1, 4) AS gh4 FROM g
        """,
        # ECQL semantics mirrored exactly: BBOX closed envelope, DURING
        # exclusive endpoints, BETWEEN inclusive, LIKE ANSI wildcards
        "ecql_select": f"""
            WITH {SQL_PTS},
            t AS (
              SELECT doc_id, span_offset, lon, lat,
                     (1704067200 + CAST(substr(doc_id, 5, 12) AS BIGINT) * 37
                        + span_offset * 13) AS secs
              FROM pts
            )
            SELECT doc_id, span_offset, lon, lat FROM t
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]}
              AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
              AND secs > 1704067200 AND secs < 1704317200
              AND doc_id LIKE 'doc-%' AND span_offset BETWEEN 0 AND 3
        """,
        # OGC DE-9IM semantics on snapped-to-edge points: within =
        # strict interior, touches = boundary only, intersects = either
        "ecql_within_boundary": f"""
            WITH {SQL_PTS},
            s AS (
              SELECT doc_id, span_offset,
                     CAST(floor(lon / 50) * 50 AS DOUBLE) AS px,
                     CAST(floor(lat / 20) * 20 AS DOUBLE) AS py
              FROM pts
            ),
            f AS (
              SELECT *,
                     (px > -100 AND px < 0 AND py > -40 AND py < 40) AS inside,
                     (((px = -100 OR px = 0) AND py >= -40 AND py <= 40)
                      OR ((py = -40 OR py = 40) AND px >= -100 AND px <= 0)) AS onb
              FROM s
            )
            SELECT doc_id, span_offset, px, py,
                   (inside AND NOT onb) AS w, onb AS t
            FROM f WHERE inside OR onb
        """,
        # AFTER t1 OR BEFORE t2 with t1 > t2 = ALL time: only the bbox
        # + residual constrain the rows (the z3 coarse pass must be a
        # no-op, not an inverted empty range)
        "ecql_or_interval": f"""
            WITH {SQL_PTS},
            t AS (
              SELECT doc_id, span_offset, lon, lat,
                     (1704067200 + CAST(substr(doc_id, 5, 12) AS BIGINT) * 37
                        + span_offset * 13) AS secs
              FROM pts
            )
            SELECT doc_id, span_offset, lon, lat FROM t
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]}
              AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
              AND (secs > 1704240000 OR secs < 1704153600)
        """,
        "sampling_k1": """
            SELECT event_type, event_id FROM events
        """,
        "sampling_per_key3": """
            SELECT event_type, event_id FROM (
              SELECT event_type, event_id,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY event_type ASC, event_id ASC) AS rn
              FROM events
            ) WHERE (rn - 1) % 3 = 0
        """,
        "csv_ingest_scripted": """
            SELECT c_custkey,
                   upper(c_name) || '#' || CAST(c_nationkey AS VARCHAR) AS label
            FROM customer
        """,
        # the diamond's closed region == the L1 ball |dx|+|dy| <= r;
        # no grid point sits on the boundary (see _ECQL_DIAMOND note) so
        # < r is equivalent and threshold-tie-free
        "ecql_polygon": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset, lon, lat FROM pts
            WHERE ABS(lon - 0.005) + ABS(lat - 0.005) < 40.0033
              AND NOT (span_offset = 4 AND lat < 0)
        """,
        "ecql_dwithin": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset, lon, lat FROM pts
            WHERE {_sql_haversine("lon", "lat", "(-100.005)", "20.005")} <= 2500000.0
        """,
        "ecql_events": """
            SELECT event_id, event_type, value, user_id FROM events
            WHERE event_type IN ('click','view') AND value BETWEEN 10 AND 200
              AND props NOT LIKE '%7%' AND user_id IS NOT NULL
              AND ts > TIMESTAMP '2024-01-05 00:00:00'
              AND NOT (event_type = 'view' AND value > 150)
        """,
        # transform expressions mirrored op-for-op (floor cast to BIGINT
        # to match Spark's LongType floor; x2 uses the same op order so
        # doubles stay bit-identical)
        "ecql_transform": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset,
                   upper(substr(doc_id, 1, 3)) || '-X' AS label,
                   lon * 2 + 1 AS x2,
                   abs(CAST(floor(lat) AS BIGINT)) AS dy
            FROM pts
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]}
              AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
              AND span_offset <= 4
        """,
        # canonical-layer arithmetic; dtg strictly increasing with i so
        # the per-track argmax is i ∈ 1990..1999
        "track_label": """
            SELECT printf('name%d', t.i % 10) AS track,
                   CAST(t.i % 100 AS INT) AS age,
                   TIMESTAMP '2024-01-01 00:00:00' + t.i * INTERVAL 1 HOUR AS dtg,
                   CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                   CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
            FROM range(0, 2000) t(i)
            QUALIFY row_number() OVER (PARTITION BY t.i % 10 ORDER BY t.i DESC) = 1
        """,
        # route/segment arithmetic mirrored op-for-op: clamped
        # projection in coordinate space, haversine to the nearest
        # segment point, course = atan2(dx*cos(mid_lat), dy); heading
        # deviation folded mod 360 then mod 180 (bidirectional)
        "route_search": f"""
            WITH {SQL_PTS},
            hp AS (
              SELECT doc_id, span_offset, lon, lat,
                     CAST((CAST(substr(doc_id, 5, 12) AS BIGINT) * 7
                           + span_offset * 11) % 360 AS DOUBLE) AS heading
              FROM pts
            ),
            route AS (
              SELECT CAST(t.v AS INT) AS vertex_id,
                     -160.0 + CAST(t.v AS DOUBLE) * 7.0 AS lon,
                     -50.0 + CAST(t.v AS DOUBLE) * 3.5 AS lat
              FROM range(0, 25) t(v)
            ),
            segs AS (
              SELECT a.vertex_id + 1 AS seg_idx,
                     a.lon AS ax, a.lat AS ay, b.lon AS bx, b.lat AS by_
              FROM route a JOIN route b ON b.vertex_id = a.vertex_id + 1
            ),
            cand AS (
              SELECT h.doc_id, h.span_offset, h.lon, h.lat, h.heading,
                     s.seg_idx, s.ax, s.ay,
                     (s.bx - s.ax) AS dx, (s.by_ - s.ay) AS dy,
                     degrees(atan2((s.bx - s.ax)
                       * cos(radians((s.ay + s.by_) / 2.0)), (s.by_ - s.ay))) AS course_deg
              FROM hp h CROSS JOIN segs s
            ),
            proj AS (
              SELECT *, least(greatest(((lon - ax) * dx + (lat - ay) * dy)
                       / (dx * dx + dy * dy), 0.0), 1.0) AS t
              FROM cand
            ),
            refine AS (
              SELECT doc_id, span_offset, seg_idx, course_deg, heading,
                     {_sql_haversine('lon', 'lat', 'ax + t * dx', 'ay + t * dy')} AS dist_m
              FROM proj
            ),
            matched AS (
              SELECT doc_id, span_offset, CAST(seg_idx AS INT) AS seg_idx,
                     dist_m, course_deg
              FROM refine
              WHERE dist_m <= 600000.0
                AND least(abs(fmod(heading - course_deg + 540.0, 360.0) - 180.0),
                          180.0 - abs(fmod(heading - course_deg + 540.0, 360.0) - 180.0))
                    <= 45.0
            )
            SELECT doc_id, span_offset, seg_idx, dist_m, course_deg FROM matched
            QUALIFY row_number() OVER (PARTITION BY doc_id, span_offset
                                       ORDER BY dist_m, seg_idx) = 1
        """,
        "enumeration": """
            SELECT event_type AS value, count(*) AS cnt,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM events GROUP BY 1
        """,
        "hash_attribute": """
            WITH h AS (
              SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, length(k)),
                                      i -> ord(substr(k, i, 1)))),
                       (a, c) -> (a * 31 + c) % 1000000007) AS hv
              FROM (SELECT printf('u-%d|%s', user_id, event_type) AS k FROM events)
            )
            SELECT CAST(hv % 16 AS INT) AS bin, count(*) AS cnt FROM h GROUP BY 1
        """,
        "upsert_latest": """
            SELECT event_id, user_id, event_type,
                   CASE WHEN event_id % 5 = 0 THEN value + 1000.0 ELSE value END AS value
            FROM events WHERE event_id % 7 <> 0
        """,
        "upsert_asof": """
            SELECT event_id, user_id, event_type,
                   CASE WHEN event_id % 5 = 0 THEN value + 1000.0 ELSE value END AS value
            FROM events
        """,
        # auth set {user, internal} satisfies label classes 0,1,3 of the
        # deterministic 5-way label cycle
        "visibility": """
            SELECT event_id,
                   ['', 'user', 'admin', 'admin|(user&internal)', 'user&admin'][
                     CAST(event_id % 5 AS INT) + 1] AS visibility
            FROM events WHERE event_id % 5 IN (0, 1, 3)
        """,
        # --- training-data pipeline --------------------------------------
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_key, count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
                   CAST(length(text) AS INT) AS n_chars_calc
            FROM documents
        """,
        "bpe_tokens": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS INT)
                     AS n_bpe_tokens
            FROM documents
        """,
        "langid": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            r AS (
              SELECT doc_id,
                CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','it','on'], x))) AS DOUBLE)
                  / len(toks) AS stopword_ratio
              FROM t
            )
            SELECT doc_id, stopword_ratio,
                   CASE WHEN stopword_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred
            FROM r
        """,
        "quality": """
            WITH b AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                     CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dis,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                     CAST(n_dis AS DOUBLE) / n_tok AS diversity,
                     CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok AS mean_tok_len,
                     CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio
              FROM b
            )
            SELECT doc_id, diversity, mean_tok_len, punct_ratio,
                   0.5 * diversity + 0.1 * least(mean_tok_len / 10.0, 1.0) - 0.4 * punct_ratio AS quality
            FROM r
        """,
        "fingerprint": """
            SELECT doc_id,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1)))),
                     (a, c) -> (a * 31 + c) % 1000000007) AS fp
            FROM documents
        """,
        "vocab_topk": """
            SELECT token, n_occurrences, n_docs,
                   CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS INT) AS rank
            FROM (
              SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
              GROUP BY token
            )
            ORDER BY n_occurrences DESC, token ASC
            LIMIT 20
        """,
        "stratified_sample": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ) AS rn
              FROM documents
            ) WHERE rn <= 5
        """,
        "shard_assign": """
            WITH fp AS (
              SELECT doc_id,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR))),
                         i -> ord(substr(CAST(doc_id AS VARCHAR), i, 1)))),
                       (a, c) -> (a * 31 + c) % 1000000007) AS f
              FROM documents
            )
            SELECT doc_id, CAST(f % 8 AS INT) AS shard,
                   CAST(row_number() OVER (PARTITION BY f % 8 ORDER BY f, doc_id) AS INT) AS shard_pos
            FROM fp
        """,
        "contamination": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            g AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(t) >= 3
                       THEN list_transform(generate_series(1, len(t) - 2),
                              i -> array_to_string(list_slice(t, i, i + 2), ' '))
                       ELSE [] END) AS gs
              FROM toks
            ),
            bench AS (SELECT DISTINCT unnest(gs) AS __g FROM g WHERE doc_id % 97 = 0),
            dg AS (SELECT doc_id, unnest(gs) AS __g FROM g WHERE doc_id % 97 <> 0)
            SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
                   CAST(sum(CASE WHEN b.__g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
                   CAST(sum(CASE WHEN b.__g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS contamination
            FROM dg LEFT JOIN bench b ON dg.__g = b.__g
            GROUP BY dg.doc_id
        """,
        "chunk_dedup": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            ch AS (
              SELECT doc_id,
                     list_transform(generate_series(1, greatest(CAST(ceil(len(t) / 8.0) AS INT), 1)),
                       i -> {'pos': i - 1,
                             'chunk': array_to_string(list_slice(t, (i-1)*8 + 1, (i-1)*8 + 8), ' ')}) AS cs
              FROM toks
            ),
            ex AS (SELECT doc_id, unnest(cs, recursive := true) FROM ch),
            firsts AS (SELECT doc_id, chunk, min(pos) AS pos, count(*) AS occ
                       FROM ex GROUP BY doc_id, chunk)
            SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS dedup_text,
                   CAST(count(*) AS BIGINT) AS n_kept_chunks,
                   CAST(sum(occ) - count(*) AS BIGINT) AS n_dropped_chunks
            FROM firsts GROUP BY doc_id
        """,
        "bucketed_join": """
            WITH agg AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                     sum(value) AS total_value
              FROM events WHERE user_id IS NOT NULL GROUP BY user_id
            )
            SELECT e.event_id, e.user_id, e.value, a.n_events, a.total_value
            FROM events e JOIN agg a ON e.user_id = a.user_id
            WHERE e.user_id IS NOT NULL
        """,
        "pack_sequences": """
            WITH t AS (
              SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                     AS BIGINT) AS cum_before
              FROM t
            )
            SELECT doc_id, lang, n_tokens,
                   CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
                   CAST(cum_before % 512 AS BIGINT) AS pack_offset
            FROM c
        """,
        "pii_scrub": r"""
            WITH aug AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0
                          THEN text || ' contact u' || CAST(doc_id AS VARCHAR)
                               || '@ex.com or +1 555 123 4567 ip 10.0.0.'
                               || CAST(doc_id % 256 AS VARCHAR)
                          ELSE text END AS text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\b\d{13,19}\b', '<CARD>', 'g'),
                     '\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{4}\b', '<PHONE>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed,
                   CAST(length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
                   CAST(length(regexp_extract_all(text, '\b\d{13,19}\b')) AS INT) AS n_card,
                   CAST(length(regexp_extract_all(text, '\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{4}\b')) AS INT) AS n_phone,
                   CAST(length(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4
            FROM aug
        """,
        "simhash": f"""
            WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            h60 AS (SELECT doc_id, list_transform(toks, t -> {_sql_hexhash('t', 15)}) AS hh FROM tok)
            SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), j ->
                     CASE WHEN list_sum(list_transform(hh, h -> ((h >> j) & 1) * 2 - 1)) > 0
                          THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
            FROM h60
        """,
        # brute-force all-pairs Hamming (the banding is exact for d<bands,
        # so engine-vs-brute equality proves zero recall loss)
        "simhash_pairs": f"""
            WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            h60 AS (SELECT doc_id, list_transform(toks, t -> {_sql_hexhash('t', 15)}) AS hh FROM tok),
            sh AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), j ->
                     CASE WHEN list_sum(list_transform(hh, h -> ((h >> j) & 1) * 2 - 1)) > 0
                          THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS s
                   FROM h60)
            SELECT a.doc_id AS key_a, b.doc_id AS key_b,
                   CAST(bit_count(CAST(xor(a.s, b.s) AS BIT)) AS INT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(CAST(xor(a.s, b.s) AS BIT)) <= 5
        """,
        # mirrors dedup.lsh_candidate_pairs' hot-bucket cap (buckets over
        # 10k rows are dropped before the self-join on both sides)
        "minhash_lsh": f"""
            WITH {SQL_MINHASH},
            bands AS (
              SELECT doc_id, g.b,
                     array_to_string(sig[g.b*4+1 : g.b*4+4], ',') AS band_key
              FROM mh CROSS JOIN (VALUES (0),(1),(2),(3)) AS g(b)
            ),
            ok AS (
              SELECT b, band_key FROM bands GROUP BY b, band_key
              HAVING count(*) <= 10000
            )
            SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
            FROM bands a
            JOIN ok o ON a.b = o.b AND a.band_key = o.band_key
            JOIN bands b
              ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        """,
        # transitive closure with min-label aggregation == the engine's
        # HashMin fixpoint; the edge set mirrors the capped LSH pairs
        "dedup_clusters": f"""
            WITH RECURSIVE {SQL_MINHASH},
            bands AS (
              SELECT doc_id, g.b,
                     array_to_string(sig[g.b*4+1 : g.b*4+4], ',') AS band_key
              FROM mh CROSS JOIN (VALUES (0),(1),(2),(3)) AS g(b)
            ),
            ok AS (
              SELECT b, band_key FROM bands GROUP BY b, band_key
              HAVING count(*) <= 10000
            ),
            prs AS (
              SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
              FROM bands a
              JOIN ok o ON a.b = o.b AND a.band_key = o.band_key
              JOIN bands b
                ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
            ),
            edges AS (
              SELECT key_a AS s, key_b AS d FROM prs
              UNION SELECT key_b, key_a FROM prs
            ),
            reach (node, lbl) AS (
              SELECT s, s FROM edges
              UNION
              SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node
            )
            SELECT node, min(lbl) AS label FROM reach GROUP BY node
        """,
        "jaccard_pairs": """
            WITH sh AS (
              SELECT doc_id, source,
                     list_distinct(list_transform(generate_series(1, greatest(len(string_split(text,' ')), 1)),
                       i -> array_to_string((string_split(text,' '))[i:i], ' '))) AS shs
              FROM documents
            )
            SELECT a.doc_id AS key_a, b.doc_id AS key_b,
                   CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
                     / len(list_distinct(a.shs || b.shs)) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.source = b.source
            WHERE CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
                    / len(list_distinct(a.shs || b.shs)) >= 0.7
        """,
        # composition of the dedup-winner, langid and quality fragments
        "corpus_select": """
            WITH keep AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            ),
            b AS (
              SELECT doc_id, string_split(text, ' ') AS toks,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                     CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dis,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                     CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','it','on'], x))) AS DOUBLE)
                       / n_tok AS stopword_ratio,
                     CAST(n_dis AS DOUBLE) / n_tok AS diversity,
                     CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok AS mean_tok_len,
                     CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio
              FROM b
            ),
            s AS (
              SELECT doc_id,
                     0.5 * diversity + 0.1 * least(mean_tok_len / 10.0, 1.0) - 0.4 * punct_ratio AS quality,
                     CASE WHEN stopword_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred
              FROM r
            )
            SELECT s.doc_id, s.quality
            FROM s JOIN keep k ON s.doc_id = k.doc_id
            WHERE s.lang_pred = 'en' AND s.quality >= 0.3
        """,
        # near-dup refine decision mirrors the engine's sequential folds
        # (list_reduce from prepended 0.0 ≡ F.aggregate) for dot AND
        # norm, so round(sim,6) >= threshold flips identically
        "embed_clusters": """
            WITH RECURSIVE bkt AS (
              SELECT vec_id, embedding,
                CAST(list_sum(list_transform(generate_series(0, 3), p ->
                  CASE WHEN list_reduce(
                      list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(generate_series(1, len(embedding)), i ->
                          CAST(embedding[i] AS DOUBLE) *
                          CAST((((((p * 1000003) + (i - 1)) * 2654435761) >> 13) & 1) * 2 - 1 AS DOUBLE))),
                      (acc, x) -> acc + x) > 0
                  THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(generate_series(1, len(embedding)), i ->
                    CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                  (acc, x) -> acc + x)) AS nrm
              FROM embeddings
            ),
            prs AS (
              SELECT a.vec_id AS key_a, b.vec_id AS key_b,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(generate_series(1, len(a.embedding)), i ->
                    CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                  (acc, x) -> acc + x) / (a.nrm * b.nrm), 6) AS sim_r
              FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            ),
            sel AS (
              SELECT key_a, key_b FROM prs WHERE sim_r >= 0.3
            ),
            edges AS (
              SELECT key_a AS s, key_b AS d FROM sel
              UNION
              SELECT key_b, key_a FROM sel
            ),
            reach (node, lbl) AS (
              SELECT s, s FROM edges
              UNION
              SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node
            ),
            lab AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node)
            SELECT label AS cluster, count(*) AS n_members
            FROM lab GROUP BY label
        """,
        "cosine_dup": """
            WITH bkt AS (
              SELECT vec_id, embedding,
                CAST(list_sum(list_transform(generate_series(0, 3), p ->
                  CASE WHEN list_reduce(
                      list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(generate_series(1, len(embedding)), i ->
                          CAST(embedding[i] AS DOUBLE) *
                          CAST((((((p * 1000003) + (i - 1)) * 2654435761) >> 13) & 1) * 2 - 1 AS DOUBLE))),
                      (acc, x) -> acc + x) > 0
                  THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket,
                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(generate_series(1, len(embedding)), i ->
                    CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                  (acc, x) -> acc + x)) AS nrm
              FROM embeddings
            ),
            prs AS (
              SELECT a.vec_id AS key_a, b.vec_id AS key_b,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(generate_series(1, len(a.embedding)), i ->
                    CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                  (acc, x) -> acc + x) / (a.nrm * b.nrm), 6) AS sim_r
              FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            )
            SELECT key_a, key_b, sim_r FROM prs WHERE sim_r >= 0.3
        """,
        "ann_cosine": f"""
            WITH {SQL_COSINE}
            SELECT q_vec_id, vec_id, round(sim, 6) AS sim_r, CAST(rnk AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY round(sim, 6) DESC, vec_id ASC) AS rnk
              FROM sims
            ) WHERE rnk <= 5
        """,
        "ann_lsh": f"""
            WITH {SQL_LSH}
            SELECT q_vec_id, vec_id, round(sim, 6) AS sim_r, CAST(rnk AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY round(sim, 6) DESC, vec_id ASC) AS rnk
              FROM lsims
            ) WHERE rnk <= 5
        """,
        # IVF: centroid scores use the same sequential fold as the
        # engine's dot() (list_reduce from prepended 0.0) so cluster
        # assignment and probe ranking are bit-identical
        "ann_ivf": """
            WITH cents AS (
              SELECT vec_id AS k_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
            ),
            scored AS (
              SELECT e.vec_id, c.k_id,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(generate_series(1, len(e.embedding)),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_vec[i] AS DOUBLE))),
                  (a, x) -> a + x) AS score
              FROM embeddings e CROSS JOIN cents c
            ),
            listed AS (
              SELECT vec_id, k_id AS cluster FROM (
                SELECT vec_id, k_id,
                       row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, k_id ASC) AS rn
                FROM scored
              ) WHERE rn = 1
            ),
            probes AS (
              SELECT vec_id AS q_vec_id, k_id AS cluster FROM (
                SELECT vec_id, k_id,
                       row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, k_id ASC) AS rn
                FROM scored WHERE vec_id < 5
              ) WHERE rn <= 2
            ),
            sims AS (
              SELECT l.vec_id, p.q_vec_id,
                list_sum(list_transform(generate_series(1, len(e.embedding)),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE)))
                / (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                   * sqrt(list_sum(list_transform(generate_series(1, len(qe.embedding)),
                     i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE))))) AS sim
              FROM listed l
              JOIN probes p ON l.cluster = p.cluster AND l.vec_id <> p.q_vec_id
              JOIN embeddings e ON e.vec_id = l.vec_id
              JOIN embeddings qe ON qe.vec_id = p.q_vec_id
            )
            SELECT q_vec_id, vec_id, round(sim, 6) AS sim_r, CAST(rnk AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_vec_id ORDER BY round(sim, 6) DESC, vec_id ASC) AS rnk
              FROM sims
            ) WHERE rnk <= 5
        """,
        # ---------------- round-5 operators ----------------
        "web_tiles": f"""
            WITH {SQL_PTS},
            t AS (
              SELECT
                CAST(least(greatest(floor((lon + 180.0) / 360.0 * 64), 0), 63) AS BIGINT) AS zx,
                CAST(least(greatest(floor((1.0 - ln(tan(radians(least(greatest(lat, -85.05112878), 85.05112878)))
                   + 1.0 / cos(radians(least(greatest(lat, -85.05112878), 85.05112878)))) / pi()) / 2.0 * 64), 0), 63) AS BIGINT) AS zy
              FROM pts
            )
            SELECT zx, zy,
                   array_to_string(list_transform(generate_series(5, 0, -1),
                     i -> CAST(((zx >> i) & 1) + 2 * ((zy >> i) & 1) AS VARCHAR)), '') AS quadkey,
                   count(*) AS n
            FROM t GROUP BY zx, zy
        """,
        "zonal_stats": f"""
            WITH {SQL_PTS}, {SQL_RECTS},
            dens AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     count(*) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            cent AS (
              SELECT cnt, -180.0 + (ix + 0.5) * 5.0 AS lon_c, -85.0 + (iy + 0.5) * 5.0 AS lat_c
              FROM dens
            )
            SELECT r.rect_id, count(*) AS n_cells,
                   CAST(sum(CAST(c.cnt AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   CAST(min(c.cnt) AS DOUBLE) AS min_value,
                   CAST(max(c.cnt) AS DOUBLE) AS max_value
            FROM cent c JOIN rects_env r
              ON c.lon_c >= r.min_lon - 3.0 AND c.lon_c <= r.max_lon + 3.0
             AND c.lat_c >= r.min_lat - 3.0 AND c.lat_c <= r.max_lat + 3.0
            GROUP BY r.rect_id
        """,
        "track_length": f"""
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track, t.i AS i,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 2000) t(i)
            ),
            legs AS (
              SELECT track, lon, lat,
                     lead(lon) OVER (PARTITION BY track ORDER BY i) AS nlon,
                     lead(lat) OVER (PARTITION BY track ORDER BY i) AS nlat
              FROM c
            )
            SELECT track, CAST(count(*) AS INT) AS n_points,
                   CAST(coalesce(sum(CAST(CASE WHEN nlon IS NULL THEN NULL ELSE {_sql_haversine('lon', 'lat', 'nlon', 'nlat')}
                        END AS DECIMAL(18,6))), 0) AS DOUBLE) AS length_m
            FROM legs GROUP BY track
        """,
        "extent_agg": """
            SELECT printf('name%d', t.i % 10) AS name,
                   count(*) AS n,
                   min(CAST((t.i % 360) - 180 + 0.5 AS DOUBLE)) AS min_lon,
                   min(CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE)) AS min_lat,
                   max(CAST((t.i % 360) - 180 + 0.5 AS DOUBLE)) AS max_lon,
                   max(CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE)) AS max_lat
            FROM range(0, 2000) t(i)
            GROUP BY 1
        """,
        "tfidf_topk": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term
            ),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_corpus FROM documents),
            scored AS (
              SELECT t.doc_id, t.term, t.tf, d.df, (t.tf * n.n_corpus) / d.df AS score
              FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tf, df, score, CAST(rnk AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
              FROM scored
            ) WHERE rnk <= 3
        """,
        "ann_range": f"""
            WITH {SQL_COSINE}
            SELECT q_vec_id, vec_id, round(sim, 6) AS sim_r
            FROM sims WHERE round(sim, 6) >= 0.25
        """,
        "rollup_counts": """
            SELECT coalesce(event_type, '<all>') AS event_type,
                   coalesce(CAST(day AS VARCHAR), '<all>') AS day,
                   count(*) AS n,
                   CAST(grouping(event_type, day) AS BIGINT) AS gid
            FROM (SELECT event_type, CAST(ts AS DATE) AS day FROM events)
            GROUP BY ROLLUP (event_type, day)
        """,
        "self_dwithin": f"""
            WITH {SQL_PTS},
            p AS (
              SELECT doc_id || ':' || CAST(span_offset AS VARCHAR) AS pid, lon, lat
              FROM pts
            )
            SELECT a.pid AS a_id, b.pid AS b_id,
                   {_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')} AS dist_m
            FROM p a JOIN p b ON a.pid < b.pid
            WHERE {_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')} <= 75000.0
        """,
        "span_stats": """
            WITH spans AS (
              SELECT d.doc_id AS i, g.j AS j,
                     ['text','geo','image','text','geo','audio','text'][g.j + 1] AS kind
              FROM documents d CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) AS g(j)
              WHERE g.j < 1 + (d.doc_id * 2654435761) % 7
            )
            SELECT printf('doc-%012d', i) AS doc_id,
                   CAST(count(*) AS INT) AS n_spans,
                   CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS INT) AS n_text,
                   CAST(sum(CASE WHEN kind = 'geo' THEN 1 ELSE 0 END) AS INT) AS n_geo,
                   CAST(sum(CASE WHEN kind IN ('image','audio') THEN 1 ELSE 0 END) AS INT) AS n_media,
                   min(CASE WHEN kind IN ('image','audio') THEN CAST(j AS INT) END) AS first_media_offset
            FROM spans GROUP BY i
        """,
        "quadkey_pyramid": f"""
            WITH {SQL_PTS},
            t AS (
              SELECT
                CAST(least(greatest(floor((lon + 180.0) / 360.0 * 64), 0), 63) AS BIGINT) AS zx,
                CAST(least(greatest(floor((1.0 - ln(tan(radians(least(greatest(lat, -85.05112878), 85.05112878)))
                   + 1.0 / cos(radians(least(greatest(lat, -85.05112878), 85.05112878)))) / pi()) / 2.0 * 64), 0), 63) AS BIGINT) AS zy
              FROM pts
            ),
            qk AS (
              SELECT array_to_string(list_transform(generate_series(5, 0, -1),
                       i -> CAST(((zx >> i) & 1) + 2 * ((zy >> i) & 1) AS VARCHAR)), '') AS quadkey
              FROM t
            ),
            lv AS (SELECT unnest(generate_series(4, 6)) AS level)
            SELECT CAST(l.level AS INT) AS level, substr(q.quadkey, 1, l.level) AS qk, count(*) AS n
            FROM qk q CROSS JOIN lv l
            GROUP BY 1, 2
        """,
        "raster_algebra": f"""
            WITH {SQL_PTS}
            -- even + odd halves add back to the full grid: the oracle
            -- IS the full-corpus density (the self-validation)
            SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                   CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                   count(*) AS cnt
            FROM pts
            WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
            GROUP BY 1, 2
        """,
        "speed_filter": f"""
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track, t.i AS i,
                     TIMESTAMP '2024-01-01 00:00:00' + t.i * INTERVAL 1 HOUR AS dtg,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 2000) t(i)
            ),
            legs AS (
              SELECT track, dtg, lon, lat,
                     lag(lon) OVER w AS plon, lag(lat) OVER w AS plat,
                     (i - lag(i) OVER w) * 3600 AS dt_s
              FROM c WINDOW w AS (PARTITION BY track ORDER BY i)
            )
            SELECT track, dtg, lon, lat,
                   CASE WHEN plon IS NOT NULL AND dt_s > 0
                        THEN round({_sql_haversine('plon', 'plat', 'lon', 'lat')} / dt_s, 6)
                   END AS speed_ms,
                   coalesce(CASE WHEN plon IS NOT NULL AND dt_s > 0
                        THEN round({_sql_haversine('plon', 'plat', 'lon', 'lat')} / dt_s, 6)
                   END <= 40.0, TRUE) AS is_valid
            FROM legs
        """,
        "od_cells": """
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track, t.i AS i,
                     CAST(floor((CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) - (-180.0)) / 10.0) AS INT) AS o_ix,
                     CAST(floor((CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) - (-85.0)) / 10.0) AS INT) AS o_iy
              FROM range(0, 2000) t(i)
            ),
            hops AS (
              SELECT o_ix, o_iy,
                     lead(o_ix) OVER w AS d_ix, lead(o_iy) OVER w AS d_iy
              FROM c WINDOW w AS (PARTITION BY track ORDER BY i)
            )
            SELECT o_ix, o_iy, d_ix, d_iy, count(*) AS n_trips
            FROM hops
            WHERE d_ix IS NOT NULL AND (d_ix <> o_ix OR d_iy <> o_iy)
            GROUP BY 1, 2, 3, 4
        """,
        "dwell": """
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track, t.i AS i,
                     TIMESTAMP '2024-01-01 00:00:00' + t.i * INTERVAL 1 HOUR AS dtg,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 2000) t(i)
            ),
            flag AS (
              SELECT track, i, dtg,
                     (lon >= -30.0 AND lon <= 30.0 AND lat >= -85.0 AND lat <= -79.0) AS inb
              FROM c
            ),
            chg AS (
              SELECT track, i, dtg, inb,
                     CASE WHEN lag(inb) OVER w IS NULL OR lag(inb) OVER w <> inb
                          THEN 1 ELSE 0 END AS c
              FROM flag WINDOW w AS (PARTITION BY track ORDER BY i)
            ),
            runs AS (
              SELECT track, dtg, inb,
                     sum(c) OVER (PARTITION BY track ORDER BY i
                                  ROWS UNBOUNDED PRECEDING) AS run
              FROM chg
            )
            SELECT track, CAST(run AS INT) AS episode,
                   min(dtg) AS enter_dtg, max(dtg) AS exit_dtg,
                   CAST(count(*) AS INT) AS n_pings
            FROM runs WHERE inb GROUP BY track, run
        """,
        "repetition": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ),
            m AS (
              SELECT doc_id, w, len(w) AS n, list_distinct(w) AS dis,
                     CASE WHEN len(w) >= 2
                          THEN list_transform(generate_series(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i + 1])
                          ELSE [] END AS bg
              FROM w
            )
            SELECT doc_id, CAST(n AS INT) AS n_words,
                   CAST(len(dis) AS DOUBLE) / n AS distinct_ratio,
                   CAST(list_reduce(list_prepend(0,
                          list_transform(dis, x -> len(list_filter(w, y -> y = x)))),
                        (a, x) -> greatest(a, x)) AS DOUBLE) / n AS top_word_frac,
                   CASE WHEN len(bg) > 0
                        THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                        ELSE 0.0 END AS dup_bigram_frac
            FROM m
        """,
        "hotspots": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(sum(1.0) AS DOUBLE) AS weight,
                     count(*) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            nmax AS (
              SELECT CAST(g.ix + kx.v AS INT) AS tx, CAST(g.iy + ky.v AS INT) AS ty,
                     max(g.weight) AS nbr_max
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              WHERE NOT (kx.v = 0 AND ky.v = 0)
              GROUP BY 1, 2
            )
            SELECT g.ix, g.iy, g.weight, g.cnt,
                   coalesce(n.nbr_max, 0.0) AS nbr_max
            FROM grid g LEFT JOIN nmax n ON g.ix = n.tx AND g.iy = n.ty
            WHERE g.weight >= 2.0 AND g.weight > coalesce(n.nbr_max, 0.0)
        """,
        "funnel": """
            -- greedy min-ts chaining == the Spark fold's greedy
            -- earliest-match subsequence semantics (ts strictly
            -- increases with event_id, so min(ts) needs no tiebreak).
            -- NOT list_reduce: DuckDB 1.0's list_reduce mis-evaluates
            -- acc-conditional lambdas on ~1% of grouped rows (verified:
            -- the fold result contradicts the SAME ROW's list).
            WITH e AS (
              SELECT user_id, ts, event_type FROM events WHERE event_id < 1200
            ),
            u AS (SELECT DISTINCT user_id FROM e),
            s1 AS (
              SELECT user_id, min(ts) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t2
              FROM e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t3
              FROM e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id
            ),
            d AS (
              SELECT u.user_id,
                     CASE WHEN t3 IS NOT NULL THEN 3
                          WHEN t2 IS NOT NULL THEN 2
                          WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth
              FROM u
              LEFT JOIN s1 USING (user_id)
              LEFT JOIN s2 USING (user_id)
              LEFT JOIN s3 USING (user_id)
            )
            SELECT depth, count(*) AS n_keys FROM d GROUP BY depth
        """,
        "pmi_bigrams": """
            WITH toks AS (
              SELECT unnest(string_split(text, ' ')) AS w FROM documents
            ),
            tok AS (SELECT w FROM toks WHERE w <> ''),
            uni AS (SELECT w, count(*) AS n_w FROM tok GROUP BY w),
            n_tot AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM tok),
            pairs AS (
              SELECT t.arr[i] AS w1, t.arr[i + 1] AS w2
              FROM (SELECT string_split(text, ' ') AS arr FROM documents) t
              CROSS JOIN unnest(generate_series(1, len(t.arr) - 1)) AS g(i)
              WHERE len(t.arr) >= 2
            ),
            big AS (SELECT w1, w2 FROM pairs WHERE w1 <> '' AND w2 <> ''),
            b_tot AS (SELECT CAST(count(*) AS DOUBLE) AS B FROM big),
            bc AS (
              SELECT w1, w2, count(*) AS n_xy FROM big
              GROUP BY w1, w2 HAVING count(*) >= 5
            ),
            scored AS (
              SELECT bc.w1, bc.w2, bc.n_xy, u1.n_w AS n_x, u2.n_w AS n_y,
                     round((bc.n_xy * N * N) / (B * u1.n_w * u2.n_w), 6) AS score
              FROM bc
              JOIN uni u1 ON u1.w = bc.w1
              JOIN uni u2 ON u2.w = bc.w2
              CROSS JOIN n_tot CROSS JOIN b_tot
            )
            SELECT w1, w2, n_xy, n_x, n_y, score,
                   CAST(row_number() OVER (ORDER BY score DESC, w1 ASC, w2 ASC) AS INT) AS rank
            FROM scored
            ORDER BY score DESC, w1 ASC, w2 ASC
            LIMIT 20
        """,
        "grid_dbscan": f"""
            WITH RECURSIVE {SQL_PTS},
            cells AS (
              SELECT CAST(floor((lon - (-180.0)) / 1.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 1.0) AS INT) AS iy,
                     count(*) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            cc AS (SELECT *, CAST(iy AS BIGINT) * 360 + ix AS cell_id FROM cells),
            nb AS (
              SELECT a.cell_id, a.ix, a.iy, a.cnt,
                     CAST(sum(b.cnt) AS BIGINT) AS ncnt
              FROM cc a JOIN cc b
                ON abs(a.ix - b.ix) <= 1 AND abs(a.iy - b.iy) <= 1
              GROUP BY 1, 2, 3, 4
            ),
            core AS (SELECT * FROM nb WHERE ncnt >= 8),
            edges AS (
              SELECT a.cell_id AS s, b.cell_id AS d
              FROM core a JOIN core b
                ON abs(a.ix - b.ix) <= 1 AND abs(a.iy - b.iy) <= 1
               AND a.cell_id <> b.cell_id
            ),
            reach (node, lbl) AS (
              SELECT s, s FROM edges
              UNION
              SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node
            ),
            lab AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
            corelab AS (
              SELECT c.ix, c.iy, c.cnt, c.ncnt,
                     COALESCE(l.label, c.cell_id) AS cluster
              FROM core c LEFT JOIN lab l ON c.cell_id = l.node
            ),
            borders AS (
              SELECT n.ix, n.iy, n.cnt, n.ncnt, min(cl.cluster) AS cluster
              FROM nb n LEFT JOIN corelab cl
                ON abs(n.ix - cl.ix) <= 1 AND abs(n.iy - cl.iy) <= 1
              WHERE n.ncnt < 8
              GROUP BY 1, 2, 3, 4
            )
            SELECT ix, iy, cnt, ncnt, 'core' AS role, cluster FROM corelab
            UNION ALL
            SELECT ix, iy, cnt, ncnt,
                   CASE WHEN cluster IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   cluster
            FROM borders
        """,
        "track_resample": """
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track,
                     1704067200 + t.i * 3600 AS t,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 2000) t(i)
            ),
            b AS (SELECT track, min(t) AS t0, max(t) AS t1 FROM c GROUP BY track),
            g AS (
              SELECT track,
                     unnest(generate_series(CAST(ceil(t0 / 9000) * 9000 AS BIGINT),
                                            t1, 9000)) AS t
              FROM b
            ),
            u AS (
              SELECT track, t, 0 AS tag, lon, lat FROM c
              UNION ALL
              SELECT track, t, 1 AS tag, NULL AS lon, NULL AS lat FROM g
            ),
            w AS (
              SELECT track, t, tag,
                     last_value(CASE WHEN tag = 0 THEN t END IGNORE NULLS)
                       OVER wp AS pt,
                     first_value(CASE WHEN tag = 0 THEN t END IGNORE NULLS)
                       OVER wn AS nt,
                     last_value(CASE WHEN tag = 0 THEN lon END IGNORE NULLS)
                       OVER wp AS plon,
                     first_value(CASE WHEN tag = 0 THEN lon END IGNORE NULLS)
                       OVER wn AS nlon,
                     last_value(CASE WHEN tag = 0 THEN lat END IGNORE NULLS)
                       OVER wp AS plat,
                     first_value(CASE WHEN tag = 0 THEN lat END IGNORE NULLS)
                       OVER wn AS nlat
              FROM u
              WINDOW wp AS (PARTITION BY track ORDER BY t, tag
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wn AS (PARTITION BY track ORDER BY t, tag
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            )
            SELECT track, t,
                   round(CASE WHEN nt IS NULL OR nt = pt THEN plon
                         ELSE plon + (nlon - plon) * ((t - pt) / CAST(nt - pt AS DOUBLE))
                         END, 6) AS lon,
                   round(CASE WHEN nt IS NULL OR nt = pt THEN plat
                         ELSE plat + (nlat - plat) * ((t - pt) / CAST(nt - pt AS DOUBLE))
                         END, 6) AS lat
            FROM w WHERE tag = 1
        """,
        "percent_rank": """
            SELECT event_id, event_type, value,
                   round(percent_rank() OVER (PARTITION BY event_type
                                              ORDER BY value), 6) AS pr
            FROM events
        """,
        "pair_correlation": f"""
            WITH {SQL_PTS},
            p AS (
              SELECT doc_id || ':' || CAST(span_offset AS VARCHAR) AS pid, lon, lat
              FROM pts
            ),
            d AS (
              SELECT {_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')} AS dist_m
              FROM p a JOIN p b ON a.pid < b.pid
            )
            SELECT r.v AS radius_m, count(*) AS n_pairs
            FROM d CROSS JOIN (VALUES (75000.0), (150000.0), (300000.0)) AS r(v)
            WHERE d.dist_m <= r.v
            GROUP BY r.v
        """,
        "emerging": """
            WITH c AS (
              SELECT CAST(floor((CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) - (-180.0)) / 10.0) AS INT) AS ix,
                     CAST(floor((CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) - (-85.0)) / 10.0) AS INT) AS iy,
                     (1704067200 + t.i * 3600) // 1800000 AS bin
              FROM range(0, 2000) t(i)
            ),
            b AS (SELECT ix, iy, bin, count(*) AS c FROM c GROUP BY 1, 2, 3),
            agg AS (
              SELECT ix, iy, CAST(count(*) AS INT) AS n_bins,
                     CAST(sum(c) AS BIGINT) AS total
              FROM b GROUP BY 1, 2
            ),
            prs AS (
              SELECT p.ix, p.iy,
                     CAST(sum(CASE WHEN q.c > p.c THEN 1
                                   WHEN q.c < p.c THEN -1 ELSE 0 END) AS INT) AS s
              FROM b p JOIN b q
                ON p.ix = q.ix AND p.iy = q.iy AND p.bin < q.bin
              GROUP BY 1, 2
            )
            SELECT a.ix, a.iy, a.n_bins, a.total,
                   coalesce(s.s, 0) AS s_stat,
                   CASE WHEN coalesce(s.s, 0) > 1 THEN 'intensifying'
                        WHEN coalesce(s.s, 0) < -1 THEN 'diminishing'
                        ELSE 'stable' END AS trend
            FROM agg a LEFT JOIN prs s ON a.ix = s.ix AND a.iy = s.iy
        """,
        "knox": f"""
            WITH c AS (
              SELECT printf('f-%05d', t.i) AS pid,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat,
                     1704067200 + t.i * 3600 AS ts
              FROM range(0, 2000) t(i)
            ),
            pr AS (
              SELECT {_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')} AS d,
                     abs(a.ts - b.ts) AS dt
              FROM c a JOIN c b ON a.pid < b.pid
            ),
            agg AS (
              SELECT CAST(sum(CASE WHEN d <= 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS pairs_space,
                     CAST(sum(CASE WHEN dt <= 172800 THEN 1 ELSE 0 END) AS BIGINT) AS pairs_time,
                     CAST(sum(CASE WHEN d <= 200000.0 AND dt <= 172800 THEN 1 ELSE 0 END) AS BIGINT) AS pairs_spacetime,
                     count(*) AS pairs_total
              FROM pr
            )
            SELECT CAST(2000 AS BIGINT) AS n_points, pairs_total, pairs_space,
                   pairs_time, pairs_spacetime,
                   round(CAST(pairs_space AS DOUBLE) * pairs_time / pairs_total, 6) AS expected_st
            FROM agg
        """,
        "clark_evans": f"""
            WITH {SQL_PTS},
            p AS (
              SELECT doc_id || ':' || CAST(span_offset AS VARCHAR) AS pid, lon, lat
              FROM pts
            ),
            nn AS (
              SELECT a.pid, min({_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')}) AS nn_m
              FROM p a JOIN p b ON a.pid <> b.pid
              GROUP BY a.pid
            ),
            agg AS (
              SELECT count(*) AS n_points,
                     sum(CAST(round(nn_m, 6) AS DECIMAL(28,6))) AS s
              FROM nn
            )
            SELECT n_points,
                   round(CAST(s AS DOUBLE) / n_points, 6) AS mean_nn_m,
                   round((CAST(s AS DOUBLE) / n_points)
                         / (0.5 / sqrt(n_points / CAST(510000000000000.0 AS DOUBLE))), 6) AS r_index
            FROM agg
        """,
        "quadrat": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     count(*) AS c
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            agg AS (
              SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
                     CAST(coalesce(sum(c * c), 0) AS BIGINT) AS ss
              FROM grid
            )
            SELECT CAST(2448 AS INT) AS n_cells, n AS n_points,
                   round(CAST(n AS DOUBLE) / 2448, 6) AS mean_count,
                   round(((CAST(ss AS DOUBLE) - CAST(n AS DOUBLE) * n / 2448) / 2447)
                         / (CAST(n AS DOUBLE) / 2448), 6) AS vmr
            FROM agg
        """,
        "global_autocorr": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS BIGINT) AS c
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            wsum AS (
              SELECT CAST(g.ix + kx.v AS INT) AS tx, CAST(g.iy + ky.v AS INT) AS ty,
                     CAST(sum(g.c) AS BIGINT) AS sw
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              GROUP BY 1, 2
            ),
            agg AS (
              SELECT count(*) AS n_occupied,
                     CAST(sum(g.c) AS BIGINT) AS t,
                     CAST(sum(g.c * g.c) AS BIGINT) AS q,
                     CAST(sum(g.c * (w.sw - g.c)) AS BIGINT) AS p,
                     CAST(sum(((least(g.ix + 1, 71) - greatest(g.ix - 1, 0) + 1)
                             * (least(g.iy + 1, 33) - greatest(g.iy - 1, 0) + 1) - 1) * g.c) AS BIGINT) AS d
              FROM grid g JOIN wsum w ON g.ix = w.tx AND g.iy = w.ty
            )
            SELECT CAST(2448 AS INT) AS n_cells, n_occupied, t, p, d,
                   round(CAST(p AS DOUBLE) / (CAST(t AS DOUBLE) * t - q), 6) AS general_g,
                   round((CAST(2448 AS DOUBLE) / 18952)
                         * (((CAST(p AS DOUBLE) - (2.0 * (CAST(t AS DOUBLE) / 2448)) * d)
                             + ((CAST(t AS DOUBLE) / 2448) * (CAST(t AS DOUBLE) / 2448)) * 18952)
                            / (CAST(q AS DOUBLE) - CAST(t AS DOUBLE) * t / 2448)), 6) AS moran_i
            FROM agg
        """,
        "directional": f"""
            WITH {SQL_PTS},
            m AS (
              SELECT span_offset,
                     count(*) AS n,
                     sum(CAST(lon AS DECIMAL(12,2))) AS sx,
                     sum(CAST(lat AS DECIMAL(12,2))) AS sy,
                     sum(CAST(lon AS DECIMAL(12,2)) * CAST(lon AS DECIMAL(12,2))) AS sxx,
                     sum(CAST(lat AS DECIMAL(12,2)) * CAST(lat AS DECIMAL(12,2))) AS syy,
                     sum(CAST(lon AS DECIMAL(12,2)) * CAST(lat AS DECIMAL(12,2))) AS sxy
              FROM pts
              GROUP BY 1
            ),
            cov AS (
              SELECT span_offset, n, sx, sy,
                     (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n AS a,
                     (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / n AS b,
                     (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n AS c
              FROM m
            ),
            eig AS (
              SELECT span_offset, n, sx, sy, a, b,
                     (a + c + sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 AS lam1,
                     (a + c - sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0 AS lam2
              FROM cov
            )
            SELECT span_offset, n,
                   round(CAST(sx AS DOUBLE) / n, 6) AS mean_x,
                   round(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
                   round(sqrt(greatest(lam1, CAST(0.0 AS DOUBLE))), 6) AS major_axis,
                   round(sqrt(greatest(lam2, CAST(0.0 AS DOUBLE))), 6) AS minor_axis,
                   round(CASE WHEN b = 0.0 THEN 0.0 ELSE (lam1 - a) / b END, 6) AS tan_theta
            FROM eig
        """,
        "hausdorff": f"""
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS name,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 2000) t(i)
            ),
            prod AS (
              SELECT a.name AS track_a, b.name AS track_b,
                     a.lon AS a_lon, a.lat AS a_lat, b.lon AS b_lon, b.lat AS b_lat,
                     {_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')} AS d
              FROM c a JOIN c b ON a.name < b.name
            ),
            fwd AS (
              SELECT track_a, track_b, max(mn) AS h FROM (
                SELECT track_a, track_b, a_lon, a_lat, min(d) AS mn
                FROM prod GROUP BY 1, 2, 3, 4)
              GROUP BY 1, 2
            ),
            bwd AS (
              SELECT track_a, track_b, max(mn) AS h FROM (
                SELECT track_a, track_b, b_lon, b_lat, min(d) AS mn
                FROM prod GROUP BY 1, 2, 3, 4)
              GROUP BY 1, 2
            )
            SELECT f.track_a, f.track_b, round(greatest(f.h, w.h), 6) AS hausdorff_m
            FROM fwd f JOIN bwd w ON f.track_a = w.track_a AND f.track_b = w.track_b
        """,
        "clq": f"""
            WITH {SQL_PTS},
            p AS (
              SELECT doc_id || ':' || CAST(span_offset AS VARCHAR) AS pid,
                     span_offset AS cat, lon, lat, doc_id, span_offset
              FROM pts
            ),
            nbr AS (
              SELECT a.pid, a.cat AS cat_a, b.cat AS cat_b,
                     row_number() OVER (PARTITION BY a.pid
                       ORDER BY {_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')},
                                b.doc_id, b.span_offset) AS r
              FROM p a JOIN p b ON a.pid <> b.pid
            ),
            cc AS (SELECT cat_a, cat_b, count(*) AS c_ab FROM nbr WHERE r <= 5 GROUP BY 1, 2),
            tot AS (SELECT cat, count(*) AS n_c FROM p GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM p)
            SELECT cat_a, cat_b, c_ab,
                   round((CAST(c_ab AS DOUBLE) / (ta.n_c * 5))
                         / (CAST(tb.n_c - CASE WHEN cat_a = cat_b THEN 1 ELSE 0 END AS DOUBLE)
                            / (nn.n - 1)), 6) AS clq
            FROM cc
            JOIN tot ta ON cc.cat_a = ta.cat
            JOIN tot tb ON cc.cat_b = tb.cat
            CROSS JOIN nn
        """,
        "encounters": f"""
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS name,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat,
                     1704067200 + t.i * 3600 AS ts
              FROM range(0, 2000) t(i)
            ),
            pr AS (
              SELECT a.name AS track_a, b.name AS track_b,
                     {_sql_haversine('a.lon', 'a.lat', 'b.lon', 'b.lat')} AS d,
                     abs(a.ts - b.ts) AS dt
              FROM c a JOIN c b ON a.name < b.name
            )
            SELECT track_a, track_b, count(*) AS n_close,
                   round(min(d), 6) AS min_dist_m
            FROM pr
            WHERE d <= 50000.0 AND dt <= 7200
            GROUP BY 1, 2
        """,
        "chunks": """
            WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            s AS (
              SELECT doc_id, toks,
                     generate_series(1, greatest(len(toks) - 8, 1), 24) AS starts
              FROM tok
            ),
            e AS (
              SELECT doc_id, toks,
                     unnest(list_transform(generate_series(1, len(starts)),
                       j -> struct_pack(chunk_id := j - 1, start := starts[j]))) AS c
              FROM s
            )
            SELECT doc_id,
                   CAST(c.chunk_id AS INT) AS chunk_id,
                   CAST(c.start AS INT) AS start,
                   CAST(len(toks[c.start : c.start + 31]) AS INT) AS n_tokens,
                   array_to_string(toks[c.start : c.start + 31], ' ') AS chunk
            FROM e
        """,
        "geofence": """
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS name,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat,
                     1704067200 + t.i * 3600 AS ts_s
              FROM range(0, 2000) t(i)
            ),
            f AS (
              SELECT * FROM (VALUES
                ('f-0', -50.0, -85.0, 50.0, -80.0),
                ('f-1', 100.0, -83.0, 170.0, -81.0)
              ) AS t(fence_id, min_lon, min_lat, max_lon, max_lat)
            ),
            j AS (
              SELECT f.fence_id, c.name, c.ts_s,
                     CASE WHEN c.lon >= f.min_lon AND c.lon <= f.max_lon
                           AND c.lat >= f.min_lat AND c.lat <= f.max_lat
                          THEN 1 ELSE 0 END AS i
              FROM c CROSS JOIN f
            ),
            l AS (
              SELECT fence_id, name, ts_s, i,
                     lag(i) OVER (PARTITION BY fence_id, name ORDER BY ts_s) AS p
              FROM j
            )
            SELECT fence_id, name AS track, ts_s,
                   CASE WHEN i = 1 THEN 'enter' ELSE 'exit' END AS event
            FROM l WHERE p IS NOT NULL AND p <> i
        """,
        "transitions": """
            WITH l AS (
              SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
              FROM events
            ),
            c AS (
              SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
              FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2
            ),
            t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
            SELECT c.from_type, c.to_type, c.n,
                   round(CAST(c.n AS DOUBLE) / t.tot, 6) AS prob
            FROM c JOIN t ON c.from_type = t.from_type
        """,
        "sinuosity": f"""
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track, t.i AS i,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 2000) t(i)
            ),
            legs AS (
              SELECT track, lon, lat, i,
                     lead(lon) OVER (PARTITION BY track ORDER BY i) AS nlon,
                     lead(lat) OVER (PARTITION BY track ORDER BY i) AS nlat
              FROM c
            ),
            agg AS (
              SELECT track, CAST(count(*) AS INT) AS n_points,
                     CAST(coalesce(sum(CAST(CASE WHEN nlon IS NULL THEN NULL
                          ELSE {_sql_haversine('lon', 'lat', 'nlon', 'nlat')}
                          END AS DECIMAL(18,6))), 0) AS DOUBLE) AS path,
                     arg_min(lon, i) AS ax, arg_min(lat, i) AS ay,
                     arg_max(lon, i) AS bx, arg_max(lat, i) AS byy
              FROM legs GROUP BY track
            )
            SELECT track, n_points, round(path, 6) AS path_m,
                   round({_sql_haversine('ax', 'ay', 'bx', 'byy')}, 6) AS chord_m,
                   round(CASE WHEN {_sql_haversine('ax', 'ay', 'bx', 'byy')} > 0.0
                         THEN path / ({_sql_haversine('ax', 'ay', 'bx', 'byy')}) END, 6) AS sinuosity
            FROM agg
        """,
        "flow": """
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track, t.i AS i,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 2000) t(i)
            ),
            legs AS (
              SELECT track, lon, lat,
                     lead(CAST(lon AS DECIMAL(12,2))) OVER (PARTITION BY track ORDER BY i)
                       - CAST(lon AS DECIMAL(12,2)) AS dx,
                     lead(CAST(lat AS DECIMAL(12,2))) OVER (PARTITION BY track ORDER BY i)
                       - CAST(lat AS DECIMAL(12,2)) AS dy
              FROM c
            ),
            f AS (
              SELECT * FROM legs
              WHERE dx IS NOT NULL
                AND lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
            )
            SELECT CAST(floor((lon - (-180.0)) / 10.0) AS INT) AS ix,
                   CAST(floor((lat - (-85.0)) / 10.0) AS INT) AS iy,
                   count(*) AS n_legs,
                   round(CAST(sum(dx) AS DOUBLE) / count(*), 6) AS mean_dx,
                   round(CAST(sum(dy) AS DOUBLE) / count(*), 6) AS mean_dy
            FROM f GROUP BY 1, 2
        """,
        "rasterize": f"""
            WITH {SQL_RECTS},
            r AS (
              SELECT * FROM rects_env
              WHERE max_lon > -180.0 AND min_lon < 180.0
                AND max_lat > -85.0 AND min_lat < 85.0
            ),
            e AS (
              SELECT min_lon, min_lat, max_lon, max_lat, ixx.v AS ix, iyy.v AS iy
              FROM r
              CROSS JOIN LATERAL unnest(generate_series(
                  CAST(greatest(floor((min_lon - (-180.0)) / 5.0), 0) AS INT),
                  CAST(least(floor((max_lon - (-180.0)) / 5.0), 71) AS INT))) AS ixx(v)
              CROSS JOIN LATERAL unnest(generate_series(
                  CAST(greatest(floor((min_lat - (-85.0)) / 5.0), 0) AS INT),
                  CAST(least(floor((max_lat - (-85.0)) / 5.0), 33) AS INT))) AS iyy(v)
            ),
            o AS (
              SELECT ix, iy,
                     CAST(least(max_lon, -180.0 + (ix + 1) * 5.0) AS DECIMAL(14,3))
                       - CAST(greatest(min_lon, -180.0 + ix * 5.0) AS DECIMAL(14,3)) AS ow,
                     CAST(least(max_lat, -85.0 + (iy + 1) * 5.0) AS DECIMAL(14,3))
                       - CAST(greatest(min_lat, -85.0 + iy * 5.0) AS DECIMAL(14,3)) AS oh
              FROM e
            )
            SELECT CAST(ix AS INT) AS ix, CAST(iy AS INT) AS iy,
                   count(*) AS n_rects,
                   round(CAST(sum(ow * oh) AS DOUBLE), 6) AS coverage
            FROM o WHERE ow > 0 AND oh > 0 GROUP BY 1, 2
        """,
        "postings": """
            WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            e AS (
              SELECT doc_id, toks[j] AS term, j
              FROM tok CROSS JOIN LATERAL unnest(generate_series(1, len(toks))) AS t(j)
            ),
            td AS (
              SELECT term, doc_id, CAST(count(*) AS INT) AS n_occ,
                     CAST(min(j) AS INT) AS first_pos
              FROM e GROUP BY 1, 2
            ),
            dfreq AS (
              SELECT term, count(*) AS df FROM td GROUP BY 1 HAVING count(*) >= 50
            )
            SELECT td.term, td.doc_id, td.n_occ, td.first_pos, dfreq.df
            FROM td JOIN dfreq ON td.term = dfreq.term
        """,
        "lag_autocorr": """
            WITH b AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            filled AS (
              SELECT d.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            pairs AS (
              SELECT a.c AS x, y.c AS y
              FROM filled a JOIN filled y ON y.bin = a.bin + 1
            ),
            s AS (
              SELECT count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM pairs
            )
            SELECT n AS n_pairs,
                   round(CASE WHEN sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0.0
                         THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                         END, 6) AS r
            FROM s
        """,
        "benford": f"""
            WITH k AS (SELECT CAST(round(abs(value) * 100) AS BIGINT) AS k FROM events),
            pos AS (SELECT k FROM k WHERE k >= 1),
            c AS (
              SELECT CAST(substr(CAST(k AS VARCHAR), 1, 1) AS INT) AS digit,
                     count(*) AS n
              FROM pos GROUP BY 1
            ),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM c)
            SELECT digit, n,
                   round(CAST(tt AS DOUBLE) * ([{benford_list}])[digit], 6) AS expected_n,
                   round((CAST(n AS DOUBLE) - CAST(tt AS DOUBLE) * ([{benford_list}])[digit])
                         * (CAST(n AS DOUBLE) - CAST(tt AS DOUBLE) * ([{benford_list}])[digit])
                         / (CAST(tt AS DOUBLE) * ([{benford_list}])[digit]), 6) AS chi_term
            FROM c CROSS JOIN t
        """,
        "retention": """
            WITH ev AS (
              SELECT user_id AS k, (epoch_us(ts) // 1000000) // 86400 AS bin
              FROM events
            ),
            first AS (SELECT k, min(bin) AS cohort FROM ev GROUP BY 1),
            active AS (
              SELECT f.cohort AS cohort_bin, e.bin - f.cohort AS "offset",
                     CAST(count(DISTINCT e.k) AS BIGINT) AS n_active
              FROM ev e JOIN first f ON e.k = f.k
              GROUP BY 1, 2
            ),
            size_ AS (
              SELECT cohort_bin, n_active AS sz FROM active WHERE "offset" = 0
            )
            SELECT a.cohort_bin, a."offset" AS offset, a.n_active,
                   round(CAST(a.n_active AS DOUBLE) / s.sz, 6) AS retention
            FROM active a JOIN size_ s ON a.cohort_bin = s.cohort_bin
        """,
        "hhi": """
            WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
            agg AS (
              SELECT count(*) AS n_keys,
                     CAST(sum(c) AS BIGINT) AS t,
                     CAST(sum(c * c) AS BIGINT) AS ss
              FROM c
            )
            SELECT n_keys, t AS n_rows,
                   round(CAST(ss AS DOUBLE) / (CAST(t AS DOUBLE) * t), 6) AS hhi,
                   round(1.0 / (CAST(ss AS DOUBLE) / (CAST(t AS DOUBLE) * t)), 6) AS effective_keys
            FROM agg
        """,
        "cusum": """
            WITH b AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT bounds.lo, t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            filled AS (
              SELECT d.lo, d.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            w AS (
              SELECT lo, bin, c,
                     CAST(sum(c) OVER (ORDER BY bin) AS BIGINT) AS s,
                     CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i,
                     CAST(count(*) OVER () AS BIGINT) AS n,
                     CAST(sum(c) OVER () AS BIGINT) AS t
              FROM filled
            ),
            best AS (
              SELECT * , abs(n * s - i * t) AS v FROM w
              WHERE i < n
              ORDER BY v DESC, i ASC LIMIT 1
            )
            SELECT n AS n_bins, t AS total, lo + i - 1 AS cp_bin, i AS cp_index,
                   round(CAST(v AS DOUBLE) / n, 6) AS stat,
                   round(CAST(s AS DOUBLE) / i, 6) AS mean_before,
                   round(CAST(t - s AS DOUBLE) / (n - i), 6) AS mean_after
            FROM best
        """,
        "ewma": """
            WITH RECURSIVE b AS (
              SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events
            ),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            f AS (
              SELECT d.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c,
                     CAST(row_number() OVER (ORDER BY d.bin) AS BIGINT) AS i
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            e(i, bin, c, s) AS (
              SELECT i, bin, c, CAST(c AS DOUBLE) FROM f WHERE i = 1
              UNION ALL
              SELECT f.i, f.bin, f.c, 0.25e0 * f.c + (1.0e0 - 0.25e0) * e.s
              FROM e JOIN f ON f.i = e.i + 1
            )
            SELECT bin, c, round(s, 6) AS ewma FROM e
        """,
        "overlap": """
            WITH a AS (
              SELECT user_id, epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
              FROM events WHERE event_type = 'click'
              GROUP BY user_id, (epoch_us(ts) // 1000000) // 86400
            ),
            b AS (
              SELECT user_id, epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
              FROM events WHERE event_type = 'view'
              GROUP BY user_id, (epoch_us(ts) // 1000000) // 86400
            ),
            edges AS (
              SELECT user_id AS k, s AS t, 1 AS da, 0 AS db FROM a
              UNION ALL SELECT user_id, e, -1, 0 FROM a
              UNION ALL SELECT user_id, s, 0, 1 FROM b
              UNION ALL SELECT user_id, e, 0, -1 FROM b
            ),
            seg AS (
              SELECT k, t,
                     sum(da) OVER (PARTITION BY k ORDER BY t, da, db
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                     sum(db) OVER (PARTITION BY k ORDER BY t, da, db
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
                     lead(t) OVER (PARTITION BY k ORDER BY t, da, db) AS nt
              FROM edges
            )
            SELECT k AS user_id,
                   CAST(coalesce(sum(CASE WHEN ca > 0 AND cb > 0 AND nt IS NOT NULL
                                     THEN nt - t END), 0) AS BIGINT) AS overlap_us
            FROM seg GROUP BY k
        """,
        "mixture": """
            WITH avail AS (
              SELECT CAST(doc_id % 3 AS VARCHAR) AS domain,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS available
              FROM documents GROUP BY 1
            ),
            t (domain, target) AS (
              VALUES ('0', CAST(5000 AS BIGINT)), ('1', CAST(2000 AS BIGINT))
            )
            SELECT a.domain, a.available, t.target,
                   round(CASE WHEN t.target IS NOT NULL THEN
                     least(1.0e0, CAST(t.target AS DOUBLE) / CAST(a.available AS DOUBLE)) END, 6) AS rate,
                   round(round(CASE WHEN t.target IS NOT NULL THEN
                     least(1.0e0, CAST(t.target AS DOUBLE) / CAST(a.available AS DOUBLE)) END, 6)
                         * CAST(a.available AS DOUBLE), 6) AS expected_kept
            FROM avail a LEFT JOIN t USING (domain)
        """,
        "odds": """
            WITH agg AS (
              SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                     CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                     CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                     CAST(sum(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS s2
              FROM events
            )
            SELECT n1, s1, n2, s2,
                   round(CASE WHEN n1 - s1 > 0 THEN
                     CAST(s1 AS DOUBLE) / CAST(n1 - s1 AS DOUBLE) END, 6) AS odds1,
                   round(CASE WHEN n2 - s2 > 0 THEN
                     CAST(s2 AS DOUBLE) / CAST(n2 - s2 AS DOUBLE) END, 6) AS odds2,
                   round(CASE WHEN s2 > 0 AND n1 - s1 > 0 THEN
                     CAST(s1 * (n2 - s2) AS DOUBLE) / CAST(s2 * (n1 - s1) AS DOUBLE)
                   END, 6) AS odds_ratio
            FROM agg
        """,
        "aspect": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            sp AS (
              SELECT CAST(g.ix + kx.v AS INT) AS ix, CAST(g.iy + ky.v AS INT) AS iy,
                     g.cnt, kx.v AS kx, ky.v AS ky
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              WHERE g.ix + kx.v >= 0 AND g.ix + kx.v < 72
                AND g.iy + ky.v >= 0 AND g.iy + ky.v < 34
            ),
            agg AS (
              SELECT ix, iy,
                     CAST(sum(cnt * ((-kx) * (2 - abs(ky)))) AS BIGINT) AS gx8,
                     CAST(sum(cnt * ((-ky) * (2 - abs(kx)))) AS BIGINT) AS gy8
              FROM sp GROUP BY 1, 2
            )
            SELECT ix, iy, gx8, gy8,
                   CASE WHEN gx8 = 0 AND gy8 = 0 THEN NULL
                        WHEN gx8 > 0 AND gy8 >= 0 AND abs(gx8) > abs(gy8) THEN 0
                        WHEN gx8 > 0 AND gy8 > 0 THEN 1
                        WHEN gx8 <= 0 AND gy8 > 0 AND abs(gy8) > abs(gx8) THEN 2
                        WHEN gx8 < 0 AND gy8 > 0 THEN 3
                        WHEN gx8 < 0 AND gy8 <= 0 AND abs(gx8) > abs(gy8) THEN 4
                        WHEN gx8 < 0 AND gy8 < 0 THEN 5
                        WHEN gx8 >= 0 AND gy8 < 0 AND abs(gy8) > abs(gx8) THEN 6
                        ELSE 7 END AS octant
            FROM agg
        """,
        "acf": """
            WITH b AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            filled AS (
              SELECT d.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            x AS (
              SELECT bin + l.l AS b2, CAST(l.l AS INT) AS lag, c AS x
              FROM filled CROSS JOIN LATERAL unnest(generate_series(1, 48)) AS l(l)
            ),
            y AS (SELECT bin AS b2, c AS y FROM filled),
            s AS (
              SELECT lag, count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM x JOIN y USING (b2) GROUP BY 1
            )
            SELECT lag, n AS n_pairs,
                   round(CASE WHEN sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0.0
                         THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                         END, 6) AS r
            FROM s
        """,
        "seasonal": """
            WITH b AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            filled AS (
              SELECT d.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            ph AS (SELECT bin, bin % 24 AS phase, c FROM filled),
            means AS (
              SELECT phase, CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
              FROM ph GROUP BY 1
            )
            SELECT p.bin, p.phase, p.c,
                   round(m.m, 6) AS phase_mean,
                   round(CAST(p.c AS DOUBLE) - m.m, 6) AS resid
            FROM ph p JOIN means m ON p.phase = m.phase
        """,
        "cohens_h": """
            WITH agg AS (
              SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                     CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                     CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                     CAST(sum(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS s2
              FROM events
            )
            SELECT n1, s1, n2, s2,
                   round(CASE WHEN n1 > 0 THEN CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) END, 6) AS p1,
                   round(CASE WHEN n2 > 0 THEN CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) END, 6) AS p2,
                   round(CASE WHEN n1 > 0 AND n2 > 0 THEN
                     2.0e0 * asin(sqrt(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                     - 2.0e0 * asin(sqrt(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                   END, 6) AS h
            FROM agg
        """,
        "silhouette": """
            WITH pt AS (
              SELECT vec_id AS vid, label AS plbl, i.i AS i,
                     CAST(embedding[i.i + 1] AS DOUBLE) AS x
              FROM embeddings
              CROSS JOIN LATERAL unnest(generate_series(0, len(embedding) - 1)) AS i(i)
            ),
            ad AS (
              SELECT label AS lbl, i.i AS i, CAST(embedding[i.i + 1] AS DOUBLE) AS x
              FROM embeddings
              CROSS JOIN LATERAL unnest(generate_series(0, len(embedding) - 1)) AS i(i)
            ),
            cent AS (
              SELECT lbl, i,
                     CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
              FROM ad GROUP BY 1, 2
            ),
            d2 AS (
              SELECT p.vid, p.plbl, c.lbl AS clbl,
                     sum(CAST(round((p.x - c.m) * (p.x - c.m), 6) AS DECIMAL(25,6))) AS d2
              FROM pt p JOIN cent c ON p.i = c.i
              GROUP BY 1, 2, 3
            ),
            per_pt AS (
              SELECT vid, plbl,
                     min(CASE WHEN clbl = plbl THEN sqrt(CAST(d2 AS DOUBLE)) END) AS a,
                     min(CASE WHEN clbl <> plbl THEN sqrt(CAST(d2 AS DOUBLE)) END) AS b
              FROM d2 GROUP BY 1, 2
            )
            SELECT plbl AS label, CAST(count(*) AS BIGINT) AS n,
                   round(CAST(sum(CAST(round(CASE WHEN greatest(a, b) > 0.0e0
                             THEN (b - a) / greatest(a, b) ELSE 0.0e0 END, 6)
                           AS DECIMAL(20,6))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS mean_s
            FROM per_pt GROUP BY 1
        """,
        "centroids": """
            WITH a AS (
              SELECT label AS lbl, i.i AS i, CAST(embedding[i.i + 1] AS DOUBLE) AS x
              FROM embeddings
              CROSS JOIN LATERAL unnest(generate_series(0, len(embedding) - 1)) AS i(i)
            ),
            cent AS (
              SELECT lbl, i,
                     CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
              FROM a GROUP BY 1, 2
            ),
            pr AS (
              SELECT ca.lbl AS label_a, cb.lbl AS label_b,
                     CAST(round((ca.m - cb.m) * (ca.m - cb.m), 6) AS DECIMAL(25,6)) AS term
              FROM cent ca JOIN cent cb ON ca.i = cb.i AND ca.lbl < cb.lbl
            ),
            agg AS (SELECT label_a, label_b, sum(term) AS d2 FROM pr GROUP BY 1, 2)
            SELECT label_a, label_b, round(CAST(d2 AS DOUBLE), 6) AS dist2,
                   round(sqrt(CAST(d2 AS DOUBLE)), 6) AS dist
            FROM agg
        """,
        "tri": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            nbr AS (
              SELECT CAST(g.ix + kx.v AS INT) AS ix, CAST(g.iy + ky.v AS INT) AS iy,
                     g.cnt AS vn
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              WHERE NOT (kx.v = 0 AND ky.v = 0)
                AND g.ix + kx.v >= 0 AND g.ix + kx.v < 72
                AND g.iy + ky.v >= 0 AND g.iy + ky.v < 34
            ),
            agg AS (
              SELECT c.ix, c.iy, c.cnt,
                     CAST(coalesce(sum((n.vn - c.cnt) * (n.vn - c.cnt)), 0) AS BIGINT) AS occ_sum,
                     CAST(count(n.vn) AS BIGINT) AS n_occ
              FROM grid c LEFT JOIN nbr n ON n.ix = c.ix AND n.iy = c.iy
              GROUP BY 1, 2, 3
            )
            SELECT ix, iy, cnt,
                   occ_sum + ((least(ix + 1, 71) - greatest(ix - 1, 0) + 1)
                              * (least(iy + 1, 33) - greatest(iy - 1, 0) + 1)
                              - 1 - n_occ) * cnt * cnt AS tri_sum,
                   round(sqrt(CAST(occ_sum
                     + ((least(ix + 1, 71) - greatest(ix - 1, 0) + 1)
                        * (least(iy + 1, 33) - greatest(iy - 1, 0) + 1)
                        - 1 - n_occ) * cnt * cnt AS DOUBLE)), 6) AS tri
            FROM agg
        """,
        "semi_join": f"""
            WITH {SQL_PTS}, {SQL_RECTS}
            SELECT p.doc_id, p.span_offset, p.lon, p.lat
            FROM pts p
            WHERE EXISTS (
              SELECT 1 FROM rects_env e
              WHERE p.lon >= e.min_lon AND p.lon <= e.max_lon
                AND p.lat >= e.min_lat AND p.lat <= e.max_lat
            )
        """,
        "conversion": """
            WITH base AS (
              SELECT user_id AS key, event_type AS et, epoch_us(ts) AS t FROM events
            ),
            ff AS (
              SELECT key, CAST(min(t) AS BIGINT) AS first_from_us
              FROM base WHERE et = 'view' GROUP BY 1
            ),
            agg AS (
              SELECT ff.key, ff.first_from_us,
                     CAST(min(CASE WHEN b.t >= ff.first_from_us THEN b.t END) AS BIGINT)
                       AS first_to_us
              FROM ff LEFT JOIN base b ON b.key = ff.key AND b.et = 'purchase'
              GROUP BY 1, 2
            )
            SELECT key, first_from_us, first_to_us,
                   first_to_us - first_from_us AS latency_us
            FROM agg
        """,
        "peaks": """
            WITH b AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            filled AS (
              SELECT d.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            p AS (SELECT bin + 1 AS bin, c AS pc FROM filled),
            nx AS (SELECT bin - 1 AS bin, c AS nc FROM filled)
            SELECT f.bin, f.c,
                   CAST(coalesce(p.pc, 0) AS BIGINT) AS prev_c,
                   CAST(coalesce(nx.nc, 0) AS BIGINT) AS next_c
            FROM filled f LEFT JOIN p USING (bin) LEFT JOIN nx USING (bin)
            WHERE f.c >= 1 AND f.c > coalesce(p.pc, 0) AND f.c > coalesce(nx.nc, 0)
        """,
        "wilson": """
            WITH g AS (
              SELECT user_id % 10 AS segment, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS s
              FROM events GROUP BY 1
            )
            SELECT segment, n, s,
                   round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
                   round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                          + (1.96e0 * 1.96e0) / (2.0e0 * CAST(n AS DOUBLE)))
                         / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n AS DOUBLE))
                         - 1.96e0 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                             * (1.0e0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                             + (1.96e0 * 1.96e0) / (4.0e0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                           / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n AS DOUBLE)), 6) AS ci_low,
                   round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                          + (1.96e0 * 1.96e0) / (2.0e0 * CAST(n AS DOUBLE)))
                         / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n AS DOUBLE))
                         + 1.96e0 * sqrt(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                             * (1.0e0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                             + (1.96e0 * 1.96e0) / (4.0e0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                           / (1.0e0 + (1.96e0 * 1.96e0) / CAST(n AS DOUBLE)), 6) AS ci_high
            FROM g
        """,
        "proximity": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            sp AS (
              SELECT CAST(g.ix + kx.v AS INT) AS ix, CAST(g.iy + ky.v AS INT) AS iy,
                     greatest(abs(kx.v), abs(ky.v)) AS d
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-3, 3)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-3, 3)) AS v) ky
              WHERE g.ix + kx.v >= 0 AND g.ix + kx.v < 72
                AND g.iy + ky.v >= 0 AND g.iy + ky.v < 34
            )
            SELECT ix, iy, CAST(min(d) AS BIGINT) AS dist FROM sp GROUP BY 1, 2
        """,
        "runs": """
            WITH b AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            filled AS (
              SELECT d.bin, CAST(coalesce(c.c, 0) AS BIGINT) AS c
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS t FROM filled),
            signed AS (
              SELECT bin, CASE WHEN c * n > t THEN 1 ELSE 0 END AS s
              FROM filled CROSS JOIN tot
            ),
            trans AS (
              SELECT CAST(coalesce(sum(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END), 0) AS BIGINT) AS chg
              FROM signed a JOIN signed b ON b.bin = a.bin + 1
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS n1,
                     CAST(sum(1 - s) AS BIGINT) AS n2
              FROM signed
            )
            SELECT n AS n_bins, n1 AS n_above, n2 AS n_below, chg + 1 AS runs,
                   round(CASE WHEN n1 > 0 AND n2 > 0 AND n > 1 THEN
                     (CAST(chg + 1 AS DOUBLE)
                      - (1.0e0 + 2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE)))
                     / sqrt((2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                             * (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - CAST(n AS DOUBLE)))
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)))
                   END, 6) AS z
            FROM agg CROSS JOIN trans
        """,
        "hellinger": """
            WITH cells AS (
              SELECT event_type AS g,
                     CAST(least(greatest(floor((value - 0.0) / 10.0), 0), 49) AS BIGINT) AS bin,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
            ),
            tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1),
            pg AS (
              SELECT cells.g, bin, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
              FROM cells JOIN tot ON cells.g = tot.g
            ),
            pr AS (
              SELECT a.g AS group_a, b.g AS group_b, a.bin,
                     CAST(round(sqrt(a.p * b.p), 6) AS DECIMAL(20,6)) AS term
              FROM pg a JOIN pg b ON a.bin = b.bin AND a.g < b.g
            ),
            agg AS (
              SELECT group_a, group_b, CAST(count(*) AS BIGINT) AS nb,
                     sum(term) AS bc_d
              FROM pr GROUP BY 1, 2
            ),
            univ AS (
              SELECT a.g AS group_a, b.g AS group_b
              FROM tot a JOIN tot b ON a.g < b.g
            )
            SELECT u.group_a, u.group_b,
                   CAST(coalesce(agg.nb, 0) AS BIGINT) AS n_bins_shared,
                   round(coalesce(CAST(bc_d AS DOUBLE), 0.0e0), 6) AS bc,
                   round(sqrt(greatest(1.0e0 - coalesce(CAST(bc_d AS DOUBLE), 0.0e0), 0.0e0)), 6) AS hellinger
            FROM univ u LEFT JOIN agg ON agg.group_a = u.group_a AND agg.group_b = u.group_b
        """,
        "hilbert_cells": f"""
            WITH RECURSIVE {SQL_PTS},
            cells AS (
              SELECT doc_id, span_offset,
                     CAST(least(greatest(floor((lon + 180.0) / 360.0 * 256), 0), 255) AS BIGINT) AS ix,
                     CAST(least(greatest(floor((lat + 90.0) / 180.0 * 256), 0), 255) AS BIGINT) AS iy
              FROM pts
            ),
            it (doc_id, span_offset, ix0, iy0, i, x, y, d) AS (
              SELECT doc_id, span_offset, ix, iy, 7, ix, iy, CAST(0 AS BIGINT) FROM cells
              UNION ALL
              SELECT doc_id, span_offset, ix0, iy0, i - 1,
                     CASE WHEN ((y >> i) & 1) = 0 THEN
                       CASE WHEN ((x >> i) & 1) = 1 THEN 255 - y ELSE y END
                     ELSE x END,
                     CASE WHEN ((y >> i) & 1) = 0 THEN
                       CASE WHEN ((x >> i) & 1) = 1 THEN 255 - x ELSE x END
                     ELSE y END,
                     d + (CAST(1 AS BIGINT) << (2 * i))
                         * (3 * ((x >> i) & 1) + ((y >> i) & 1)
                            - 2 * ((x >> i) & 1) * ((y >> i) & 1))
              FROM it WHERE i >= 0
            )
            SELECT doc_id, span_offset, ix0 AS ix, iy0 AS iy, d AS hd
            FROM it WHERE i = -1
        """,
        "active_time": """
            WITH sp AS (
              SELECT user_id, epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
              FROM events
              GROUP BY user_id, (epoch_us(ts) // 1000000) // 3600
            ),
            edges AS (
              SELECT user_id AS k, s AS t, 1 AS d FROM sp
              UNION ALL SELECT user_id, e, -1 FROM sp
            ),
            seg AS (
              SELECT k, t, d,
                     sum(d) OVER (PARTITION BY k ORDER BY t, d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                     lead(t) OVER (PARTITION BY k ORDER BY t, d) AS nt
              FROM edges
            )
            SELECT k AS user_id,
                   CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals,
                   CAST(coalesce(sum(CASE WHEN ca > 0 AND nt IS NOT NULL
                                     THEN nt - t END), 0) AS BIGINT) AS active_us
            FROM seg GROUP BY k
        """,
        "majority": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            sp AS (
              SELECT CAST(g.ix + kx.v AS INT) AS ix, CAST(g.iy + ky.v AS INT) AS iy, g.cnt
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              WHERE g.ix + kx.v >= 0 AND g.ix + kx.v < 72
                AND g.iy + ky.v >= 0 AND g.iy + ky.v < 34
            ),
            pv AS (
              SELECT ix, iy, cnt, CAST(count(*) AS BIGINT) AS m FROM sp GROUP BY 1, 2, 3
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY ix, iy
                ORDER BY m DESC, cnt ASC) AS rn
              FROM pv
            )
            SELECT ix, iy, cnt AS mode_cnt, m AS mode_n FROM r WHERE rn = 1
        """,
        "boilerplate": """
            WITH tok AS (
              SELECT doc_id, i.i AS pos, string_split(text, ' ')[i.i + 1] AS w
              FROM documents
              CROSS JOIN LATERAL unnest(generate_series(0,
                len(string_split(text, ' ')) - 1)) AS i(i)
            ),
            nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
            dfq AS (
              SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfq FROM tok GROUP BY 1
            ),
            freq AS (
              SELECT w FROM dfq CROSS JOIN nd
              WHERE CAST(dfq AS DOUBLE) / CAST(n AS DOUBLE) > 0.5e0
            ),
            kept AS (SELECT * FROM tok WHERE w NOT IN (SELECT w FROM freq)),
            reb AS (
              SELECT doc_id, array_to_string(list(w ORDER BY pos), ' ') AS clean_text,
                     CAST(count(*) AS BIGINT) AS nk
              FROM kept GROUP BY 1
            )
            SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
                   CAST(len(string_split(d.text, ' ')) - coalesce(r.nk, 0) AS BIGINT) AS n_removed
            FROM documents d LEFT JOIN reb r USING (doc_id)
        """,
        "focal": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            sp AS (
              SELECT CAST(g.ix + kx.v AS INT) AS ix, CAST(g.iy + ky.v AS INT) AS iy, g.cnt
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              WHERE g.ix + kx.v >= 0 AND g.ix + kx.v < 72
                AND g.iy + ky.v >= 0 AND g.iy + ky.v < 34
            )
            SELECT ix, iy, CAST(min(cnt) AS BIGINT) AS f_min,
                   CAST(max(cnt) AS BIGINT) AS f_max,
                   CAST(sum(cnt) AS BIGINT) AS f_sum,
                   CAST(count(*) AS BIGINT) AS f_n
            FROM sp GROUP BY 1, 2
        """,
        "slope": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            sp AS (
              SELECT CAST(g.ix + kx.v AS INT) AS ix, CAST(g.iy + ky.v AS INT) AS iy,
                     g.cnt, kx.v AS kx, ky.v AS ky
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              WHERE g.ix + kx.v >= 0 AND g.ix + kx.v < 72
                AND g.iy + ky.v >= 0 AND g.iy + ky.v < 34
            ),
            agg AS (
              SELECT ix, iy,
                     CAST(sum(cnt * ((-kx) * (2 - abs(ky)))) AS BIGINT) AS gx8,
                     CAST(sum(cnt * ((-ky) * (2 - abs(kx)))) AS BIGINT) AS gy8
              FROM sp GROUP BY 1, 2
            )
            SELECT ix, iy, gx8, gy8,
                   round(sqrt((CAST(gx8 AS DOUBLE) / 8.0) * (CAST(gx8 AS DOUBLE) / 8.0)
                              + (CAST(gy8 AS DOUBLE) / 8.0) * (CAST(gy8 AS DOUBLE) / 8.0)), 6) AS slope
            FROM agg
        """,
        "topshare": """
            WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
            cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1),
            w AS (
              SELECT c, m,
                     CAST(coalesce(sum(m) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
              FROM cc
            ),
            s AS (
              SELECT CAST(sum(m) AS BIGINT) AS n, CAST(sum(c * m) AS BIGINT) AS t,
                     CAST(sum(c * least(m, greatest(10 - prior, 0))) AS BIGINT) AS tr
              FROM w
            )
            SELECT CAST(10 AS BIGINT) AS k, n AS n_keys, t AS n_rows, tr AS top_rows,
                   round(CAST(tr AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
            FROM s
        """,
        "ann_recall": f"""
            WITH {SQL_COSINE},
            {SQL_LSH},
            exact AS (
              SELECT q_vec_id, vec_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY q_vec_id ORDER BY round(sim, 6) DESC, vec_id ASC) AS rnk
                FROM sims
              ) WHERE rnk <= 5
            ),
            approx AS (
              SELECT q_vec_id, vec_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY q_vec_id ORDER BY round(sim, 6) DESC, vec_id ASC) AS rnk
                FROM lsims
              ) WHERE rnk <= 5
            ),
            per AS (
              SELECT e.q_vec_id, CAST(count(*) AS BIGINT) AS n_exact,
                     CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
              FROM exact e LEFT JOIN approx a
                ON a.q_vec_id = e.q_vec_id AND a.vec_id = e.vec_id
              GROUP BY 1
            )
            SELECT q_vec_id, n_exact, n_hit,
                   round(CAST(n_hit AS DOUBLE) / n_exact, 6) AS recall
            FROM per
        """,
        "sliding": """
            WITH e AS (SELECT epoch_us(ts) AS t FROM events),
            w AS (
              SELECT k.k * 900000000 AS ws_us, k.k * 900000000 + 3600000000 AS we_us
              FROM e
              CROSS JOIN LATERAL unnest(generate_series(
                (t - 3600000000) // 900000000 + 1,
                t // 900000000)) AS k(k)
            )
            SELECT ws_us, we_us, CAST(count(*) AS BIGINT) AS n
            FROM w GROUP BY 1, 2
        """,
        "abtest": """
            WITH agg AS (
              SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                     CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                     CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                     CAST(sum(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS s2
              FROM events
            )
            SELECT n1, s1, n2, s2,
                   round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p1,
                   round(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS p2,
                   round(CASE WHEN n1 > 0 AND n2 > 0 AND
                       sqrt(((CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                            * (1.0e0 - (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                            * (1.0e0 / CAST(n1 AS DOUBLE) + 1.0e0 / CAST(n2 AS DOUBLE))) > 0.0e0
                     THEN (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                          / sqrt(((CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                                 * (1.0e0 - (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                                 * (1.0e0 / CAST(n1 AS DOUBLE) + 1.0e0 / CAST(n2 AS DOUBLE)))
                   END, 6) AS z
            FROM agg
        """,
        "trend": """
            WITH b AS (SELECT (epoch_us(ts) // 1000000) // 3600 AS bin FROM events),
            cnt AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
            bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM cnt),
            dense AS (
              SELECT bounds.lo, t.b AS bin FROM bounds
              CROSS JOIN LATERAL unnest(generate_series(lo, hi)) AS t(b)
            ),
            filled AS (
              SELECT d.bin - d.lo AS x, CAST(coalesce(c.c, 0) AS BIGINT) AS y
              FROM dense d LEFT JOIN cnt c ON d.bin = c.bin
            ),
            s AS (
              SELECT count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM filled
            )
            SELECT n AS n_bins,
                   round(CASE WHEN n > 1 THEN
                     (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) END, 6) AS slope,
                   round(CASE WHEN n > 1 THEN
                     (CAST(sy AS DOUBLE)
                      - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
                     / CAST(n AS DOUBLE) END, 6) AS intercept,
                   round(CASE WHEN n > 1 AND
                       CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0.0e0 THEN
                     (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) END, 6) AS r2
            FROM s
        """,
        "gaps": """
            WITH e AS (
              SELECT user_id AS key, epoch_us(ts) AS t FROM events
            ),
            g AS (
              SELECT key, t - lag(t) OVER (PARTITION BY key ORDER BY t) AS gap
              FROM e
            )
            SELECT key, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(min(gap) AS BIGINT) AS min_gap_us,
                   CAST(max(gap) AS BIGINT) AS max_gap_us,
                   CAST(round(CAST(sum(gap) AS DOUBLE) / count(*), 0) AS BIGINT) AS mean_gap_us
            FROM g WHERE gap IS NOT NULL
            GROUP BY key
        """,
        "debounce": """
            WITH RECURSIVE e AS (
              SELECT user_id AS k, epoch_us(ts) AS t FROM events
            ),
            seed AS (SELECT k, min(t) AS t FROM e GROUP BY 1),
            keep(k, t) AS (
              SELECT k, t FROM seed
              UNION ALL
              SELECT j.k,
                     (SELECT min(e.t) FROM e
                      WHERE e.k = j.k AND e.t >= j.t + 21600000000)
              FROM keep j
              WHERE EXISTS (SELECT 1 FROM e
                            WHERE e.k = j.k AND e.t >= j.t + 21600000000)
            )
            SELECT k AS user_id, t AS ts_us FROM keep
        """,
        "band": """
            WITH l AS (
              SELECT event_id AS a_id, value AS v_l,
                     CAST(floor(value / 0.05e0) AS BIGINT) AS b
              FROM events WHERE event_type = 'purchase'
            ),
            r AS (
              SELECT event_id AS b_id, value AS v_r,
                     CAST(floor(value / 0.05e0) AS BIGINT) + d.d AS b
              FROM events CROSS JOIN (VALUES (-1), (0), (1)) AS d(d)
              WHERE event_type = 'error'
            )
            SELECT a_id, b_id, v_l, v_r, round(abs(v_l - v_r), 6) AS diff
            FROM l JOIN r USING (b)
            WHERE abs(v_l - v_r) <= 0.05e0
        """,
        "embed_cov": """
            WITH e AS (SELECT embedding AS v FROM embeddings),
            a AS (
              SELECT v, i.i AS i, CAST(v[i.i + 1] AS DOUBLE) AS xi
              FROM e CROSS JOIN LATERAL unnest(generate_series(0, len(v) - 1)) AS i(i)
            ),
            p AS (
              SELECT i, j.j AS j, xi, CAST(v[j.j + 1] AS DOUBLE) AS xj
              FROM a CROSS JOIN LATERAL unnest(generate_series(i, len(v) - 1)) AS j(j)
            ),
            s2 AS (
              SELECT i, j, CAST(count(*) AS BIGINT) AS n,
                     sum(CAST(xi * xj AS DECIMAL(30,12))) AS sxy
              FROM p GROUP BY 1, 2
            ),
            s1 AS (
              SELECT i, sum(CAST(xi AS DECIMAL(30,12))) AS s FROM a GROUP BY 1
            )
            SELECT s2.i, s2.j, s2.n,
                   round(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(si.s AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(sj.s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cov
            FROM s2 JOIN s1 si ON si.i = s2.i JOIN s1 sj ON sj.i = s2.j
        """,
        "anti_join": f"""
            WITH {SQL_PTS}, {SQL_RECTS}
            SELECT p.doc_id, p.span_offset, p.lon, p.lat
            FROM pts p
            WHERE NOT EXISTS (
              SELECT 1 FROM rects_env e
              WHERE p.lon >= e.min_lon AND p.lon <= e.max_lon
                AND p.lat >= e.min_lat AND p.lat <= e.max_lat
            )
        """,
        "allen": f"""
            WITH c AS (
              SELECT user_id, epoch_us(min(ts)) AS ls, epoch_us(max(ts)) AS le
              FROM events WHERE event_type = 'click' GROUP BY 1
            ),
            v AS (
              SELECT user_id, epoch_us(min(ts)) AS rs, epoch_us(max(ts)) AS re
              FROM events WHERE event_type = 'view' GROUP BY 1
            )
            SELECT c.user_id, ls, le, rs, re,
                   CASE {_allen_case_sql()} END AS relation
            FROM c JOIN v USING (user_id)
        """,
        "dissolve": f"""
            WITH RECURSIVE {SQL_RECTS},
            cell AS (
              SELECT rect_id, min_lon, min_lat, max_lon, max_lat, cx.v AS cx, cy.v AS cy
              FROM rects_env
              CROSS JOIN LATERAL unnest(generate_series(
                CAST(floor(min_lon / 5.0) AS BIGINT),
                CAST(floor(max_lon / 5.0) AS BIGINT))) AS cx(v)
              CROSS JOIN LATERAL unnest(generate_series(
                CAST(floor(min_lat / 5.0) AS BIGINT),
                CAST(floor(max_lat / 5.0) AS BIGINT))) AS cy(v)
            ),
            prs AS (
              SELECT DISTINCT a.rect_id AS s, b.rect_id AS d
              FROM cell a JOIN cell b
                ON a.cx = b.cx AND a.cy = b.cy AND a.rect_id < b.rect_id
              WHERE a.min_lon <= b.max_lon AND b.min_lon <= a.max_lon
                AND a.min_lat <= b.max_lat AND b.min_lat <= a.max_lat
            ),
            edges AS (SELECT s, d FROM prs UNION SELECT d, s FROM prs),
            reach (node, lbl) AS (
              SELECT s, s FROM edges
              UNION
              SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node
            ),
            lab AS (SELECT node, min(lbl) AS label FROM reach GROUP BY node),
            alln AS (
              SELECT coalesce(l.label, r.rect_id) AS cluster,
                     r.min_lon, r.min_lat, r.max_lon, r.max_lat
              FROM rects_env r LEFT JOIN lab l ON l.node = r.rect_id
            )
            SELECT cluster, CAST(count(*) AS BIGINT) AS n_rects,
                   min(min_lon) AS min_lon, min(min_lat) AS min_lat,
                   max(max_lon) AS max_lon, max(max_lat) AS max_lat
            FROM alln GROUP BY cluster
        """,
        "contour": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            roles AS (
              SELECT g.ix - r.ox AS qx, g.iy - r.oy AS qy, r.role, g.cnt
              FROM grid g
              CROSS JOIN (VALUES (0,0,0),(1,1,0),(2,1,1),(3,0,1)) AS r(role, ox, oy)
            ),
            quads AS (
              SELECT qx, qy,
                     CAST(coalesce(sum(CASE WHEN role = 0 THEN cnt END), 0) AS BIGINT) AS va,
                     CAST(coalesce(sum(CASE WHEN role = 1 THEN cnt END), 0) AS BIGINT) AS vb,
                     CAST(coalesce(sum(CASE WHEN role = 2 THEN cnt END), 0) AS BIGINT) AS vc,
                     CAST(coalesce(sum(CASE WHEN role = 3 THEN cnt END), 0) AS BIGINT) AS vd
              FROM roles GROUP BY 1, 2
            ),
            q AS (
              SELECT *,
                     (CASE WHEN va >= 9 THEN 1 ELSE 0 END
                      + CASE WHEN vb >= 9 THEN 2 ELSE 0 END
                      + CASE WHEN vc >= 9 THEN 4 ELSE 0 END
                      + CASE WHEN vd >= 9 THEN 8 ELSE 0 END) AS idx,
                     (va + vb + vc + vd) >= 36 AS cin
              FROM quads
            ),
            m(idx, seg, cc, e1, e2) AS (VALUES {_contour_cases_sql()}),
            j AS (
              SELECT q.qx, q.qy, q.va, q.vb, q.vc, q.vd, m.seg, m.e1, m.e2
              FROM q JOIN m ON m.idx = q.idx
              WHERE q.idx > 0 AND q.idx < 15
                AND (m.cc = 0 OR (m.cc = 1 AND q.cin) OR (m.cc = -1 AND NOT q.cin))
            )
            SELECT qx, qy, seg,
                   round(-180.0 + (({_contour_edge_sql('x', 'e1')}) + 0.5) * 5.0, 6) AS x1,
                   round(-85.0 + (({_contour_edge_sql('y', 'e1')}) + 0.5) * 5.0, 6) AS y1,
                   round(-180.0 + (({_contour_edge_sql('x', 'e2')}) + 0.5) * 5.0, 6) AS x2,
                   round(-85.0 + (({_contour_edge_sql('y', 'e2')}) + 0.5) * 5.0, 6) AS y2
            FROM j
        """,
        "chi2": """
            WITH cells AS (
              SELECT event_type AS a, isodow(ts) - 1 AS b, CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM cells GROUP BY 1),
            cb AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM cells GROUP BY 1),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS nn,
                     CAST(count(DISTINCT a) AS BIGINT) AS r_cats,
                     CAST(count(DISTINCT b) AS BIGINT) AS c_cats
              FROM cells
            ),
            terms AS (
              SELECT nn, r_cats, c_cats, n,
                     CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(nn AS DOUBLE) AS e
              FROM cells JOIN ra USING(a) JOIN cb USING(b) CROSS JOIN tot
            ),
            s AS (
              SELECT nn, r_cats, c_cats,
                     sum(CAST(round((CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e) / e
                                    - e, 6) AS DECIMAL(30,6))) AS acc
              FROM terms GROUP BY 1, 2, 3
            )
            SELECT nn AS n_obs, r_cats, c_cats,
                   (r_cats - 1) * (c_cats - 1) AS dof,
                   round(CAST(acc + CAST(nn AS DECIMAL(30,6)) AS DOUBLE), 6) AS chi2,
                   round(CASE WHEN least(r_cats - 1, c_cats - 1) > 0 THEN
                     sqrt(CAST(acc + CAST(nn AS DECIMAL(30,6)) AS DOUBLE)
                          / (CAST(nn AS DOUBLE) * CAST(least(r_cats - 1, c_cats - 1) AS DOUBLE)))
                   END, 6) AS cramers_v
            FROM s
        """,
        "gini": """
            WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
            cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1),
            w AS (
              SELECT c, m,
                     CAST(coalesce(sum(m) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS r
              FROM cc
            ),
            s AS (
              SELECT CAST(sum(m) AS BIGINT) AS n, CAST(sum(c * m) AS BIGINT) AS t,
                     CAST(sum(c * (m * r + m * (m + 1) // 2)) AS BIGINT) AS a
              FROM w
            )
            SELECT n AS n_keys, t AS n_rows,
                   round(CAST(2 * a AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
                         - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
            FROM s
        """,
        "local_moran": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS DOUBLE) AS x
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            wsum AS (
              SELECT CAST(g.ix + kx.v AS INT) AS tx, CAST(g.iy + ky.v AS INT) AS ty,
                     sum(g.x) AS sw
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              GROUP BY 1, 2
            ),
            tot AS (SELECT sum(x) AS t, sum(x * x) AS q FROM grid)
            SELECT g.ix, g.iy, CAST(g.x AS BIGINT) AS cnt,
                   round((g.x - tot.t / 2448.0)
                         / (tot.q / 2448.0 - (tot.t / 2448.0) * (tot.t / 2448.0))
                         * ((w.sw - g.x)
                            - (CAST((least(g.ix + 1, 71) - greatest(g.ix - 1, 0) + 1)
                                  * (least(g.iy + 1, 33) - greatest(g.iy - 1, 0) + 1) AS DOUBLE)
                               - 1.0) * (tot.t / 2448.0)), 6) AS moran_i
            FROM grid g
            JOIN wsum w ON g.ix = w.tx AND g.iy = w.ty
            CROSS JOIN tot
        """,
        "gi_star": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS ix,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS iy,
                     CAST(count(*) AS DOUBLE) AS x
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            wsum AS (
              SELECT CAST(g.ix + kx.v AS INT) AS tx, CAST(g.iy + ky.v AS INT) AS ty,
                     sum(g.x) AS sw
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS v) ky
              GROUP BY 1, 2
            ),
            tot AS (SELECT sum(x) AS t, sum(x * x) AS q FROM grid)
            SELECT g.ix, g.iy, CAST(g.x AS BIGINT) AS cnt,
                   round((w.sw - (tot.t / 2448.0)
                            * CAST((least(g.ix + 1, 71) - greatest(g.ix - 1, 0) + 1)
                                 * (least(g.iy + 1, 33) - greatest(g.iy - 1, 0) + 1) AS DOUBLE))
                         / (sqrt(tot.q / 2448.0 - (tot.t / 2448.0) * (tot.t / 2448.0))
                            * sqrt((2448.0 * CAST((least(g.ix + 1, 71) - greatest(g.ix - 1, 0) + 1)
                                                * (least(g.iy + 1, 33) - greatest(g.iy - 1, 0) + 1) AS DOUBLE)
                                    - CAST((least(g.ix + 1, 71) - greatest(g.ix - 1, 0) + 1)
                                         * (least(g.iy + 1, 33) - greatest(g.iy - 1, 0) + 1) AS DOUBLE)
                                      * CAST((least(g.ix + 1, 71) - greatest(g.ix - 1, 0) + 1)
                                           * (least(g.iy + 1, 33) - greatest(g.iy - 1, 0) + 1) AS DOUBLE))
                                   / (2448.0 - 1.0))), 6) AS gi
            FROM grid g
            JOIN wsum w ON g.ix = w.tx AND g.iy = w.ty
            CROSS JOIN tot
        """,
        "winsorize": """
            WITH b AS (
              SELECT event_type,
                     round(quantile_cont(value, 0.05), 6) AS lo,
                     round(quantile_cont(value, 0.95), 6) AS hi
              FROM events GROUP BY event_type
            )
            SELECT e.event_id, e.event_type, e.value,
                   greatest(b.lo, least(b.hi, e.value)) AS value_w
            FROM events e JOIN b USING (event_type)
        """,
        "zscore_outliers": """
            WITH m AS (
              SELECT event_type, count(*) AS n,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
                     CAST(sum(CAST(value AS DECIMAL(18,2))
                            * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ssq
              FROM events GROUP BY event_type
            )
            SELECT e.event_id, e.event_type, e.value,
                   round((e.value - sv / n)
                         / sqrt(ssq / n - (sv / n) * (sv / n)), 6) AS z
            FROM events e JOIN m USING (event_type)
            WHERE sqrt(ssq / n - (sv / n) * (sv / n)) > 0
              AND abs((e.value - sv / n)
                      / sqrt(ssq / n - (sv / n) * (sv / n))) > 2.0
        """,
        "date_offset": """
            SELECT event_id,
                   epoch_us(ts + INTERVAL 7 DAY) AS ts_shifted_us
            FROM events
        """,
        "idw": f"""
            WITH {SQL_PTS},
            grid AS (
              SELECT CAST(floor((lon - (-180.0)) / 5.0) AS INT) AS sx,
                     CAST(floor((lat - (-85.0)) / 5.0) AS INT) AS sy,
                     CAST(sum(CAST(span_offset AS DOUBLE)) AS DOUBLE) AS sv,
                     count(*) AS n
              FROM pts
              WHERE lon >= -180.0 AND lon < 180.0 AND lat >= -85.0 AND lat < 85.0
              GROUP BY 1, 2
            ),
            contrib AS (
              SELECT CAST(g.sx + kx.v AS INT) AS ix, CAST(g.sy + ky.v AS INT) AS iy,
                     CAST(kx.v * kx.v + ky.v * ky.v AS INT) AS d2,
                     g.sx, g.sy, g.sv, g.n
              FROM grid g
              CROSS JOIN (SELECT unnest(generate_series(-2, 2)) AS v) kx
              CROSS JOIN (SELECT unnest(generate_series(-2, 2)) AS v) ky
              WHERE g.sx + kx.v >= 0 AND g.sx + kx.v < 72
                AND g.sy + ky.v >= 0 AND g.sy + ky.v < 34
            ),
            agg AS (
              SELECT ix, iy, CAST(count(*) AS INT) AS n_cells,
                     max(CASE WHEN d2 = 0 THEN sv / CAST(n AS DOUBLE) END) AS zeroval,
                     -- sequential fold in (d2, sx, sy) order, matching
                     -- Spark's sort_array + aggregate (a plain SUM
                     -- would be order-dependent in the last ulp)
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list(sv / CAST(d2 AS DOUBLE) ORDER BY d2, sx, sy)
                         FILTER (WHERE d2 > 0)),
                       (a, x) -> a + x) AS num,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list(CAST(n AS DOUBLE) / CAST(d2 AS DOUBLE) ORDER BY d2, sx, sy)
                         FILTER (WHERE d2 > 0)),
                       (a, x) -> a + x) AS den
              FROM contrib GROUP BY ix, iy
            )
            SELECT ix, iy, n_cells,
                   round(CASE WHEN zeroval IS NOT NULL THEN zeroval
                              ELSE num / den END, 6) AS idw
            FROM agg
        """,
        "quantiles": """
            SELECT event_type, count(*) AS n,
                   round(quantile_cont(value, 0.25), 6) AS q25,
                   round(quantile_cont(value, 0.50), 6) AS q50,
                   round(quantile_cont(value, 0.90), 6) AS q90
            FROM events GROUP BY event_type
        """,
        "convex_hull": """
            WITH c AS (
              SELECT printf('name%d', t.i % 10) AS track,
                     CAST((t.i % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                     CAST((CAST(floor(t.i / 360.0) AS BIGINT) % 170) - 85 + 0.5 AS DOUBLE) AS lat
              FROM range(0, 1800) t(i)
            ),
            e AS (
              SELECT track, count(*) AS n_points,
                     min(lon) AS mnx, min(lat) AS mny,
                     max(lon) AS mxx, max(lat) AS mxy
              FROM c GROUP BY track
            )
            -- each track is a COMPLETE 36x5 lattice, so the hull is
            -- exactly the 4 corners, CCW from the lexicographic min
            SELECT track, n_points,
                   'POLYGON ((' || printf('%.6f %.6f', mnx, mny) || ', '
                                || printf('%.6f %.6f', mxx, mny) || ', '
                                || printf('%.6f %.6f', mxx, mxy) || ', '
                                || printf('%.6f %.6f', mnx, mxy) || ', '
                                || printf('%.6f %.6f', mnx, mny) || '))' AS hull_wkt
            FROM e
        """,
        "pq_codes": """
            WITH cbsrc AS (
              SELECT e.vec_id AS code, b.b AS block,
                     list_transform(generate_series(1, 8),
                       i -> CAST(e.embedding[b.b * 8 + i] AS DOUBLE)) AS cent
              FROM embeddings e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) b(b)
              WHERE e.vec_id < 16
            ),
            subs AS (
              SELECT e.vec_id, b.b AS block,
                     list_transform(generate_series(1, 8),
                       i -> CAST(e.embedding[b.b * 8 + i] AS DOUBLE)) AS sub
              FROM embeddings e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) b(b)
            ),
            dists AS (
              SELECT s.vec_id, s.block, c.code,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(generate_series(1, 8),
                         i -> (s.sub[i] - c.cent[i]) * (s.sub[i] - c.cent[i]))),
                       (a, x) -> a + x) AS dist
              FROM subs s JOIN cbsrc c ON s.block = c.block
            ),
            enc AS (
              SELECT vec_id, block, code FROM (
                SELECT vec_id, block, code,
                       row_number() OVER (PARTITION BY vec_id, block
                                          ORDER BY dist ASC, code ASC) AS rn
                FROM dists
              ) WHERE rn = 1
            )
            SELECT vec_id, CAST(block AS INT) AS block, CAST(code AS INT) AS code
            FROM enc
        """,
        "pq_adc": """
            WITH cbsrc AS (
              SELECT e.vec_id AS code, b.b AS block,
                     list_transform(generate_series(1, 8),
                       i -> CAST(e.embedding[b.b * 8 + i] AS DOUBLE)) AS cent
              FROM embeddings e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) b(b)
              WHERE e.vec_id < 16
            ),
            subs AS (
              SELECT e.vec_id, b.b AS block,
                     list_transform(generate_series(1, 8),
                       i -> CAST(e.embedding[b.b * 8 + i] AS DOUBLE)) AS sub
              FROM embeddings e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) b(b)
            ),
            dists AS (
              SELECT s.vec_id, s.block, c.code,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(generate_series(1, 8),
                         i -> (s.sub[i] - c.cent[i]) * (s.sub[i] - c.cent[i]))),
                       (a, x) -> a + x) AS dist
              FROM subs s JOIN cbsrc c ON s.block = c.block
            ),
            enc AS (
              SELECT vec_id, block, code FROM (
                SELECT vec_id, block, code,
                       row_number() OVER (PARTITION BY vec_id, block
                                          ORDER BY dist ASC, code ASC) AS rn
                FROM dists
              ) WHERE rn = 1
            ),
            terms AS (
              SELECT q.vec_id AS q_vec_id, e.vec_id, e.block,
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(generate_series(1, 8),
                         i -> (CAST(q.embedding[e.block * 8 + i] AS DOUBLE) - c.cent[i])
                            * (CAST(q.embedding[e.block * 8 + i] AS DOUBLE) - c.cent[i]))),
                       (a, x) -> a + x) AS term
              FROM enc e
              JOIN cbsrc c ON c.block = e.block AND c.code = e.code
              CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q
              WHERE e.vec_id <> q.vec_id
            ),
            adc AS (
              -- sequential fold in BLOCK ORDER, matching Spark's
              -- aggregate over the block sequence (a plain SUM would be
              -- order-dependent in the last ulp)
              SELECT q_vec_id, vec_id,
                     round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list(term ORDER BY block)), (a, x) -> a + x), 6) AS adc_r
              FROM terms GROUP BY q_vec_id, vec_id
            )
            SELECT q_vec_id, vec_id, adc_r, CAST(rnk AS INT) AS rank FROM (
              SELECT *, row_number() OVER (PARTITION BY q_vec_id
                        ORDER BY adc_r ASC, vec_id ASC) AS rnk
              FROM adc
            ) WHERE rnk <= 5
        """,
        "sq_codes": """
            WITH d AS (
              SELECT e.vec_id, u.i AS pos, CAST(e.embedding[u.i] AS DOUBLE) AS x
              FROM embeddings e
              CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) u(i)
              WHERE u.i <= len(e.embedding)
            ),
            st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM d GROUP BY pos)
            SELECT d.vec_id, CAST(d.pos - 1 AS INT) AS pos,
                   CAST(CASE WHEN st.mx > st.mn
                        THEN least(greatest(floor((d.x - st.mn) / (st.mx - st.mn) * 255.0), 0), 255)
                        ELSE 0 END AS INT) AS code
            FROM d JOIN st USING (pos)
        """,
        "bucketed_restore": """
            WITH agg AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, max(value) AS max_value
              FROM events WHERE user_id IS NOT NULL GROUP BY user_id
            )
            SELECT e.event_id, e.user_id, e.value, a.n_events, a.max_value
            FROM events e JOIN agg a USING (user_id)
            WHERE e.user_id IS NOT NULL
        """,
    }
