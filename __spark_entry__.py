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
    pts = with_z2_cell(_points(spark, sf_dir))
    pred = z2_range_predicate([(x0, y0, x1, y1)]) & bbox_predicate((x0, y0, x1, y1))
    return pts.where(pred).select("doc_id", "span_offset", "lon", "lat")


def q_z2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z2 index-key encoding (reference Z2SFC.index) as a column."""
    from geomesa_spark.operators.extract import with_z2_cell

    return with_z2_cell(_points(spark, sf_dir)).select(
        "doc_id", "span_offset", "cell_z2"
    )


def _polys(spark: SparkSession, oracle_kinds_only: bool) -> DataFrame:
    from geomesa_spark.tables import poly_layers

    p = poly_layers(spark, N_POLYS)
    if oracle_kinds_only:
        p = p.where(F.col("kind") != "convex")
    return p


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 spatial join (broadcast, two-phase) vs bbox+holed polygons."""
    from geomesa_spark.operators.joins import spatial_join_points_in_polys

    j = spatial_join_points_in_polys(
        _points(spark, sf_dir), _polys(spark, True), bits=6, broadcast=True
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


def q_pip_join_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 over all polygon kinds incl. convex hexagons (PIP kernel path;
    hexagon refinement is oracle'd by the NumPy brute force in pytest)."""
    from geomesa_spark.operators.joins import spatial_join_points_in_polys

    j = spatial_join_points_in_polys(
        _points(spark, sf_dir), _polys(spark, False), bits=6, broadcast=True
    )
    return j.select("doc_id", "span_offset", "poly_id")


def q_dwithin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/P5 proximity (DWITHIN) join against probe circles."""
    from geomesa_spark.operators.joins import distance_join
    from geomesa_spark.tables import query_points

    j = distance_join(_points(spark, sf_dir), query_points(spark, N_PROBES), bits=6)
    return j.select("q_id", "doc_id", "span_offset")


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 kNN via ring expansion + exact haversine re-rank."""
    from geomesa_spark.operators.knn import knn
    from geomesa_spark.tables import query_points

    probes = query_points(spark, N_KNN_PROBES).drop("radius_m")
    r = knn(_points(spark, sf_dir), probes, bits=6)
    return r.select("q_id", "doc_id", "span_offset", F.col("rank").cast("int").alias("rank"))


def q_density_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 DensityScan: 72×34 heatmap over the full domain."""
    from geomesa_spark.operators.tiles import density_grid

    return density_grid(_points(spark, sf_dir), (-180.0, -85.0, 180.0, 85.0), 72, 34)


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiling: fixed-resolution tile id per point (bits=8 grid)."""
    from geomesa_spark.operators.extract import grid_cell

    return _points(spark, sf_dir).select(
        "doc_id", "span_offset",
        grid_cell(F.col("lon"), F.col("lat"), 8).alias("tile_id"),
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
# Contract functions
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
    return {
        "extract_points": q_extract_points,
        "bbox_filter": q_bbox_filter,
        "z2_cells": q_z2_cells,
        "pip_join": q_pip_join,
        "pip_join_salted": q_pip_join_salted,
        "pip_join_all": q_pip_join_all,
        "dwithin_join": q_dwithin_join,
        "knn": q_knn,
        "density_grid": q_density_grid,
        "tile_assign": q_tile_assign,
        "span_invariant": q_span_invariant,
    }


def oracle_sql() -> dict[str, str]:
    hav = _sql_haversine("p.lon", "p.lat", "q.lon", "q.lat")
    return {
        "extract_points": f"WITH {SQL_PTS} SELECT doc_id, span_offset, lon, lat FROM pts",
        "bbox_filter": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset, lon, lat FROM pts
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]} AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
        """,
        "z2_cells": f"""
            WITH {SQL_PTS}, {SQL_Z2}
            SELECT doc_id, span_offset, {SQL_MORTON} AS cell_z2 FROM cells
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
        "dwithin_join": f"""
            WITH {SQL_PTS}, {_sql_probes(N_PROBES)}
            SELECT q.q_id, p.doc_id, p.span_offset
            FROM pts p CROSS JOIN probes q
            WHERE {hav} <= q.radius_m
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
        "tile_assign": f"""
            WITH {SQL_PTS}
            SELECT doc_id, span_offset,
                   least(CAST(floor((lat - (-90.0)) / 180.0 * 256) AS BIGINT), 255) * 256
                   + least(CAST(floor((lon - (-180.0)) / 360.0 * 256) AS BIGINT), 255) AS tile_id
            FROM pts
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
    }
