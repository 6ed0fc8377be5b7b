"""User-facing facade: one object bundling the engine's surfaces.

The reference's entry point is a GeoTools ``DataStore`` (connect once,
then query/write through it); the Spark-native analogue is one thin
object over a SparkSession that registers the ``st_*`` catalog and
exposes every operator family without hunting through modules:

    from geomesa_spark import GeoMesaSpark
    gm = GeoMesaSpark(spark)
    pts  = gm.load("/data/points")
    hits = gm.sql("SELECT ... JOIN ... ON st_contains(q.wkt, st_point(p.lon, p.lat))")
    gm.join_points_in_polys(pts, polys, strategy="auto")
    gm.write_tiles(joined, "/data/tiles")

Every method delegates to the module-level function it names — the
facade adds no behavior, only discoverability; power users keep the
functional API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["GeoMesaSpark"]


class GeoMesaSpark:
    def __init__(self, spark: SparkSession):
        from geomesa_spark.functions.st import register_st_functions

        self.spark = spark
        register_st_functions(spark)

    # --- IO ---------------------------------------------------------------
    def load(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    def write_tiles(self, df: DataFrame, path: str, **kw) -> dict:
        from geomesa_spark.operators.tiles import write_tiles

        return write_tiles(df, path, **kw)

    def read_tiles(self, path: str, bbox=None, **kw) -> DataFrame:
        from geomesa_spark.operators.tiles import read_tiles

        return read_tiles(self.spark, path, bbox, **kw)

    def analyze(self, path: str, cell_col: str | None = None) -> dict:
        from geomesa_spark.sources.catalog import analyze_table

        return analyze_table(self.spark, path, cell_col=cell_col)

    def write_bucketed(self, df: DataFrame, name: str, **kw) -> None:
        """Persist a layer for shuffle-free repeated joins on its key
        (bucketBy + sortBy, one pre-sorted file per bucket)."""
        from geomesa_spark.sources.bucketed import write_bucketed

        write_bucketed(df, name, **kw)

    def read_bucketed(self, name: str) -> DataFrame:
        from geomesa_spark.sources.bucketed import read_bucketed

        return read_bucketed(self.spark, name)

    # --- SQL surface (spatial rewrite applied) ---------------------------
    def sql(self, query: str, **kw) -> DataFrame:
        from geomesa_spark.plans.sql_rewrite import spatial_sql

        return spatial_sql(self.spark, query, **kw)

    def enable_audit(self, path: str | None = None) -> None:
        """Turn on query-audit logging (reference AuditProvider): one
        JSON line per planned query, to ``path`` or in memory."""
        from geomesa_spark.plans.audit import enable_audit

        enable_audit(path)

    def audit_events(self, path: str | None = None) -> list[dict]:
        from geomesa_spark.plans.audit import read_audit

        return read_audit(path)

    def query(self, df: DataFrame, **kw):
        """Reference Query-object surface: ECQL filter + transforms +
        QueryHints dispatch (density / BIN / stats / sampling)."""
        from geomesa_spark.plans.query import run_query

        return run_query(df, **kw)

    def ecql(self, df: DataFrame, filter_text: str, **kw) -> DataFrame:
        """Filter ``df`` with an ECQL filter string (the reference's
        -q/--cql surface): parse → index split → coarse cell ranges (if
        z2_col/z3_cols point at materialized index columns) → exact
        residual."""
        from geomesa_spark.plans.ecql import plan_ecql

        return plan_ecql(df, filter_text, **kw)

    # --- spatial operators ------------------------------------------------
    def join_points_in_polys(self, points: DataFrame, polys: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.joins import spatial_join_points_in_polys

        return spatial_join_points_in_polys(points, polys, **kw)

    def join_geoms(self, left: DataFrame, right: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.joins import spatial_join_geoms

        return spatial_join_geoms(left, right, **kw)

    def dwithin(self, points: DataFrame, probes: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.joins import distance_join

        return distance_join(points, probes, **kw)

    def knn(self, points: DataFrame, probes: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.knn import knn

        return knn(points, probes, **kw)

    def dwithin_bbox(self, points: DataFrame, boxes: DataFrame, radius_m: float, **kw) -> DataFrame:
        from geomesa_spark.operators.joins import distance_join_bbox

        return distance_join_bbox(points, boxes, radius_m, **kw)

    def tube_select(self, points: DataFrame, tube: DataFrame, radius_m: float,
                    time_window_s: int, **kw) -> DataFrame:
        from geomesa_spark.operators.joins import tube_select

        return tube_select(points, tube, radius_m, time_window_s, **kw)

    def track_lines(self, df: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.tracks import track_lines

        return track_lines(df, **kw)

    def track_segments(self, df: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.tracks import track_segments

        return track_segments(df, **kw)

    def track_label(self, df: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.tracks import track_label

        return track_label(df, **kw)

    def route_search(self, points: DataFrame, route: DataFrame, radius_m: float, **kw) -> DataFrame:
        from geomesa_spark.operators.tracks import route_search

        return route_search(points, route, radius_m, **kw)

    # --- temporal ---------------------------------------------------------
    def asof(self, left: DataFrame, right: DataFrame, keys: list[str], **kw) -> DataFrame:
        from geomesa_spark.operators.temporal import asof_attach

        return asof_attach(left, right, keys, **kw)

    def interval_join(self, events: DataFrame, intervals: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.temporal import interval_join

        return interval_join(events, intervals, **kw)

    def sessionize(self, df: DataFrame, keys: list[str], **kw) -> DataFrame:
        from geomesa_spark.operators.temporal import sessionize

        return sessionize(df, keys, **kw)

    def density(self, points: DataFrame, bbox, width: int, height: int, **kw) -> DataFrame:
        from geomesa_spark.operators.tiles import density_grid

        return density_grid(points, bbox, width, height, **kw)

    def vectorize(self, points: DataFrame, bbox, width: int, height: int, **kw) -> DataFrame:
        from geomesa_spark.operators.tiles import vectorize_density

        return vectorize_density(points, bbox, width, height, **kw)

    def smooth(self, points: DataFrame, bbox, width: int, height: int, **kw) -> DataFrame:
        from geomesa_spark.operators.tiles import smooth_density

        return smooth_density(points, bbox, width, height, **kw)

    # --- stats / dedup / similarity --------------------------------------
    def stats(self, df: DataFrame, spec: str) -> dict:
        from geomesa_spark.operators.stats import run_stats_dsl

        return run_stats_dsl(df, spec)

    def dedup_pairs(self, docs: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.dedup import lsh_candidate_pairs, with_minhash

        sig_kw = {k: kw.pop(k) for k in ("n_hashes", "shingle_k") if k in kw}
        return lsh_candidate_pairs(with_minhash(docs, **sig_kw), **kw)

    def dedup_clusters(self, pairs: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.dedup import dedup_clusters

        return dedup_clusters(pairs, **kw)

    def ann(self, corpus: DataFrame, queries: DataFrame, method: str = "brute", **kw) -> DataFrame:
        from geomesa_spark.operators import ann as A

        fn = {"brute": A.cosine_topk, "lsh": A.lsh_cosine_topk, "ivf": A.ivf_topk}[method]
        return fn(corpus, queries, **kw)

    # --- corpus construction ---------------------------------------------
    def stratified_sample(self, df: DataFrame, strata_cols: list[str], quota: int, **kw) -> DataFrame:
        from geomesa_spark.operators.corpus import stratified_sample

        return stratified_sample(df, strata_cols, quota, **kw)

    def shard(self, df: DataFrame, n_shards: int, **kw) -> DataFrame:
        from geomesa_spark.operators.corpus import shard_assign

        return shard_assign(df, n_shards, **kw)

    def contamination(self, docs: DataFrame, benchmark: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.corpus import contamination

        return contamination(docs, benchmark, **kw)

    def chunk_dedup(self, df: DataFrame, **kw) -> DataFrame:
        from geomesa_spark.operators.corpus import chunk_dedup

        return chunk_dedup(df, **kw)

    # --- writer semantics -------------------------------------------------
    def upsert_init(self, df: DataFrame, path: str, **kw) -> None:
        from geomesa_spark.sources.upsert import init_table

        init_table(df, path, **kw)

    def upsert(self, df: DataFrame, path: str) -> int:
        from geomesa_spark.sources.upsert import append_upserts

        return append_upserts(df, path)

    def delete(self, fids: DataFrame, path: str) -> int:
        from geomesa_spark.sources.upsert import append_deletes

        return append_deletes(fids, path)

    def read_latest(self, path: str) -> DataFrame:
        from geomesa_spark.sources.upsert import read_latest

        return read_latest(self.spark, path)

    def compact(self, path: str) -> dict | None:
        from geomesa_spark.sources.upsert import compact

        return compact(self.spark, path)

    def read_asof(self, path: str, seq: int) -> DataFrame:
        from geomesa_spark.sources.upsert import read_asof

        return read_asof(self.spark, path, seq)
