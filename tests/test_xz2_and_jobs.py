"""XZ2 extended-geometry layer pruning + checkpoint-resume job tests."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.extract import with_xz2_cell
from geomesa_spark.plans.planner import xz2_range_predicate
from geomesa_spark.tables import poly_layers


class TestXz2Layer:
    def test_pruning_is_lossless_and_selective(self, spark):
        """xz2_range_predicate must keep every polygon whose bbox
        intersects the query (no false negatives) and prune a
        meaningful share of the rest."""
        polys = with_xz2_cell(poly_layers(spark, 500)).cache()
        qx0, qy0, qx1, qy1 = -40.0, -20.0, -10.0, 10.0

        cand = polys.where(xz2_range_predicate([(qx0, qy0, qx1, qy1)])).toPandas()
        exact = polys.where(
            (F.col("min_lon") <= qx1) & (F.col("max_lon") >= qx0)
            & (F.col("min_lat") <= qy1) & (F.col("max_lat") >= qy0)
        ).toPandas()

        assert set(exact.poly_id) <= set(cand.poly_id)  # lossless
        total = polys.count()
        assert len(cand) < total  # actually prunes
        # refine closes the gap exactly
        refined = cand[
            (cand.min_lon <= qx1) & (cand.max_lon >= qx0)
            & (cand.min_lat <= qy1) & (cand.max_lat >= qy0)
        ]
        assert set(refined.poly_id) == set(exact.poly_id)

    def test_one_key_per_geometry(self, spark):
        polys = with_xz2_cell(poly_layers(spark, 100))
        assert polys.count() == 100  # no explode/duplication
        assert polys.where(F.col("cell_xz2").isNull()).count() == 0

    def test_xz3_spatiotemporal_pruning(self, spark):
        from geomesa_spark.operators.extract import with_xz3_cell
        from geomesa_spark.plans.planner import xz3_range_predicate

        polys = poly_layers(spark, 300).withColumn(
            "dtg",
            F.expr("timestampadd(DAY, cast(substring(poly_id, 6, 6) as int), timestamp'2024-01-01')"),
        )
        keyed = with_xz3_cell(polys).cache()
        qx = (-40.0, -20.0, -10.0, 10.0)
        t_lo = 1704067200000  # 2024-01-01
        t_hi = t_lo + 50 * 86400_000  # +50 days
        cand = keyed.where(xz3_range_predicate([qx], t_lo, t_hi)).toPandas()
        exact = keyed.where(
            (F.col("min_lon") <= qx[2]) & (F.col("max_lon") >= qx[0])
            & (F.col("min_lat") <= qx[3]) & (F.col("max_lat") >= qx[1])
            & (F.unix_timestamp("dtg") * 1000).between(t_lo, t_hi)
        ).toPandas()
        assert set(exact.poly_id) <= set(cand.poly_id)  # lossless
        assert len(cand) < keyed.count()  # prunes space AND time
        refined = cand[
            (cand.min_lon <= qx[2]) & (cand.max_lon >= qx[0])
            & (cand.min_lat <= qx[3]) & (cand.max_lat >= qx[1])
        ]
        # time bins at week granularity over-cover ≤ one period each side
        assert set(exact.poly_id) <= set(refined.poly_id)


class TestHotSkew:
    def test_salted_join_correct_under_extreme_skew(self, spark):
        """ALL points in one grid cell (the pathological hot tile): the
        salted shuffle join must produce exactly the broadcast join's
        rows, and the salt must actually spread the hot cell."""
        from geomesa_spark.operators.extract import grid_cell
        from geomesa_spark.operators.joins import spatial_join_points_in_polys

        n = 20_000
        pts = spark.range(n).select(
            F.format_string("doc-%012d", F.col("id")).alias("doc_id"),
            F.lit(0).alias("span_offset"),
            (F.lit(10.0) + (F.col("id") % 100) / 1000.0).alias("lon"),
            (F.lit(10.0) + ((F.col("id") * 7) % 100) / 1000.0).alias("lat"),
        )
        polys = spark.createDataFrame(
            [("p0", "bbox", "POLYGON ((10 10, 10.05 10, 10.05 10.05, 10 10.05, 10 10))",
              10.0, 10.0, 10.05, 10.05),
             ("p1", "bbox", "POLYGON ((9 9, 12 9, 12 12, 9 12, 9 9))", 9.0, 9.0, 12.0, 12.0)],
            "poly_id string, kind string, wkt string, min_lon double, min_lat double, "
            "max_lon double, max_lat double",
        )
        # every point lands in ONE cell at bits=6
        cells = pts.select(grid_cell(F.col("lon"), F.col("lat"), 6).alias("c")).distinct().count()
        assert cells == 1

        b = spatial_join_points_in_polys(pts, polys, bits=6, broadcast=True)
        s = spatial_join_points_in_polys(pts, polys, bits=6, broadcast=False, salt_buckets=8)
        key = ["doc_id", "poly_id"]
        assert b.count() == s.count()
        assert b.select(*key).exceptAll(s.select(*key)).count() == 0
        assert s.select(*key).exceptAll(b.select(*key)).count() == 0


class TestResumableCorpus:
    def _run(self, out, force=False, n_docs=1500):
        from jobs.run_corpus import main

        argv = ["prog", "--out", out, "--n-docs", str(n_docs), "--quota", "200",
                "--n-shards", "4"]
        if force:
            argv.append("--force")
        old = sys.argv
        sys.argv = argv
        try:
            return main()
        finally:
            sys.argv = old

    def test_stages_resume_and_shard_manifest(self, spark, tmp_path):
        from geomesa_spark.sources.catalog import is_complete, latest_manifest

        out = str(tmp_path / "c1")
        assert self._run(out) == 0
        for stage in ("documents", "scored", "dedup", "clean", "sample", "shards"):
            assert is_complete(os.path.join(out, stage)), stage

        sample1 = spark.read.parquet(os.path.join(out, "sample")).toPandas()
        # quota respected per language
        assert sample1.groupby("lang").size().max() <= 200
        # shards manifest: per-shard metrics sum to the sample rows
        m = latest_manifest(os.path.join(out, "shards"))
        assert m["partition_spec"]["n_shards"] == 4
        assert sum(p["rows"] for p in m["partitions"]) == len(sample1)
        assert m["lineage"]["input"].endswith("sample")
        # shard layout: partition dirs exist, positions dense within shard
        sh = spark.read.parquet(os.path.join(out, "shards"))
        agg = sh.groupBy("shard").agg(
            F.count("*").alias("n"), F.max("shard_pos").alias("mx")
        )
        assert all(r.mx == r.n for r in agg.collect())

        # simulate a crash after stage 4: drop sample+shards manifests
        for stage in ("sample", "shards"):
            mdir = os.path.join(out, stage, "_manifest")
            for f in os.listdir(mdir):
                os.remove(os.path.join(mdir, f))
        assert self._run(out) == 0  # resumes: 1-4 skipped, 5-6 rerun
        sample2 = spark.read.parquet(os.path.join(out, "sample")).toPandas()
        assert sorted(sample1["doc_id"]) == sorted(sample2["doc_id"])


class TestResumablePipeline:
    def _run(self, out, force=False, n_docs=2000):
        from jobs.run_pipeline import main

        argv = ["prog", "--out", out, "--n-docs", str(n_docs), "--n-polys", "200"]
        if force:
            argv.append("--force")
        old = sys.argv
        sys.argv = argv
        try:
            return main()
        finally:
            sys.argv = old

    def test_stages_resume_and_reproduce(self, spark, tmp_path):
        from geomesa_spark.sources.catalog import is_complete, latest_manifest

        out = str(tmp_path / "p1")
        assert self._run(out) == 0
        for stage in ("documents", "doc_points", "pairs", "tiles"):
            assert is_complete(os.path.join(out, stage)), stage

        pairs1 = spark.read.parquet(os.path.join(out, "pairs")).toPandas()

        # simulate a crash after stage 2: drop the pairs+tiles manifests
        for stage in ("pairs", "tiles"):
            mdir = os.path.join(out, stage, "_manifest")
            for f in os.listdir(mdir):
                os.remove(os.path.join(mdir, f))

        assert self._run(out) == 0  # resumes: stages 1-2 skipped, 3-4 rerun
        pairs2 = spark.read.parquet(os.path.join(out, "pairs")).toPandas()
        key = ["doc_id", "span_offset", "poly_id"]
        assert sorted(map(tuple, pairs1[key].values.tolist())) == sorted(
            map(tuple, pairs2[key].values.tolist())
        )
        m = latest_manifest(os.path.join(out, "tiles"))
        assert m and m["partition_spec"]["salt_buckets"] == 4
        assert m["lineage"]["pairs"].endswith("pairs")
