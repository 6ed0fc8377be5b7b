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
