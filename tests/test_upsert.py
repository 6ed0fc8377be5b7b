"""S7 upsert/delete writer: merge-on-read view, bucket-scoped
compaction, and crash/replay idempotency (reference semantics:
GeoMesaFeatureWriter modify/remove-by-fid)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources import upsert as U


def _base_df(spark, n=400):
    return spark.range(0, n).select(
        F.format_string("f-%05d", F.col("id")).alias("__fid__"),
        (F.col("id") % 100).cast("int").alias("age"),
        F.format_string("name%d", F.col("id") % 10).alias("name"),
    )


def _expected(spark, n=400):
    """Latest state after: upsert age+1000 for id%5==0, delete id%7==0,
    insert two brand-new fids."""
    base = _base_df(spark, n).withColumn(
        "age",
        F.when(F.col("__fid__").substr(3, 5).cast("int") % 5 == 0, F.col("age") + 1000)
        .otherwise(F.col("age")).cast("int"),
    ).where(F.col("__fid__").substr(3, 5).cast("int") % 7 != 0)
    new = spark.createDataFrame(
        [("new-1", 7, "nameX"), ("new-2", 8, "nameY")], "__fid__ string, age int, name string"
    )
    return base.unionByName(new)


def _apply_deltas(spark, path, n=400):
    ids = F.col("__fid__").substr(3, 5).cast("int")
    ups = _base_df(spark, n).where(ids % 5 == 0).withColumn(
        "age", (F.col("age") + 1000).cast("int")
    )
    new = spark.createDataFrame(
        [("new-1", 7, "nameX"), ("new-2", 8, "nameY")], "__fid__ string, age int, name string"
    )
    U.append_upserts(ups.unionByName(new), path)
    dels = _base_df(spark, n).where(ids % 7 == 0).select("__fid__")
    U.append_deletes(dels, path)


def _rows(df):
    return {tuple(r) for r in df.select("__fid__", "age", "name").collect()}


class TestUpsert:
    def test_merge_on_read(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        U.init_table(_base_df(spark), path, n_buckets=8)
        _apply_deltas(spark, path)
        assert _rows(U.read_latest(spark, path)) == _rows(_expected(spark))

    def test_compact_rewrites_only_affected_buckets(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        U.init_table(_base_df(spark, 40), path, n_buckets=64)
        # touch a single fid → only its bucket rewrites
        U.append_upserts(
            spark.createDataFrame([("f-00001", 999, "zz")], "__fid__ string, age int, name string"),
            path,
        )
        m = U.compact(spark, path)
        assert m["lineage"]["buckets_rewritten"] == 1
        assert len(m["partitions"]) == 1
        assert _rows(U.read_latest(spark, path)) == _rows(
            _base_df(spark, 40).withColumn(
                "age", F.when(F.col("__fid__") == "f-00001", 999).otherwise(F.col("age")).cast("int")
            ).withColumn(
                "name", F.when(F.col("__fid__") == "f-00001", "zz").otherwise(F.col("name"))
            )
        )

    def test_compact_preserves_view_and_consumes_deltas(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        U.init_table(_base_df(spark), path, n_buckets=8)
        _apply_deltas(spark, path)
        before = _rows(U.read_latest(spark, path))
        m = U.compact(spark, path)
        assert m is not None and m["lineage"]["op"] == "compaction"
        assert glob.glob(os.path.join(path, "_delta", "delta-*")) == []
        assert _rows(U.read_latest(spark, path)) == before == _rows(_expected(spark))
        # second compact is a no-op
        assert U.compact(spark, path) is None

    def test_crash_replay_idempotent(self, spark, tmp_path, monkeypatch):
        """Kill between the bucket rewrite and the manifest/delta
        cleanup, then resume: the replay must reproduce (not duplicate)
        the latest state."""
        path = str(tmp_path / "tbl")
        U.init_table(_base_df(spark), path, n_buckets=8)
        _apply_deltas(spark, path)

        def boom(*a, **kw):
            raise RuntimeError("simulated crash before manifest commit")

        monkeypatch.setattr(U, "write_manifest", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            U.compact(spark, path)
        monkeypatch.undo()
        # deltas were NOT consumed; base buckets were partially rewritten
        assert len(glob.glob(os.path.join(path, "_delta", "delta-*"))) == 2
        m = U.compact(spark, path)  # resume
        assert m is not None
        assert glob.glob(os.path.join(path, "_delta", "delta-*")) == []
        assert _rows(U.read_latest(spark, path)) == _rows(_expected(spark))

    def test_full_bucket_delete_drops_partition(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        df = _base_df(spark, 30)
        U.init_table(df, path, n_buckets=4)
        U.append_deletes(df.select("__fid__"), path)  # delete everything
        U.compact(spark, path)
        assert glob.glob(os.path.join(path, "bucket=*")) == []


class TestTimeTravel:
    def test_asof_sequences_and_horizon(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from geomesa_spark.sources import upsert as U

        path = str(tmp_path / "tt")
        base = spark.range(0, 100).selectExpr(
            "id AS fid", "CAST(id AS DOUBLE) AS v"
        )
        U.init_table(base, path, fid_col="fid", n_buckets=4)
        s1 = U.append_upserts(
            base.where(F.col("fid") % 10 == 0).withColumn("v", F.col("v") + 1000.0), path
        )
        s2 = U.append_deletes(base.where(F.col("fid") % 3 == 0).select("fid"), path)

        v0 = {r["fid"]: r["v"] for r in U.read_asof(spark, path, 0).collect()}
        assert len(v0) == 100 and v0[10] == 10.0
        v1 = {r["fid"]: r["v"] for r in U.read_asof(spark, path, s1).collect()}
        assert len(v1) == 100 and v1[10] == 1010.0
        v2 = {r["fid"]: r["v"] for r in U.read_asof(spark, path, s2).collect()}
        latest = {r["fid"]: r["v"] for r in U.read_latest(spark, path).collect()}
        assert v2 == latest and 9 not in v2 and len(v2) == 100 - 34

        U.compact(spark, path)
        # latest snapshot still readable after compaction
        v2b = {r["fid"]: r["v"] for r in U.read_asof(spark, path, s2).collect()}
        assert v2b == latest
        # history below the horizon is expired
        import pytest as _pytest

        with _pytest.raises(ValueError):
            U.read_asof(spark, path, s1)
