"""S7 writer semantics: upsert / delete-by-fid with merge-on-read plus
a manifest-aware compaction job.

Reference: GeoMesaFeatureWriter (geomesa-index-api/.../index/geotools/
GeoMesaFeatureWriter.scala :~250) modifies/removes features by fid
across every index table in place. A 100 TB Spark table can't do
in-place row edits, so the engine uses the log-structured shape every
lakehouse format uses (public Iceberg/Delta merge-on-read design):

- BASE: parquet partitioned by ``bucket = pmod(xxhash64(fid), B)``.
- DELTAS: small append-only parquet files under ``_delta/`` (leading
  underscore → invisible to plain ``spark.read.parquet(path)``), each
  row tagged ``__op__`` ('upsert'|'delete') and a monotonically
  increasing ``__seq__``.
- READ: ``read_latest`` = base ∪ deltas → latest ``__seq__`` wins per
  fid, tombstones drop the row (one window over the bucket-pruned
  union; the fid hash-bucket column keeps the shuffle aligned with the
  base layout).
- COMPACT: rewrites ONLY the buckets named by delta fids (dynamic
  partition overwrite), then commits a manifest and consumes the delta
  files. The merge is latest-wins by ``__seq__`` and therefore
  IDEMPOTENT: re-running after a crash anywhere between the bucket
  rewrite and the delta cleanup reproduces the same buckets — the
  kill/resume guarantee, no write-ahead coordination needed.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geomesa_spark.sources.catalog import write_manifest

__all__ = [
    "init_table",
    "append_upserts",
    "append_deletes",
    "read_latest",
    "read_asof",
    "compact",
    "pending_deltas",
]

_DELTA_DIR = "_delta"


def _bucket(fid_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(fid_col)), F.lit(n_buckets))


def _spec(path: str) -> dict:
    import json

    with open(os.path.join(path, "_upsert_spec.json")) as f:
        return json.load(f)


def init_table(df: DataFrame, path: str, fid_col: str = "__fid__", n_buckets: int = 16) -> None:
    """Materialize the base table bucket-partitioned by fid hash."""
    import json

    (
        df.withColumn("__seq__", F.lit(0).cast("long"))
        .withColumn("__op__", F.lit("upsert"))
        .withColumn("bucket", _bucket(fid_col, n_buckets))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    os.makedirs(os.path.join(path, _DELTA_DIR), exist_ok=True)
    with open(os.path.join(path, "_upsert_spec.json"), "w") as f:
        json.dump({"fid_col": fid_col, "n_buckets": n_buckets}, f)


def _next_seq(path: str) -> int:
    seqs = [0]
    for fp in glob.glob(os.path.join(path, _DELTA_DIR, "delta-*")):
        try:
            seqs.append(int(os.path.basename(fp).split("-")[1].split(".")[0]))
        except (IndexError, ValueError):
            continue
    m = None
    try:
        from geomesa_spark.sources.catalog import latest_manifest

        m = latest_manifest(path)
    except Exception:
        pass
    if m:
        seqs.append(int(m.get("lineage", {}).get("consumed_through_seq", 0)))
    return max(seqs) + 1


def _append_delta(df: DataFrame, path: str, op: str) -> int:
    spec = _spec(path)
    seq = _next_seq(path)
    out = (
        df.withColumn("__seq__", F.lit(seq).cast("long"))
        .withColumn("__op__", F.lit(op))
        .withColumn("bucket", _bucket(spec["fid_col"], spec["n_buckets"]))
    )
    out.write.mode("overwrite").parquet(os.path.join(path, _DELTA_DIR, f"delta-{seq:08d}"))
    return seq


def append_upserts(df: DataFrame, path: str) -> int:
    """Append an upsert delta (insert-or-replace by fid). Returns seq."""
    return _append_delta(df, path, "upsert")


def append_deletes(fids: DataFrame, path: str) -> int:
    """Append delete-by-fid tombstones (a DataFrame of fid values)."""
    return _append_delta(fids, path, "delete")


def pending_deltas(spark: SparkSession, path: str) -> DataFrame | None:
    files = sorted(glob.glob(os.path.join(path, _DELTA_DIR, "delta-*")))
    if not files:
        return None
    return spark.read.option("mergeSchema", "true").parquet(*files)


def _merge_latest(base: DataFrame, deltas: DataFrame, fid_col: str) -> DataFrame:
    u = base.unionByName(deltas, allowMissingColumns=True)
    w = Window.partitionBy(fid_col).orderBy(F.col("__seq__").desc())
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("__op__") != "delete"))
        .drop("__rn")
    )


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    """Merge-on-read view: base ∪ pending deltas, latest-wins, no
    tombstoned rows, service columns dropped."""
    spec = _spec(path)
    base = spark.read.parquet(path)
    d = pending_deltas(spark, path)
    out = base if d is None else _merge_latest(base, d, spec["fid_col"])
    return out.drop("__seq__", "__op__", "bucket")


def read_asof(spark: SparkSession, path: str, seq: int) -> DataFrame:
    """Snapshot (time-travel) read: the table AS OF delta sequence
    ``seq`` — base ∪ deltas with ``__seq__ <= seq``, latest-wins, no
    tombstoned rows (init_table is sequence 0; each append returns its
    sequence number, which doubles as the snapshot id — the same
    log-structured snapshot contract as Iceberg/Delta).

    History older than the last compaction is folded into the base:
    the compaction manifest's ``lineage.consumed_through_seq`` is the
    travel horizon (snapshot expiration); asking below it raises."""
    from geomesa_spark.sources.catalog import latest_manifest

    spec = _spec(path)
    m = latest_manifest(path)
    horizon = 0
    if m and m.get("lineage", {}).get("op") == "compaction":
        horizon = int(m["lineage"].get("consumed_through_seq", 0))
    if seq < horizon:
        raise ValueError(
            f"read_asof: seq {seq} precedes the compaction horizon {horizon} "
            "(history folded into the base — expired snapshot)"
        )
    base = spark.read.parquet(path)
    d = pending_deltas(spark, path)
    if d is not None:
        d = d.where(F.col("__seq__") <= seq)
        out = _merge_latest(base, d, spec["fid_col"])
    else:
        out = base
    return out.drop("__seq__", "__op__", "bucket")


def compact(spark: SparkSession, path: str) -> dict | None:
    """Rewrite only the delta-affected buckets into the base, commit a
    manifest, consume the delta files. Idempotent under replay."""
    spec = _spec(path)
    fid_col, n_buckets = spec["fid_col"], spec["n_buckets"]
    d = pending_deltas(spark, path)
    if d is None:
        return None
    files = sorted(glob.glob(os.path.join(path, _DELTA_DIR, "delta-*")))
    affected = [r["bucket"] for r in d.select("bucket").distinct().collect()]
    max_seq = d.agg(F.max("__seq__")).collect()[0][0]

    base = spark.read.parquet(path).where(F.col("bucket").isin(affected))
    # localCheckpoint BEFORE the overwrite: materializes the merged
    # buckets and cuts the lineage back to the files being replaced
    # (Spark otherwise rejects — correctly — overwriting a read path)
    merged = _merge_latest(base, d, fid_col).localCheckpoint(eager=True)
    rows_after = merged.count()  # served from the checkpoint, no re-read

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only touches partitions present in the output —
    # a fully-deleted bucket must be dropped explicitly
    import shutil

    survived = {r["bucket"] for r in merged.select("bucket").distinct().collect()}
    for b in set(affected) - survived:
        shutil.rmtree(os.path.join(path, f"bucket={b}"), ignore_errors=True)
    manifest = write_manifest(
        path,
        spec={"layout": "fid-bucketed-upsert", "n_buckets": n_buckets, "fid_col": fid_col},
        partitions=[{"bucket": int(b), "rows": -1} for b in sorted(affected)],
        lineage={
            "op": "compaction",
            "consumed_through_seq": int(max_seq),
            "rows_after": int(rows_after),
            "buckets_rewritten": len(affected),
        },
    )
    for fp in files:  # consume AFTER the manifest commit (replay-safe)
        import shutil

        shutil.rmtree(fp, ignore_errors=True)
    return manifest
