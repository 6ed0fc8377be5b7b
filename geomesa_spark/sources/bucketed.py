"""Bucketed cell tables: shuffle-free repeated joins on the cell key.

Reference context: GeoMesa's partitioned indices co-locate features by
Z-cell inside the key-value store, so server-side joins/scans on the
same cell never re-shuffle (geomesa-index-api .../index/z2/Z2Index —
the keyspace IS the partitioning). The Spark-native equivalent is a
BUCKETED table: ``bucketBy(n, cell)`` + ``sortBy(cell)`` writes each
bucket as its own pre-hashed file set and records the layout in the
session catalog, and Catalyst then plans joins between two tables
bucketed the same way as SortMergeJoin with NO Exchange on either side
— the shuffle that dominates repeated layer×layer joins at 100 TB is
paid once at write time and never again.

This matters for the workloads that JOIN THE SAME LAYERS REPEATEDLY
(tile refresh against a slowly-changing polygon layer, daily points vs
static regions): the broadcast path covers small build sides, salting
covers skew, and bucketing covers "both sides huge, join key stable".

Plain parquet + the in-memory session catalog (no Hive metastore
needed); the bucket spec travels in the catalog, so `read_bucketed`
must go through ``spark.table`` — reading the files directly would
lose the layout and silently reintroduce the shuffle.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_bucketed",
    "read_bucketed",
    "restore_bucketed",
    "bucketed_join_is_colocated",
]

# marker manifest written next to externally-located bucketed data; it
# (a) lets a FRESH session re-register the layout (restore_bucketed) and
# (b) marks a directory as ours so overwrite cleanup never deletes a
# location this module didn't write
_SPEC_FILE = "_bucket_spec.json"


def _local_path(p: str | None) -> str | None:
    if not p:
        return None
    if p.startswith("file://"):
        return p[len("file://"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    if "://" in p:
        return None  # non-local filesystem: manifest/cleanup skipped
    return p


def _table_location(spark: SparkSession, name: str) -> str | None:
    try:
        if not spark.catalog.tableExists(name):
            return None  # quiet: DESCRIBE on a missing table ERROR-logs
        rows = spark.sql(f"DESCRIBE FORMATTED `{name}`").collect()
    except Exception:
        return None
    for r in rows:
        if (r["col_name"] or "").strip().lower() == "location":
            return (r["data_type"] or "").strip() or None
    return None


def write_bucketed(
    df: DataFrame,
    name: str,
    n_buckets: int = 64,
    bucket_col: str = "cell",
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    align_tasks: bool = True,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. ``n_buckets`` must MATCH between tables that will be
    joined (unequal bucket counts fall back to a shuffled join).

    ``align_tasks`` repartitions on the bucket hash before the write so
    each bucket lands in ONE file. The EXCHANGE is elided either way;
    the measured win of alignment (3.3× vs the shuffled join, where the
    multi-file layout actually LOST to it — BENCH.md) comes from the
    scan shape: one coherent pre-sorted run per bucket instead of many
    small files per bucket task. Note the SortMergeJoin still plans its
    sort on default configs — Spark only propagates bucket-scan output
    ORDER under spark.sql.legacy.bucketedTableScan.outputOrdering=true —
    but sorting already-sorted single runs is cheap; only the shuffle
    elision and file coherence are load-bearing claims here.

    At 100 TB: n_buckets sizes the join parallelism floor — pick it so
    a bucket's largest co-group fits one executor's memory (the same
    math as shuffle partition sizing, paid once).

    Overwrite semantics (ADVICE r4): ``saveAsTable(mode='overwrite')``
    on an external table REPOINTS the catalog at the new ``path``
    without deleting the previous location, so repeated writes under
    rotating paths would silently leak full table copies. When the
    catalog already holds ``name`` at a DIFFERENT local location that
    carries this module's ``_bucket_spec.json`` marker, the prior
    directory is removed AFTER the new write succeeds (never before —
    a failed write must not destroy the previous copy, and ``df`` may
    legitimately read from it); locations without the marker (not written by
    this module) are left untouched and a leak is the caller's to
    manage. An external ``path`` also gains the spec manifest, which
    ``restore_bucketed`` uses to re-register the layout in a fresh
    session."""
    spark = df.sparkSession
    # capture the PRIOR location now, clean it only AFTER the new write
    # SUCCEEDS: deleting first would destroy the only copy on a failed
    # write, and would pull the files out from under a df whose lineage
    # reads the old table (review finding r5)
    prior = None
    if mode == "overwrite":
        old = _local_path(_table_location(spark, name))
        new = _local_path(path)
        if (
            old
            and os.path.isdir(old)
            and os.path.isfile(os.path.join(old, _SPEC_FILE))
            and (new is None or os.path.abspath(old) != os.path.abspath(new))
        ):
            prior = old
    if align_tasks:
        # spark's bucket id = pmod(hash(col), n) — repartitioning on the
        # same expression makes task id ≡ bucket id, one file per bucket
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(bucket_col))
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*(sort_cols or (bucket_col,)))
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
    if prior:
        shutil.rmtree(prior, ignore_errors=True)
    local = _local_path(path)
    if local:
        spec = {
            "name": name,
            "n_buckets": n_buckets,
            "bucket_col": bucket_col,
            "sort_cols": list(sort_cols or (bucket_col,)),
        }
        with open(os.path.join(local, _SPEC_FILE), "w") as fh:
            json.dump(spec, fh)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (the bucket spec lives
    there; a direct parquet read of the same files plans a shuffle)."""
    return spark.table(name)


def restore_bucketed(spark: SparkSession, path: str, name: str | None = None) -> DataFrame:
    """Re-register an externally-located bucketed table in a FRESH
    session's catalog from the ``_bucket_spec.json`` manifest that
    ``write_bucketed`` left next to the data.

    The bucket layout of a Spark datasource table lives ONLY in the
    catalog — a new session reading the same parquet files directly
    plans them as ordinary unbucketed splits and every join re-shuffles
    (the round-4 verdict's durability gap). The manifest makes the
    layout a property of the DATA: this issues
    ``CREATE TABLE … CLUSTERED BY … SORTED BY … INTO n BUCKETS
    LOCATION path`` with the schema read from the parquet footers, after
    which ``spark.table(name)`` plans Exchange-free joins again (Spark's
    bucket reader recovers each file's bucket id from the ``_NNNNN``
    file-name suffix the bucketed write stamped, so no data moves).

    Returns the restored table as a DataFrame."""
    local = _local_path(path)
    if local is None:
        raise ValueError(f"restore_bucketed needs a local path, got {path!r}")
    with open(os.path.join(local, _SPEC_FILE)) as fh:
        spec = json.load(fh)
    name = name or spec["name"]

    # identifiers and the path are spliced into SQL text: reject
    # backticks in identifiers and escape quotes in the path so a legal
    # POSIX path (or a hand-edited manifest) can't break out of the
    # statement (review finding r5)
    def ident(v: str) -> str:
        v = str(v)
        if "`" in v:
            raise ValueError(f"invalid identifier in bucket spec: {v!r}")
        return f"`{v}`"

    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"{ident(f.name)} {f.dataType.simpleString()}" for f in schema.fields)
    sort = ", ".join(ident(c) for c in spec["sort_cols"])
    loc = path.replace("'", "''")
    spark.sql(f"DROP TABLE IF EXISTS {ident(name)}")
    spark.sql(
        f"CREATE TABLE {ident(name)} ({cols}) USING parquet "
        f"CLUSTERED BY ({ident(spec['bucket_col'])}) SORTED BY ({sort}) "
        f"INTO {int(spec['n_buckets'])} BUCKETS LOCATION '{loc}'"
    )
    return spark.table(name)


def bucketed_join_is_colocated(joined: DataFrame) -> bool:
    """True when the physical plan contains no SHUFFLE exchange (the
    bucketed co-location held and no side is re-partitioned). A
    BroadcastExchange does not count — broadcasting a small side moves
    no bucketed data. Evidence helper for tests/ops — run it after a
    change to a bucketed pipeline to verify the layout still carries
    the join."""
    import re

    plan = joined._jdf.queryExecution().executedPlan().toString()
    # shuffle exchanges render as "Exchange <distribution>(...)" for every
    # distribution kind (hash, range, single-partition, rebalance);
    # BroadcastExchange renders with its own node name and never matches
    return not re.search(
        r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|"
        r"RoundRobinPartitioning|rebalancing)",
        plan,
    ) and "ShuffleExchange" not in plan
