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

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "bucketed_join_is_colocated"]


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
    math as shuffle partition sizing, paid once)."""
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


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (the bucket spec lives
    there; a direct parquet read of the same files plans a shuffle)."""
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
