"""Iceberg-style commit manifests for parquet table layouts.

No Iceberg runtime jar exists in this sandbox (SURVEY.md §7.0), so the
engine writes its own snapshot manifest JSON shaped so a real Iceberg
catalog can replace it: table path + partition spec + per-partition
lineage and metrics per commit. This doubles as the checkpoint/resume
record required by the north rule: a job can check ``is_complete`` and
skip a finished write, and per-partition metrics live beside the data.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

__all__ = [
    "partition_footer_stats",
    "write_manifest",
    "read_manifest",
    "latest_manifest",
    "is_complete",
    "analyze_table",
    "table_stats",
]

_MANIFEST_DIR = "_manifest"


def partition_footer_stats(
    table_path: str,
    dir_prefix: str,
    stat_col: str | None = None,
) -> list[dict] | None:
    """Per-partition-directory stats from LOCAL parquet footers — exact
    row counts plus optional ``stat_col`` min/max, zero Spark jobs.

    Returns ``None`` when ``table_path`` is not a local directory (a
    remote scheme like hdfs:// or s3a://): callers must fall back to a
    Spark-side aggregate there. Column statistics are located by the
    parquet LEAF path (``path_in_schema``) — a top-level arrow-schema
    index is wrong whenever a nested column precedes ``stat_col``, since
    row-group columns enumerate flattened leaves."""
    import re as _re

    import pyarrow.parquet as pq

    if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", table_path) or not os.path.isdir(
        table_path
    ):
        return None

    def one_dir(d: str) -> dict | None:
        rows, mn, mx = 0, None, None
        full = os.path.join(table_path, d)
        for fn in os.listdir(full):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(full, fn)).metadata
            rows += md.num_rows
            if stat_col is None or md.num_row_groups == 0:
                continue
            rg0 = md.row_group(0)
            ci = next(
                (
                    i
                    for i in range(rg0.num_columns)
                    if rg0.column(i).path_in_schema == stat_col
                ),
                None,
            )
            if ci is None:
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
        if not rows:
            return None
        entry = {"bucket": int(d.split("=", 1)[1]), "rows": rows}
        if stat_col is not None:
            entry["min"] = mn
            entry["max"] = mx
        return entry

    # the footer walk is driver-side and would otherwise be SERIAL — a
    # fixed cost both parallelism levels pay equally, which eats scaling
    # efficiency as the distributed part gets faster (and grows with
    # bucket count at scale); pyarrow releases the GIL on footer IO, so
    # a thread pool recovers it
    from concurrent.futures import ThreadPoolExecutor

    dirs = [d for d in sorted(os.listdir(table_path)) if d.startswith(dir_prefix + "=")]
    with ThreadPoolExecutor(max_workers=min(16, max(1, len(dirs)))) as ex:
        results = list(ex.map(one_dir, dirs))
    return [r for r in results if r is not None]


def write_manifest(
    table_path: str,
    spec: dict[str, Any],
    partitions: list[dict[str, Any]],
    lineage: dict[str, Any],
) -> dict:
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    existing = [f for f in os.listdir(mdir) if f.startswith("manifest-")]
    snapshot_id = len(existing)
    manifest = {
        "format": "geomesa_spark-manifest/1",
        "snapshot_id": snapshot_id,
        "committed_at_unix": time.time(),
        "table_path": table_path,
        "partition_spec": spec,
        "partitions": sorted(partitions, key=lambda p: p.get("bucket", 0)),
        "total_rows": sum(p.get("rows", 0) for p in partitions),
        "lineage": lineage,
        "complete": True,
    }
    fp = os.path.join(mdir, f"manifest-{snapshot_id:05d}.json")
    tmp = fp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, fp)  # atomic commit
    return manifest


def latest_manifest(table_path: str) -> dict | None:
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    files = sorted(f for f in os.listdir(mdir) if f.startswith("manifest-") and f.endswith(".json"))
    if not files:
        return None
    return read_manifest(os.path.join(mdir, files[-1]))


def read_manifest(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def is_complete(table_path: str) -> bool:
    m = latest_manifest(table_path)
    return bool(m and m.get("complete"))


def analyze_table(
    spark,
    table_path: str,
    cell_col: str | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    top_cells: int = 16,
) -> dict:
    """``geomesa stats-analyze`` analogue (reference geomesa-tools
    StatsAnalyzeCommand → GeoMesaStats.writer :~100): ONE aggregation
    pass computes row count, spatial bounds, and — when a cell key
    column exists — the hot-cell histogram, then commits them as an
    ``analyze`` manifest snapshot. plans/decider.py consumes the
    resulting ``stats`` block (hot-cell skew ratio → salted-join
    choice; row count → broadcast choice) so strategy selection runs
    off persisted metrics instead of caller flags or rescans."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(table_path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    has_geo = lon_col in df.columns and lat_col in df.columns
    if has_geo:
        aggs += [
            F.min(lon_col).alias("min_lon"), F.min(lat_col).alias("min_lat"),
            F.max(lon_col).alias("max_lon"), F.max(lat_col).alias("max_lat"),
        ]
    base = df.agg(*aggs).collect()[0].asDict()
    stats: dict = {"rows": int(base["rows"])}
    if has_geo and base["min_lon"] is not None:
        stats["bbox"] = [
            float(base["min_lon"]), float(base["min_lat"]),
            float(base["max_lon"]), float(base["max_lat"]),
        ]
    if cell_col and cell_col in df.columns:
        hist = (
            df.groupBy(cell_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col(cell_col).asc())
            .limit(top_cells)
            .collect()
        )
        n_cells = df.select(cell_col).distinct().count()
        stats["cells"] = {
            "col": cell_col,
            "distinct": int(n_cells),
            "top": [{"cell": int(r[cell_col]), "rows": int(r["n"])} for r in hist],
            "mean_rows": stats["rows"] / max(n_cells, 1),
        }
    return write_manifest(
        table_path,
        spec={"op": "analyze"},
        partitions=[],
        lineage={"op": "analyze", "stats": stats},
    )


def table_stats(table_path: str) -> dict | None:
    """Most recent analyze stats for a table (None if never analyzed)."""
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    for fn in sorted(
        (f for f in os.listdir(mdir) if f.startswith("manifest-") and f.endswith(".json")),
        reverse=True,
    ):
        m = read_manifest(os.path.join(mdir, fn))
        if m.get("lineage", {}).get("op") == "analyze":
            return m["lineage"]["stats"]
    return None
