"""spark-submit entry point for the north-star pipeline, checkpoint-
resumable per stage.

Usage (cluster or local):

    spark-submit --py-files geomesa_spark.zip jobs/run_pipeline.py \\
        --sf-dir /root/testdata/sf0.1 --out /tmp/pipeline_out [--force]

Build the zip with ``python jobs/package.py`` (or any zip of the
geomesa_spark package dir).

Stages (each materialized as a parquet table + Iceberg-style manifest;
a rerun skips every stage whose manifest is already committed — kill
the job at any point and resubmit to resume):

  1. documents   — synthesized interleaved docs (or pass --docs to use
                   an existing table)
  2. doc_points  — extracted geo points with z2 cells, bucketed layout
  3. pairs       — spatial join vs the polygon layer (broadcast,
                   two-phase with exact refine)
  4. tiles       — tile materialization bucketed by cell prefix + salt

Each manifest carries per-partition row counts/min-max (metrics) and
the upstream stage paths + snapshot ids (lineage), per the north rule.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", help="existing documents parquet (skips synthesis)")
    ap.add_argument("--n-docs", type=int, default=600_000)
    ap.add_argument("--n-polys", type=int, default=2000)
    ap.add_argument("--bits", type=int, default=6)
    ap.add_argument("--force", action="store_true", help="recompute all stages")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from geomesa_spark.operators.extract import extract_geo_points, with_z2_cell
    from geomesa_spark.operators.joins import spatial_join_points_in_polys
    from geomesa_spark.operators.tiles import write_tiles
    from geomesa_spark.sources.catalog import is_complete, latest_manifest, write_manifest
    from geomesa_spark.tables import poly_layers, synthesize_documents

    # On a cluster, master/conf come from spark-submit; this default only
    # applies when run directly with python.
    spark = SparkSession.builder.appName("geomesa_spark-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stage(name: str):
        path = os.path.join(args.out, name)
        done = (not args.force) and is_complete(path)
        print(f"[stage {name}] {'SKIP (manifest committed)' if done else 'RUN'} -> {path}")
        return path, done

    t_all = time.monotonic()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    def write_counted(df, path):
        """Write + row count in ONE pass (Observation on the write job —
        no post-write re-read of the stage output)."""
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite").parquet(path)
        return int(obs.get["rows"])

    # 1. documents
    docs_path, done = stage("documents")
    if args.docs:
        docs_path = args.docs
    elif not done:
        n = write_counted(synthesize_documents(spark, args.n_docs, partitions=256), docs_path)
        write_manifest(docs_path, spec={"stage": "documents"},
                       partitions=[{"bucket": 0, "rows": int(n)}],
                       lineage={"generator": "tables.synthesize_documents", "n_docs": args.n_docs})
    docs = spark.read.parquet(docs_path)

    # 2. extracted cell-keyed points
    pts_path, done = stage("doc_points")
    if not done:
        pts = with_z2_cell(extract_geo_points(docs))
        n = write_counted(pts, pts_path)
        write_manifest(pts_path, spec={"stage": "doc_points", "cell": "z2/31bit"},
                       partitions=[{"bucket": 0, "rows": int(n)}],
                       lineage={"input": docs_path,
                                "input_snapshot": (latest_manifest(docs_path) or {}).get("snapshot_id")})
    pts = spark.read.parquet(pts_path)

    # 3. spatial join
    pairs_path, done = stage("pairs")
    if not done:
        polys = poly_layers(spark, args.n_polys)
        pairs = spatial_join_points_in_polys(pts, polys, bits=args.bits, broadcast=True)
        n = write_counted(pairs, pairs_path)
        write_manifest(pairs_path, spec={"stage": "pairs", "join_bits": args.bits},
                       partitions=[{"bucket": 0, "rows": int(n)}],
                       lineage={"points": pts_path, "n_polys": args.n_polys,
                                "points_snapshot": (latest_manifest(pts_path) or {}).get("snapshot_id")})
    pairs = spark.read.parquet(pairs_path)

    # 4. tiles
    tiles_path, done = stage("tiles")
    if not done:
        write_tiles(pairs, tiles_path, cell_col="cell_z2", prefix_bits=8,
                    n_buckets=16, salt_buckets=4,
                    lineage={"pairs": pairs_path,
                             "pairs_snapshot": (latest_manifest(pairs_path) or {}).get("snapshot_id")})

    wall = time.monotonic() - t_all
    n_docs = (latest_manifest(docs_path) or {}).get("total_rows") or docs.count()
    print(f"[pipeline] complete in {wall:.1f}s ({n_docs / max(wall, 1e-9):.0f} docs/sec incl. skipped stages)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
