"""spark-submit entry point for the training-corpus pipeline,
checkpoint-resumable per stage — the corpus counterpart of
jobs/run_pipeline.py (same manifest/lineage contract, same resume
semantics).

Usage (cluster or local):

    spark-submit --py-files geomesa_spark.zip jobs/run_corpus.py \\
        --out /tmp/corpus_out [--docs <parquet>] [--force]

Stages (each a parquet table + manifest; a rerun skips every stage
whose manifest is committed — kill anywhere and resubmit to resume):

  1. documents — synthesized interleaved docs flattened to
                 (doc_id, lang, text) (or --docs with those columns)
  2. scored    — token stats + BPE count + language ID + quality +
                 fingerprint, one codegen select
  3. dedup     — exact-dedup winners (content-hash groupBy + semi
                 join) with in-document chunk dedup applied
  4. clean     — benchmark decontamination: word-3-gram overlap vs
                 the held-out eval slice (doc_id % 97 == 0), drop
                 docs over the contamination threshold
  5. scrub     — PII redaction (email/phone/IPv4/card → typed
                 placeholders) with per-kind audit counts
  6. sample    — per-language stratified quota (hash-ordered,
                 repartition-stable)
  7. shards    — deterministic trainer shards, clustered by shard and
                 sorted by in-shard position, PACKED into fixed
                 token-budget sequences (pack_id/pack_offset per doc),
                 written partitioned by shard; manifest carries
                 per-shard row counts read from parquet footers
                 (metadata only, no extra job)

Every manifest carries the upstream stage path + snapshot id
(lineage) and row metrics, per the north rule.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANGS = ["en", "de", "fr", "es", "zh"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--docs", help="existing (doc_id, lang, text) parquet (skips synthesis)")
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--quota", type=int, default=10_000, help="max docs per language")
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--contamination-max", type=float, default=0.5)
    ap.add_argument("--chunk-tokens", type=int, default=16)
    ap.add_argument("--seq-tokens", type=int, default=2048,
                    help="token budget per packed training sequence")
    ap.add_argument("--force", action="store_true", help="recompute all stages")
    ap.add_argument("--spill-report", action="store_true",
                    help="write _spill.json (total shuffle/aggregate spill bytes "
                         "from the UI REST API) into --out at job end")
    args = ap.parse_args()

    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    from geomesa_spark.operators.corpus import (
        chunk_dedup, contamination, pack_sequences, shard_assign,
        stratified_sample,
    )
    from geomesa_spark.operators.dedup import exact_dedup
    from geomesa_spark.operators.text import (
        scrub_pii, with_bpe_token_count, with_fingerprint,
        with_language_id, with_quality_score, with_token_stats,
    )
    from geomesa_spark.sources.catalog import is_complete, latest_manifest, write_manifest
    from geomesa_spark.tables import synthesize_documents

    spark = SparkSession.builder.appName("geomesa_spark-corpus").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t_stage = [time.monotonic()]

    def stage(name: str):
        now = time.monotonic()
        if t_stage:
            print(f"  (prev stage wall: {now - t_stage[0]:.1f}s)")
        t_stage[0] = now
        path = os.path.join(args.out, name)
        done = (not args.force) and is_complete(path)
        print(f"[stage {name}] {'SKIP (manifest committed)' if done else 'RUN'} -> {path}")
        return path, done

    def write_counted(df, path):
        """Write + row count in ONE pass (Observation on the write job)."""
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite").parquet(path)
        return int(obs.get["rows"])

    def snap(path):
        return (latest_manifest(path) or {}).get("snapshot_id")

    t_all = time.monotonic()

    # 1. documents: flat (doc_id, lang, text)
    docs_path, done = stage("documents")
    if args.docs:
        docs_path = args.docs
    elif not done:
        # synthesized ids are strings ('doc-000000000123'): derive the
        # numeric id for the deterministic language assignment
        idnum = F.regexp_extract(F.col("doc_id"), r"(\d+)", 1).cast("long")
        lang = F.element_at(
            F.array(*[F.lit(l) for l in LANGS]), (F.pmod(idnum, 5) + 1).cast("int")
        )
        flat = synthesize_documents(spark, args.n_docs, partitions=64).select(
            "doc_id",
            lang.alias("lang"),
            F.concat_ws(
                " ", F.transform(F.filter("spans", lambda s: s.kind == "text"), lambda s: s.text)
            ).alias("text"),
        )
        n = write_counted(flat, docs_path)
        write_manifest(docs_path, spec={"stage": "documents"},
                       partitions=[{"bucket": 0, "rows": n}],
                       lineage={"generator": "tables.synthesize_documents", "n_docs": args.n_docs})
    docs = spark.read.parquet(docs_path)

    # 2. scored: every text signal in one codegen select
    scored_path, done = stage("scored")
    if not done:
        scored = with_fingerprint(
            with_quality_score(with_language_id(with_bpe_token_count(with_token_stats(docs))))
        )
        n = write_counted(scored, scored_path)
        write_manifest(scored_path, spec={"stage": "scored"},
                       partitions=[{"bucket": 0, "rows": n}],
                       lineage={"input": docs_path, "input_snapshot": snap(docs_path)})
    scored = spark.read.parquet(scored_path)

    # 3. dedup: exact winners + in-doc chunk dedup
    dedup_path, done = stage("dedup")
    if not done:
        winners = exact_dedup(scored).select(F.col("keep_key").alias("doc_id"))
        kept = scored.join(winners, "doc_id", "left_semi")
        cleaned = kept.join(
            chunk_dedup(kept, chunk_tokens=args.chunk_tokens).select(
                "doc_id", "dedup_text", "n_dropped_chunks"
            ),
            "doc_id",
        )
        n = write_counted(cleaned, dedup_path)
        write_manifest(dedup_path, spec={"stage": "dedup", "chunk_tokens": args.chunk_tokens},
                       partitions=[{"bucket": 0, "rows": n}],
                       lineage={"input": scored_path, "input_snapshot": snap(scored_path)})
    deduped = spark.read.parquet(dedup_path)

    # 4. clean: decontaminate vs the held-out eval slice
    clean_path, done = stage("clean")
    if not done:
        idnum = F.regexp_extract(F.col("doc_id"), r"(\d+)", 1).cast("long")
        bench = docs.where(idnum % 97 == 0)
        train = deduped.where(idnum % 97 != 0)
        cont = contamination(train, bench, n=3).select("doc_id", "contamination")
        clean = (
            train.join(cont, "doc_id", "left")
            .withColumn("contamination", F.coalesce(F.col("contamination"), F.lit(0.0)))
            .where(F.col("contamination") <= args.contamination_max)
        )
        n = write_counted(clean, clean_path)
        write_manifest(clean_path, spec={"stage": "clean", "max": args.contamination_max},
                       partitions=[{"bucket": 0, "rows": n}],
                       lineage={"input": dedup_path, "input_snapshot": snap(dedup_path),
                                "benchmark": docs_path})
    clean = spark.read.parquet(clean_path)

    # 5. scrub: PII redaction on the training text + audit counts.
    # Superseded text columns (raw `text`, pre-scrub `dedup_text`) stop
    # here — sample and shards carry only the train-ready bytes.
    scrub_path, done = stage("scrub")
    if not done:
        scrubbed = scrub_pii(clean, text_col="dedup_text", out="train_text").drop(
            "text", "dedup_text"
        )
        n = write_counted(scrubbed, scrub_path)
        # audit totals from the JUST-WRITTEN columnar table: a 4-int-column
        # scan of the stage output, not a second full regex pass over the
        # upstream corpus
        pii = spark.read.parquet(scrub_path).agg(
            *[F.sum(f"n_{k}").alias(k) for k in ("email", "card", "phone", "ipv4")]
        ).collect()[0]
        write_manifest(scrub_path, spec={"stage": "scrub",
                                         "pii_hits": {k: int(pii[k] or 0) for k in pii.asDict()}},
                       partitions=[{"bucket": 0, "rows": n}],
                       lineage={"input": clean_path, "input_snapshot": snap(clean_path)})
    scrubbed = spark.read.parquet(scrub_path)

    # 6. sample: per-language quota
    sample_path, done = stage("sample")
    if not done:
        n = write_counted(stratified_sample(scrubbed, ["lang"], args.quota), sample_path)
        write_manifest(sample_path, spec={"stage": "sample", "quota": args.quota},
                       partitions=[{"bucket": 0, "rows": n}],
                       lineage={"input": scrub_path, "input_snapshot": snap(scrub_path)})
    sample = spark.read.parquet(sample_path)

    # 7. shards: clustered + sorted trainer layout with token-budget
    # sequence packing, partitioned by shard
    shards_path, done = stage("shards")
    if not done:
        sharded = (
            pack_sequences(
                shard_assign(sample, args.n_shards),
                seq_tokens=args.seq_tokens,
                by=["shard"],
                order_col="shard_pos",
                text_col="train_text",
            )
            .repartition(args.n_shards, "shard")
            .sortWithinPartitions("shard", "shard_pos")
        )
        sharded.write.mode("overwrite").partitionBy("shard").parquet(shards_path)
        # per-shard metrics from parquet footers: metadata only, no job
        from geomesa_spark.sources.catalog import partition_footer_stats

        parts = partition_footer_stats(shards_path, "shard") or []
        write_manifest(shards_path, spec={"stage": "shards", "n_shards": args.n_shards},
                       partitions=parts,
                       lineage={"input": sample_path, "input_snapshot": snap(sample_path)})

    wall = time.monotonic() - t_all
    n_docs = (latest_manifest(docs_path) or {}).get("total_rows") or docs.count()
    print(f"[corpus] complete in {wall:.1f}s ({n_docs / max(wall, 1e-9):.0f} docs/sec incl. skipped stages)")

    if args.spill_report:
        # memory-pressure evidence (BENCH.md spill experiment): total
        # Tungsten spill across all completed stages, from the app's own
        # UI REST endpoint — zero-instrumentation, works under any config
        import json as _json
        import urllib.request

        spill = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0, "stages": 0}
        ui = spark.sparkContext.uiWebUrl
        if ui:
            app_id = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE",
                timeout=60,
            ) as r:
                for st in _json.load(r):
                    spill["memoryBytesSpilled"] += int(st.get("memoryBytesSpilled", 0))
                    spill["diskBytesSpilled"] += int(st.get("diskBytesSpilled", 0))
                    spill["stages"] += 1
        with open(os.path.join(args.out, "_spill.json"), "w") as fh:
            _json.dump(spill, fh)
        print(f"[spill] {_json.dumps(spill)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
