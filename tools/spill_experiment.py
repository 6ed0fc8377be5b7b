"""Memory-pressure evidence for the 7-stage corpus job (round-5 item 5).

The 100 TB claim rests on one-shuffle stage shapes; this shows they
survive executor memory pressure: the SAME 16M-doc run, once with
normal memory and once with Tungsten execution memory squeezed
(spark.memory.fraction + small driver heap) so aggregation/sort buffers
SPILL — all 7 stages must complete and the final shard output must be
byte-identical (row-set hash) to the unconstrained run, with
spilled-bytes > 0 recorded in _spill.json.

Usage: python tools/spill_experiment.py [--n-docs 16000000] [--out /tmp/spill_exp]
Prints one JSON line with both runs' wall/spill numbers and the hash
equality verdict (for BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(out: str, n_docs: int, cores: int, driver_mem: str, extra_conf: list[str]) -> dict:
    env = dict(os.environ)
    submit = [f"--master local[{cores}]", f"--driver-memory {driver_mem}"]
    submit += [f"--conf {c}" for c in extra_conf]
    env["PYSPARK_SUBMIT_ARGS"] = " ".join(submit) + " pyspark-shell"
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "jobs", "run_corpus.py"),
         "--out", out, "--n-docs", str(n_docs), "--quota", str(n_docs),
         "--force", "--spill-report"],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = time.monotonic() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"corpus job failed under {driver_mem}/{extra_conf}")
    spill = json.load(open(os.path.join(out, "_spill.json")))
    return {"wall_s": round(wall, 1), **spill}


def shards_hash(out: str) -> tuple[int, int]:
    """Order-independent row-set hash of the final shard table (DuckDB:
    engine-independent check, reads the hive-partitioned layout)."""
    import duckdb

    n, h = duckdb.connect().execute(
        "SELECT count(*), "
        "COALESCE(sum(CAST(hash(concat_ws('|', doc_id, lang, CAST(shard AS VARCHAR), "
        "CAST(pack_id AS VARCHAR), CAST(pack_offset AS VARCHAR), train_text)) AS HUGEINT)), 0) "
        f"FROM read_parquet('{out}/shards/*/*.parquet', hive_partitioning=1)"
    ).fetchone()
    return int(n), int(h)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=16_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--out", default="/tmp/spill_exp")
    args = ap.parse_args()

    base_out = os.path.join(args.out, "baseline")
    tight_out = os.path.join(args.out, "constrained")
    for d in (base_out, tight_out):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    # identical plan shape in both runs (same cores, same shuffle
    # partitions) — only the memory budget differs, so any output delta
    # would be a spill-path correctness bug, not a plan difference
    common = ["spark.sql.shuffle.partitions=16", "spark.ui.enabled=true",
              "spark.sql.session.timeZone=UTC"]
    baseline = run_job(base_out, args.n_docs, args.cores, "12g", common)
    constrained = run_job(
        tight_out, args.n_docs, args.cores, "3g",
        common + ["spark.memory.fraction=0.15"],
    )

    nb, hb = shards_hash(base_out)
    nc, hc = shards_hash(tight_out)
    result = {
        "n_docs": args.n_docs,
        "baseline": baseline,
        "constrained": constrained,
        "rows": {"baseline": nb, "constrained": nc},
        "hash_equal": (nb == nc and hb == hc),
        "constrained_spilled": constrained["memoryBytesSpilled"] > 0
        or constrained["diskBytesSpilled"] > 0,
    }
    print(json.dumps(result))
    return 0 if (result["hash_equal"] and result["constrained_spilled"]) else 1


if __name__ == "__main__":
    sys.exit(main())
