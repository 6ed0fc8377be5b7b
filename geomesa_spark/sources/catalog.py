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

__all__ = ["write_manifest", "read_manifest", "latest_manifest", "is_complete"]

_MANIFEST_DIR = "_manifest"


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
