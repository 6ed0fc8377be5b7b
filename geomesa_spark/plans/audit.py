"""Query audit log — GeoMesa's AuditProvider/AuditWriter analogue
(reference: geomesa-utils/.../audit/AuditProvider.scala,
geomesa-index-api QueryEvent: typeName, filter, planTime, hits).

Driver-side only: one JSON line per planned query appended to a local
path (or collected in memory for tests). Never touches the executor hot
path — auditing records what the PLANNER decided (filter text, extracted
primary, index used), which is bounded work per query, plus optional
hit counts the caller supplies after an action."""

from __future__ import annotations

import json
import os
import threading
import time

__all__ = ["enable_audit", "disable_audit", "audit_event", "read_audit"]

_lock = threading.Lock()
_path: str | None = None
_memory: list[dict] | None = None


def enable_audit(path: str | None = None) -> None:
    """Start auditing. With a path, events append as JSON lines there;
    with None, events collect in memory (read_audit returns them)."""
    global _path, _memory
    with _lock:
        _path = path
        _memory = [] if path is None else None


def disable_audit() -> None:
    global _path, _memory
    with _lock:
        _path = None
        _memory = None


def audit_event(**fields) -> None:
    """Record one audit event if auditing is enabled (no-op otherwise)."""
    with _lock:
        if _path is None and _memory is None:
            return
        evt = {"ts_millis": int(time.time() * 1000), **fields}
        if _memory is not None:
            _memory.append(evt)
        else:
            with open(_path, "a") as f:
                f.write(json.dumps(evt) + "\n")


def read_audit(path: str | None = None) -> list[dict]:
    """Read back audit events (from the given path, or memory)."""
    with _lock:
        if path is None:
            return list(_memory or [])
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
