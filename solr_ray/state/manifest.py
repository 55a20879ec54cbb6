"""Per-partition segment manifests: lineage + metrics, written atomically.

Plays the role of Solr's commit + transaction log durability
(DirectUpdateHandler2.commit — reference
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:695-760;
UpdateLog.java:596): because inputs are immutable, replayable Parquet, a batch
build needs no op log — an atomically-published manifest per partition makes
each partition an idempotent, skippable unit (SURVEY.md §4 durability row).
A build resumes by skipping partitions whose manifest exists and whose
lineage matches.
"""

from __future__ import annotations

import json
import os
import time


def manifest_path(seg_dir: str) -> str:
    return os.path.join(seg_dir, "manifest.json")


def write_manifest(seg_dir: str, payload: dict) -> None:
    """Atomic write: temp file + rename (same dir, so rename is atomic)."""
    os.makedirs(seg_dir, exist_ok=True)
    payload = dict(payload)
    payload.setdefault("written_at", time.time())
    tmp = os.path.join(seg_dir, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(seg_dir))


def read_manifest(seg_dir: str) -> dict | None:
    p = manifest_path(seg_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def is_complete(seg_dir: str, lineage: str | None = None) -> bool:
    m = read_manifest(seg_dir)
    if m is None:
        return False
    if lineage is not None and m.get("lineage") != lineage:
        return False
    return all(
        os.path.exists(os.path.join(seg_dir, f)) for f in m.get("files", [])
    )
