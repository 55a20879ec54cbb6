"""Delete tombstones: Lucene-style logical deletes over immutable segments.

Reference semantics: Solr deletes (deleteById / deleteByQuery through
DirectUpdateHandler2, SURVEY §3.1) mark docs deleted in the live-docs
bitset; segments stay immutable and deleted docs are physically dropped
only at merge/rebuild time. Here tombstones live in one atomic JSON at the
index root (the doc set is tiny relative to the corpus; at 10^12-doc scale
this would become a per-segment bitmap parquet, same protocol).

Stats note: like Lucene, deleted docs keep contributing to df/avgdl until
segments are rewritten — scoring drift is bounded and disappears at the
next rebuild.
"""

from __future__ import annotations

import json
import os

import numpy as np

_PATH = "tombstones.json"


def tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, _PATH)


def read_tombstones(index_dir: str) -> np.ndarray:
    p = tombstone_path(index_dir)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    with open(p) as f:
        return np.asarray(json.load(f)["doc_ids"], dtype=np.int64)


def _write(index_dir: str, ids: np.ndarray) -> None:
    p = tombstone_path(index_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"doc_ids": sorted(int(i) for i in ids)}, f)
    os.replace(tmp, p)


def delete_by_id(index_dir: str, doc_ids) -> int:
    """Add doc ids to the tombstone set; returns the new total."""
    cur = set(read_tombstones(index_dir).tolist())
    cur.update(int(d) for d in doc_ids)
    _write(index_dir, np.asarray(sorted(cur), dtype=np.int64))
    return len(cur)


def delete_by_url(index_dir: str, urls) -> int:
    """Resolve urls -> doc ids via segment doc tables, then tombstone."""
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "index.json")) as f:
        manifest = json.load(f)
    want = set(urls)
    ids = []
    for s in manifest["segments"]:
        d = pq.read_table(os.path.join(index_dir, s["dir"], "docs.parquet"),
                          columns=["doc_id", "url"])
        for did, u in zip(d["doc_id"].to_pylist(), d["url"].to_pylist()):
            if u in want:
                ids.append(did)
    return delete_by_id(index_dir, ids)


def delete_by_query(index_dir: str, text: str, max_docs: int = 1_000_000,
                    reader=None) -> int:
    """deleteByQuery: tombstone every doc matching the BM25 query terms."""
    from solr_ray.search.searcher import IndexReader

    r = reader or IndexReader(index_dir)
    ids, _ = r.search(text, max_docs)
    return delete_by_id(index_dir, ids.tolist())


def clear_tombstones(index_dir: str) -> None:
    p = tombstone_path(index_dir)
    if os.path.exists(p):
        os.remove(p)
