"""Deterministic, parallelism-invariant document identity.

The reference routes documents to shards by murmur3 hash of the unique key
(CompositeIdRouter.sliceHash —
solr/solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java:81,136-148)
and assigns per-segment-local docIDs. Here the unique key is ``url``; we
define the GLOBAL doc order as ``(bucket(url), hash64(url), url)`` where
``bucket = hash64(url) % num_buckets``:

- bucket  → which index partition (segment) owns the doc (the shuffle key);
- within a bucket, docs sort by url (segment.py:158; the SQL oracles rely
  on docID = rank of url within bucket) — deterministic, independent of
  Ray parallelism / block layout;
- doc_id = bucket_offset + local_rank, where bucket_offset is the exclusive
  prefix sum of bucket counts (a cheap url-column-only pre-pass).

So doc_ids are dense [0, N), contiguous per bucket, ascending with bucket id
— which makes cross-segment posting-list merge pure concatenation (SURVEY.md
§7 hard part 3). BM25 ties break by ascending doc_id, same rule as Lucene's
TopScoreDocCollector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# fixed key => deterministic across processes/machines (pandas siphash13)
_HASH_KEY = "solr_ray_docid_0"


def stable_hash64(values) -> np.ndarray:
    """Deterministic 64-bit hash of a string array (vectorized siphash)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def add_bucket(batch: pa.Table, key_col: str, num_buckets: int) -> pa.Table:
    """map_batches body: append h (uint64 hash) and bucket (int64) columns."""
    h = stable_hash64(batch[key_col])
    bucket = (h % np.uint64(num_buckets)).astype(np.int64)
    if "h" in batch.column_names:
        batch = batch.drop_columns(["h"])
    if "bucket" in batch.column_names:
        batch = batch.drop_columns(["bucket"])
    return batch.append_column("h", pa.array(h)).append_column(
        "bucket", pa.array(bucket)
    )
