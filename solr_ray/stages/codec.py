"""Posting-list compression: delta + varint (FOR/PForDelta-style) blocks.

Mirrors the layout role of the Lucene90 postings format the reference
delegates to (codec selection at
solr/core/src/java/org/apache/solr/core/SchemaCodecFactory.java:100-119;
Lucene encodes doc deltas in blocks of 128 with skip data and per-block
impacts): doc_ids are delta-encoded then LEB128-varint packed; tfs varint
packed; per logical block of 128 postings we keep
``block_last_doc`` (skip pointer), ``block_max_tf`` and ``block_min_dl``
(impact bounds for block-max WAND — score in a block is bounded by
bm25(block_max_tf, block_min_dl), since BM25 is monotone increasing in tf and
decreasing in dl).

Everything is numpy-vectorized — no per-integer Python loops (encode writes
byte-planes, decode peels continuation bytes with at most 10 masked passes).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized (shares the bandwidth-lean
    kernel with the segment builder: one searchsorted pass for byte counts,
    uint32 arithmetic when values allow, unmasked first byte)."""
    from solr_ray.stages.segment import _varint_encode_flat, _varint_nbytes

    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return _varint_encode_flat(v, _varint_nbytes(v)).tobytes()


def varint_decode(buf, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes (bytes or uint8 ndarray) back to uint64,
    vectorized."""
    b = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    n = ends.size
    if count is not None and n != count:
        raise ValueError(f"varint stream has {n} values, expected {count}")
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(n, dtype=np.uint64)
    pos = starts.copy()
    active = np.arange(n)
    k = 0
    while active.size:
        p = pos[active]
        vals[active] |= (b[p] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
        still = p < ends[active]
        pos[active] += 1
        active = active[still]
        k += 1
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Ascending int array -> [first, gaps...] (uint64)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint64)
    d = np.empty(a.size, dtype=np.int64)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    if a.size > 1 and d[1:].min() < 0:
        raise ValueError("doc_ids must be ascending")
    return d.astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64))


def encode_posting(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> dict:
    """One term's posting list (doc_ids ascending) -> compressed columns.

    dls = doc length per posting (same order), used only for block impact
    bounds; lengths live in the segment's doclens table.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = doc_ids.size
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    pad = n_blocks * BLOCK_SIZE - n
    last = doc_ids[BLOCK_SIZE - 1 :: BLOCK_SIZE]
    if last.size < n_blocks:
        last = np.append(last, doc_ids[-1])
    tf_pad = np.pad(tfs, (0, pad), constant_values=0)
    dl_pad = np.pad(
        np.ascontiguousarray(dls, dtype=np.int64), (0, pad),
        constant_values=np.iinfo(np.int64).max,
    )
    return {
        "df": n,
        "cf": int(tfs.sum()),
        "doc_ids_delta_varint": varint_encode(delta_encode(doc_ids)),
        "tfs_varint": varint_encode(tfs.astype(np.uint64)),
        "block_last_doc": last.astype(np.int64),
        "block_max_tf": tf_pad.reshape(n_blocks, BLOCK_SIZE).max(axis=1).astype(np.int32),
        "block_min_dl": np.minimum(
            dl_pad.reshape(n_blocks, BLOCK_SIZE).min(axis=1),
            np.int64(np.iinfo(np.int32).max),
        ).astype(np.int32),
    }


def decode_posting(row: dict) -> tuple[np.ndarray, np.ndarray]:
    """Compressed columns -> (doc_ids ascending int64, tfs int64)."""
    ids = delta_decode(varint_decode(row["doc_ids_delta_varint"], row["df"]))
    tfs = varint_decode(row["tfs_varint"], row["df"]).astype(np.int64)
    return ids, tfs
