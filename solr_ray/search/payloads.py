"""Payload queries over delimited-payload indexes.

Reference semantics: Solr's payload query parsers
(solr/core/src/java/org/apache/solr/search/PayloadScoreQParserPlugin.java:36,
PayloadCheckQParserPlugin.java:40) over fields analyzed with
DelimitedPayloadTokenFilter — every token occurrence carries a float
payload; payload_score aggregates a term's payloads per document
(func = sum | max | min | avg, the PayloadFunction set), payload_check
matches an exact phrase whose occurrence payloads equal the given values.

Index side: ``build_index(..., analyzer="whitespace",
store_positions=True, payload_delimiter="|")`` stores a float32 payload
stream parallel to the position stream (stages/segment.py). Query side is
vectorized per segment: payload slices per doc come from one
``np.*.reduceat`` over the tf-offsets; phrase chains are searchsorted
adjacency on flat doc*mult+pos keys (same encoding as spans/intervals).

Scoring: payload_score returns func(payloads) itself as the score
(Solr's default, includeSpanScore=false); payload_check returns the count
of matching chains as tf. Both rank (score desc, docID asc).
"""

from __future__ import annotations

import numpy as np


_REDUCERS = {
    "sum": np.add.reduceat,
    "max": np.maximum.reduceat,
    "min": np.minimum.reduceat,
}


def payload_score(reader, term: str, func: str = "sum", k: int = 10):
    """Top-k (doc_ids, scores) by per-doc payload aggregate of ``term``."""
    if func not in ("sum", "max", "min", "avg"):
        raise ValueError(f"unknown payload func: {func}")
    tomb = reader.tombstones
    all_ids, all_sc = [], []
    for seg in reader.segments:
        got = seg.term_payloads(term)
        if got is None:
            continue
        ids, tfs, _pos, payl = got
        if ids.size == 0:
            continue
        offs = np.zeros(ids.size, dtype=np.int64)
        np.cumsum(tfs[:-1], out=offs[1:])
        p64 = payl.astype(np.float64)
        if func == "avg":
            sc = np.add.reduceat(p64, offs) / tfs.astype(np.float64)
        else:
            sc = _REDUCERS[func](p64, offs)
        if tomb.size:
            live = ~np.isin(ids, tomb)
            ids, sc = ids[live], sc[live]
        all_ids.append(ids.astype(np.int64))
        all_sc.append(sc)
    if not all_ids:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    ids = np.concatenate(all_ids)
    sc = np.concatenate(all_sc)
    order = np.lexsort((ids, -sc))[:k]
    return ids[order], sc[order]


def payload_check(reader, terms: list[str], payloads: list[float | None],
                  k: int = 10):
    """Docs where the exact phrase ``terms`` occurs with occurrence i's
    payload == payloads[i] (None = unconstrained). Returns top-k
    (doc_ids, tfs) with tf = matching chain count, (tf desc, docID asc)."""
    if len(payloads) != len(terms):
        raise ValueError("payloads must parallel terms (use None to skip)")
    tomb = reader.tombstones
    all_ids, all_tfs = [], []
    for seg in reader.segments:
        mult = np.int64(int(seg.dl.max(initial=0)) + 2)
        keys = []
        for t, want in zip(terms, payloads):
            got = seg.term_payloads(t)
            if got is None:
                keys = None
                break
            ids, tfs, pos, payl = got
            kk = (np.repeat(ids, tfs).astype(np.int64) * mult
                  + pos.astype(np.int64))
            if want is not None:
                kk = kk[payl == np.float32(want)]
            keys.append(kk)  # sorted: (doc, pos) order from the index
        if keys is None or any(x.size == 0 for x in keys):
            continue
        # adjacency chain: occurrence of clause i+1 at exactly pos+1
        cur = keys[0]
        for nxt in keys[1:]:
            idx = np.searchsorted(nxt, cur + 1)
            ok = idx < nxt.size
            ok[ok] &= nxt[idx[ok]] == cur[ok] + 1
            cur = cur[ok] + 1
            if cur.size == 0:
                break
        if cur.size == 0:
            continue
        docs, tf = np.unique(cur // mult, return_counts=True)
        if tomb.size:
            live = ~np.isin(docs, tomb)
            docs, tf = docs[live], tf[live]
        if docs.size:
            all_ids.append(docs.astype(np.int64))
            all_tfs.append(tf.astype(np.int64))
    if not all_ids:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ids = np.concatenate(all_ids)
    tfs = np.concatenate(all_tfs)
    order = np.lexsort((ids, -tfs))[:k]
    return ids[order], tfs[order]


__all__ = ["payload_score", "payload_check"]
