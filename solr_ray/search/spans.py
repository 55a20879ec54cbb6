"""Span / proximity queries with wildcard clause expansion.

Reference semantics: Lucene SpanNearQuery via Solr's surround and
complexphrase query parsers (solr/core/src/java/org/apache/solr/search/
ComplexPhraseQParserPlugin.java, SurroundQParserPlugin.java): each clause
is a term or a prefix wildcard (``pre*``); the query matches docs where one
occurrence of every clause appears within ``slop`` extra positions,
ordered (in_order=True, complexphrase "a* b"~n) or unordered (surround
``n``/``w`` operators; beyond 5 clauses the match routes through the
exact minimal-interval sweep of search/intervals.py).

Matching is fully vectorized on flat (doc, position) keys, the same
encoding the phrase matcher uses (searcher._segment_phrase_match):

- clause expansion: prefix -> bisect over the segment's sorted term
  dictionary; the clause's position lists union into ONE sorted key array.
- ordered: minimal-chain searchsorted sweep (p_i = smallest clause-i
  position strictly after p_{i-1}); match iff span extra <= slop.
- unordered (up to 5 clauses): anchor on clause 0, enumerate per-clause
  nearest-left/right combos (exact — an optimal window always uses a
  nearest occurrence); match iff min window span - (k-1) <= slop; tf
  counts the qualifying anchor positions. Beyond 5 clauses the 2^(k-1)
  enumeration gives way to I.maxgaps(I.unordered(...), slop) — same
  match set (gaps = window width - k on both sides); tf becomes the
  minimal-interval count.

Scoring is PhraseQuery-style BM25: tf = span frequency, idf = sum over
clauses of idf(union doc freq). Union dfs are exact across segments
(segments partition the doc space, so per-segment union dfs just add).
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np

from solr_ray.search.bm25 import idf as bm25_idf


def expand_clause(seg, clause: str) -> list[str]:
    """Clause -> matching terms in this segment ('pre*' -> prefix range)."""
    if clause.endswith("*"):
        pre = clause[:-1]
        lo = bisect_left(seg.terms, pre)
        hi = lo
        n = len(seg.terms)
        while hi < n and seg.terms[hi].startswith(pre):
            hi += 1
        return seg.terms[lo:hi]
    return [clause] if clause in seg.lookup else []


def _clause_keys(seg, clause: str, mult: np.int64):
    """Sorted doc*mult+pos keys of every occurrence of any clause term."""
    parts = []
    for t in expand_clause(seg, clause):
        got = seg.term_positions(t)
        if got is None:
            continue
        ids, tfs, pos = got
        parts.append(np.repeat(ids, tfs) * mult + pos.astype(np.int64))
    if not parts:
        return np.empty(0, np.int64)
    keys = np.concatenate(parts) if len(parts) > 1 else parts[0]
    keys.sort(kind="stable")
    return keys


def _ordered_matches(keys: list[np.ndarray], slop: int, mult: np.int64):
    """(doc_ids, span_tfs) via the minimal-chain sweep over clause keys."""
    start = keys[0]
    cur = start
    for k in keys[1:]:
        if start.size == 0 or k.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        j = np.searchsorted(k, cur, side="right")
        ok = j < k.size
        nxt = k[np.minimum(j, k.size - 1)]
        ok &= (nxt // mult) == (cur // mult)
        start, cur = start[ok], nxt[ok]
    if start.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    good = (cur - start) - np.int64(len(keys) - 1) <= slop
    if not good.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = start[good] // mult
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int64)


def _unordered_matches_2(ka: np.ndarray, kb: np.ndarray, slop: int,
                         mult: np.int64):
    """2-clause unordered near: |pa - pb| - 1 <= slop, same doc, pa != pb."""
    if ka.size == 0 or kb.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # nearest kb STRICTLY on each side of every ka occurrence (side='right'
    # for the right neighbor, so a kb at the identical position — clauses
    # matching the same token — never shadows the true neighbor)
    jl = np.searchsorted(kb, ka, side="left")
    jr = np.searchsorted(kb, ka, side="right")
    right = kb[np.minimum(jr, kb.size - 1)]
    left = kb[np.maximum(jl - 1, 0)]
    same_doc_r = (jr < kb.size) & ((right // mult) == (ka // mult))
    same_doc_l = (jl > 0) & ((left // mult) == (ka // mult))
    dr = np.where(same_doc_r, right - ka, np.iinfo(np.int64).max)
    dl_ = np.where(same_doc_l, ka - left, np.iinfo(np.int64).max)
    gap = np.minimum(dr, dl_)
    good = (gap - 1 <= slop) & (gap < np.iinfo(np.int64).max)
    if not good.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = ka[good] // mult
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int64)


def _unordered_matches_k(keys: list[np.ndarray], slop: int, mult: np.int64):
    """k-clause unordered near (k <= 5): anchor on clause 0; for every
    other clause take its nearest occurrence left/right of the anchor and
    enumerate the 2^(k-1) left/right combos — an optimal covering window
    always uses a per-clause nearest occurrence, so the enumeration is
    exact UNDER THESE SEMANTICS: each non-anchor clause binds a position
    strictly different from the anchor's, but two non-anchor clauses MAY
    bind the same position when they overlap lexically (modern Lucene
    SpanNearQuery likewise permits overlapping spans in unordered mode).
    Match iff min over combos of (window span) - (k-1) <= slop.
    tf counts qualifying anchor positions."""
    import itertools

    n_other = len(keys) - 1
    if n_other + 1 > 5:
        raise ValueError("unordered span supports at most 5 clauses")
    anchor = keys[0]
    if anchor.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    INF = np.int64(np.iinfo(np.int64).max // 4)
    NEG = -INF
    lefts, rights = [], []
    for kk in keys[1:]:
        jl = np.searchsorted(kk, anchor, side="left")
        jr = np.searchsorted(kk, anchor, side="right")
        # kk[jl-1] < anchor and kk[jr] > anchor STRICTLY, so clauses that
        # match the same token position never shadow a real neighbor
        r = kk[np.minimum(jr, kk.size - 1)]
        l_ = kk[np.maximum(jl - 1, 0)]
        ok_r = (jr < kk.size) & ((r // mult) == (anchor // mult))
        ok_l = (jl > 0) & ((l_ // mult) == (anchor // mult))
        rights.append(np.where(ok_r, r, INF))
        lefts.append(np.where(ok_l, l_, NEG))
    best = np.full(anchor.size, INF)
    for combo in itertools.product((0, 1), repeat=n_other):
        lo = anchor.copy()
        hi = anchor.copy()
        valid = np.ones(anchor.size, dtype=bool)
        for ci, side in enumerate(combo):
            q = rights[ci] if side else lefts[ci]
            valid &= (q != INF) & (q != NEG)
            lo = np.minimum(lo, q)
            hi = np.maximum(hi, q)
        span = np.where(valid, hi - lo, INF)
        best = np.minimum(best, span)
    good = best - np.int64(len(keys) - 1) <= slop
    if not good.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = anchor[good] // mult
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int64)


def span_near_search(reader, clauses: list[str], slop: int, k: int = 10,
                     in_order: bool = True):
    """Top-k docs for a SpanNear over term/prefix clauses.

    reader: searcher.IndexReader over an index built with
    store_positions=True. Returns (doc_ids, scores) like phrase_search.
    """
    if len(clauses) < 2:
        raise ValueError("span_near_search needs >= 2 clauses")
    use_intervals = not in_order and len(clauses) > 5
    if use_intervals:
        # anchor-combo enumeration is 2^(k-1); beyond 5 clauses route
        # through the exact O(n·k) minimal-interval edge sweep
        # (search/intervals.py — Lucene's modern replacement for spans).
        # Match SET is identical; tf = minimal-interval count (the
        # intervals contract) instead of anchor-span count.
        from solr_ray.search.intervals import I, segment_intervals

        iexpr = I.maxgaps(I.unordered(*clauses), slop)

    # pass 1 (one decode per segment): matches + exact union dfs. Only the
    # tiny per-segment MATCH arrays are retained — the decoded position
    # keys die with each loop iteration, so memory stays O(matches), not
    # O(total clause postings). The global idf (needing every segment's df
    # contribution) prices the matches in pass 2.
    union_df = np.zeros(len(clauses), dtype=np.int64)
    tomb = reader.tombstones
    matches = []  # (seg, ids, tfs)
    for seg in reader.segments:
        mult = np.int64(int(seg.dl.max(initial=0)) + len(clauses) + 2)
        keys = [_clause_keys(seg, c, mult) for c in clauses]
        for ci, kk in enumerate(keys):
            if kk.size:
                union_df[ci] += np.unique(kk // mult).size
        if any(kk.size == 0 for kk in keys):
            continue
        if use_intervals:
            s, _e, _w = segment_intervals(seg, iexpr)
            imult = np.int64(int(seg.dl.max(initial=0)) + 2)
            ids, tfs = (np.unique(s // imult, return_counts=True)
                        if s.size else (np.empty(0, np.int64),
                                        np.empty(0, np.int64)))
        elif in_order:
            ids, tfs = _ordered_matches(keys, slop, mult)
        elif len(keys) == 2:
            ids, tfs = _unordered_matches_2(keys[0], keys[1], slop, mult)
        else:
            ids, tfs = _unordered_matches_k(keys, slop, mult)
        if ids.size == 0:
            continue
        if tomb.size:
            live = ~np.isin(ids, tomb)
            ids, tfs = ids[live], tfs[live]
        if ids.size:
            matches.append((seg, ids, tfs))
    if (union_df == 0).any() or not matches:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    span_idf = float(sum(
        bm25_idf(int(df), reader.n_docs) for df in union_df))

    all_ids, all_sc = [], []
    for seg, ids, tfs in matches:
        tfs = tfs.astype(np.float64)
        d = seg.dl[ids - seg.doc_base].astype(np.float64)
        sc = span_idf * (tfs / (tfs + reader.k1 * (
            1.0 - reader.b + reader.b * d / reader.avgdl)))
        all_ids.append(ids)
        all_sc.append(sc)
    ids = np.concatenate(all_ids)
    sc = np.concatenate(all_sc)
    order = np.lexsort((ids, -sc))[:k]
    return ids[order], sc[order]
