"""Top-k retrieval algorithms over compressed posting lists.

Two interchangeable strategies (verified identical in tests):

- ``taat_topk`` — exact term-at-a-time scoring: decode each query term's full
  posting list, accumulate BM25 into a dense per-segment score array with
  numpy. This is the throughput path for short lists / small segments.
- ``bmw_topk`` — document-at-a-time **block-max WAND** (Ding & Suel 2011,
  public; the mechanism Lucene uses for impact-based top-k skipping, invoked
  by the reference via TopScoreDocCollector —
  SolrIndexSearcher.java:1775-1794, QueryComponent.java:426-430): per-block
  impact bounds (codec block_max_tf / block_min_dl) let whole 128-posting
  blocks be skipped without decoding once the running top-k threshold
  exceeds their score bound.

Ties break by ascending doc_id — Lucene's collector rule — so "rank
identical" is well defined.
"""

from __future__ import annotations

import heapq

import numpy as np

from solr_ray.search.bm25 import B, K1
from solr_ray.stages.codec import varint_decode


def _order_topk(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """Sort candidates by (-score, doc_id) and truncate to k.

    The pre-cut keeps EVERY candidate whose score ties the k-th best —
    dropping boundary ties before the doc_id sort would break the
    deterministic tie-break (an argpartition[:m] slice is NOT safe: docs
    tied at the k-th score can land anywhere past the partition point).
    """
    if doc_ids.size == 0:
        return doc_ids, scores
    if doc_ids.size > k * 4 and k < doc_ids.size:
        kth_best = -np.partition(-scores, k - 1)[k - 1]
        keep = scores >= kth_best
        doc_ids, scores = doc_ids[keep], scores[keep]
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def taat_topk(
    postings: list[tuple[np.ndarray, np.ndarray, float]],
    dl: np.ndarray,
    doc_base: int,
    avgdl: float,
    k: int,
    k1: float = K1,
    b: float = B,
) -> tuple[np.ndarray, np.ndarray]:
    """postings: per query term [(local doc_ids... absolute ids, tfs, idf)].

    Accumulation order = the caller's term order (sorted unique query terms)
    — deterministic, shared with the oracle, so float sums are bit-equal.
    """
    acc = np.zeros(dl.size, dtype=np.float64)
    for ids, tfs, term_idf in postings:
        loc = ids - doc_base
        d = dl[loc].astype(np.float64)
        acc[loc] += term_idf * (tfs / (tfs + k1 * (1.0 - b + b * d / avgdl)))
    cand = np.flatnonzero(acc > 0.0)
    ids, sc = _order_topk(cand + doc_base, acc[cand], k)
    return ids, sc


def _decode_blocks(c: "PostingCursor", sel: np.ndarray):
    """Decode the selected (ascending) block indices of one posting list.

    Returns (absolute doc_ids int64, tfs int64) for exactly those blocks.
    Deltas chain across blocks, so each block's ids = block_last[prev] +
    cumsum(its deltas); a single flat cumsum with per-block correction
    vectorizes the whole multi-block decode.
    """
    from solr_ray.stages.codec import BLOCK_SIZE

    nb = c.n_blocks
    counts = np.where(sel == nb - 1,
                      c.df - BLOCK_SIZE * sel, BLOCK_SIZE).astype(np.int64)
    d_end = np.append(c.off_d[1:], len(c.enc_docs))
    t_end = np.append(c.off_t[1:], len(c.enc_tfs))
    if sel.size == nb:
        cat_d, cat_t = c.enc_docs, c.enc_tfs
    else:
        cat_d = b"".join(c.enc_docs[c.off_d[s]:d_end[s]] for s in sel.tolist())
        cat_t = b"".join(c.enc_tfs[c.off_t[s]:t_end[s]] for s in sel.tolist())
    total = int(counts.sum())
    deltas = varint_decode(cat_d, total)
    cs = np.cumsum(deltas.astype(np.int64))
    first_idx = np.zeros(sel.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=first_idx[1:])
    base = np.where(sel > 0, c.block_last[np.maximum(sel - 1, 0)], 0)
    prev_cs = np.where(first_idx > 0, cs[np.maximum(first_idx - 1, 0)], 0)
    ids = cs + np.repeat(base - prev_cs, counts)
    tfs = varint_decode(cat_t, total).astype(np.int64)
    return ids, tfs


def bmt_topk(
    cursors: list["PostingCursor"],
    dl: np.ndarray,
    doc_base: int,
    avgdl: float,
    k: int,
    k1: float = K1,
    b: float = B,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max term-at-a-time top-k — the vectorized impact-skipping path.

    Exactly taat_topk's results (rank AND bit-identical scores): terms are
    accumulated in descending max-impact order with whole 128-posting blocks
    pruned when max(acc over the block's doc range) + block_ub + (sum of
    remaining terms' max scores) < theta (the current k-th best partial
    score — a valid lower bound on the final k-th score, so pruned docs
    provably can't make top-k). Survivors are then RE-scored in term order
    over the decoded postings, which restores taat's float addition order
    bit-for-bit (the repo's oracle-equality invariant).
    """
    cursors = [c for c in cursors if not c.exhausted and c.df > 0]
    if not cursors:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    n = dl.size
    acc = np.zeros(n, dtype=np.float64)
    order = sorted(range(len(cursors)), key=lambda i: -cursors[i].max_score)
    suffix = np.zeros(len(order) + 1, dtype=np.float64)
    for j in range(len(order) - 1, -1, -1):
        suffix[j] = suffix[j + 1] + cursors[order[j]].max_score
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    theta = 0.0  # k-th best partial score seen so far (monotone lower bound)
    for pos, ci in enumerate(order):
        c = cursors[ci]
        rest = float(suffix[pos + 1])
        if theta > 0.0:
            starts = np.zeros(c.n_blocks, dtype=np.int64)
            if c.n_blocks > 1:
                starts[1:] = c.block_last[:-1] + 1 - doc_base
            mx = np.maximum.reduceat(acc, np.minimum(starts, n - 1))
            sel = np.flatnonzero(mx + c.block_ub + rest >= theta)
        else:
            sel = np.arange(c.n_blocks, dtype=np.int64)
        if sel.size == 0:
            continue
        ids, tfs = _decode_blocks(c, sel)
        loc = ids - doc_base
        d = dl[loc].astype(np.float64)
        acc[loc] += c.idf * (tfs / (tfs + k1 * (1.0 - b + b * d / avgdl)))
        decoded[c.ord] = (ids, tfs)
        # theta update from the docs just touched (their acc values are
        # lower bounds on final scores) — O(df) partition, never a dense
        # O(n_docs) pass
        if loc.size >= k:
            vals = acc[loc]
            kth = float(np.partition(vals, vals.size - k)[vals.size - k])
            if kth > theta:
                theta = kth

    cand = np.flatnonzero(acc > 0.0)
    if cand.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if cand.size > k:
        accc = acc[cand]
        kth = -np.partition(-accc, k - 1)[k - 1]
        cand = cand[accc >= kth]
    # exact rescore in term (ord) order — bit-identical to taat's sums
    sc = np.zeros(cand.size, dtype=np.float64)
    cand_abs = cand + doc_base
    d = dl[cand].astype(np.float64)
    norm = k1 * (1.0 - b + b * d / avgdl)
    for c in sorted(cursors, key=lambda c: c.ord):
        got = decoded.get(c.ord)
        if got is None:
            continue
        ids, tfs = got
        if ids.size == 0:
            continue
        j = np.minimum(np.searchsorted(ids, cand_abs), ids.size - 1)
        ok = ids[j] == cand_abs
        tf = tfs[j[ok]].astype(np.float64)
        sc[ok] += c.idf * (tf / (tf + norm[ok]))
    return _order_topk(cand_abs, sc, k)


class PostingCursor:
    """Block-addressable cursor over one term's compressed posting list."""

    __slots__ = (
        "enc_docs", "enc_tfs", "block_last", "off_d", "off_t", "df",
        "idf", "block_ub", "n_blocks", "bi", "ids", "tfs", "pos",
        "doc", "exhausted", "max_score", "ord",
    )

    def __init__(self, enc_docs, enc_tfs, block_last, off_d, off_t, df, term_idf, block_ub, ord: int = 0):
        self.ord = ord
        self.enc_docs = enc_docs
        self.enc_tfs = enc_tfs
        self.block_last = np.asarray(block_last, dtype=np.int64)
        self.off_d = np.asarray(off_d, dtype=np.int64)
        self.off_t = np.asarray(off_t, dtype=np.int64)
        self.df = int(df)
        self.idf = float(term_idf)
        self.block_ub = np.asarray(block_ub, dtype=np.float64)
        self.max_score = float(self.block_ub.max()) if self.block_ub.size else 0.0
        self.n_blocks = self.block_last.size
        self.bi = -1
        self.exhausted = False
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= self.n_blocks:
            self.exhausted = True
            self.doc = np.iinfo(np.int64).max
            return
        self.bi = bi
        d_end = self.off_d[bi + 1] if bi + 1 < self.n_blocks else len(self.enc_docs)
        t_end = self.off_t[bi + 1] if bi + 1 < self.n_blocks else len(self.enc_tfs)
        deltas = varint_decode(self.enc_docs[self.off_d[bi] : d_end])
        base = 0 if bi == 0 else int(self.block_last[bi - 1])
        self.ids = base + np.cumsum(deltas.astype(np.int64))
        self.tfs = varint_decode(self.enc_tfs[self.off_t[bi] : t_end]).astype(np.int64)
        self.pos = 0
        self.doc = int(self.ids[0])

    def next(self) -> None:
        self.pos += 1
        if self.pos >= self.ids.size:
            self._load_block(self.bi + 1)
        else:
            self.doc = int(self.ids[self.pos])

    def advance(self, target: int) -> None:
        """Move to the first doc >= target, skipping whole blocks."""
        if self.exhausted or self.doc >= target:
            return
        if target > int(self.block_last[-1]):
            self.exhausted = True
            self.doc = np.iinfo(np.int64).max
            return
        bi = int(np.searchsorted(self.block_last, target, side="left"))
        if bi != self.bi:
            self._load_block(bi)
            if self.doc >= target:
                return
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= self.ids.size:  # can't happen given block_last check
            self._load_block(self.bi + 1)
        else:
            self.doc = int(self.ids[self.pos])

    @property
    def tf(self) -> int:
        return int(self.tfs[self.pos])

    def current_block_ub(self) -> float:
        return float(self.block_ub[self.bi]) if not self.exhausted else 0.0

    def current_block_last(self) -> int:
        return int(self.block_last[self.bi]) if not self.exhausted else np.iinfo(np.int64).max


def bmw_topk(
    cursors: list[PostingCursor],
    dl: np.ndarray,
    doc_base: int,
    avgdl: float,
    k: int,
    k1: float = K1,
    b: float = B,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND top-k. Returns (doc_ids, scores) ordered like taat."""
    cursors = [c for c in cursors if not c.exhausted]
    # min-heap of (score, -doc_id): worst kept entry at heap[0]
    heap: list[tuple[float, int]] = []
    theta = 0.0

    def push(score: float, doc: int) -> None:
        nonlocal theta
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
            if len(heap) == k:
                theta = heap[0][0]
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
            theta = heap[0][0]

    INF = np.iinfo(np.int64).max
    while True:
        cursors = [c for c in cursors if not c.exhausted]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.doc)
        full = len(heap) >= k
        # --- pivot: first prefix whose sum of term max scores beats theta
        acc = 0.0
        pivot = -1
        for i, c in enumerate(cursors):
            acc += c.max_score
            if (acc > theta) if full else (acc > 0.0):
                pivot = i
                break
        if pivot < 0:
            break  # no remaining doc can beat the current top-k
        pivot_doc = cursors[pivot].doc
        # align the lead cursors on pivot_doc (they may jump past it)
        for c in cursors[: pivot + 1]:
            if c.doc < pivot_doc:
                c.advance(pivot_doc)
        at_pivot = [c for c in cursors if not c.exhausted and c.doc == pivot_doc]
        if not at_pivot:
            continue  # everything moved past pivot_doc: re-pivot
        # --- block-max refinement: within the current blocks (and before the
        # next cursor beyond the pivot), no doc can beat theta → skip blocks
        if full:
            block_acc = sum(c.current_block_ub() for c in at_pivot)
            if block_acc <= theta:
                boundary = min(c.current_block_last() for c in at_pivot)
                rest = [
                    c.doc for c in cursors
                    if not c.exhausted and c.doc > pivot_doc
                ]
                target = min(boundary + 1, min(rest) if rest else INF)
                target = max(target, pivot_doc + 1)
                for c in at_pivot:
                    c.advance(target)
                continue
        # --- full evaluation of pivot_doc
        d = float(dl[pivot_doc - doc_base])
        norm = k1 * (1.0 - b + b * d / avgdl)
        # sum in term order (cursor.ord) so float sums bit-match taat
        s = 0.0
        for c in sorted(at_pivot, key=lambda c: c.ord):
            tf = float(c.tf)
            s += c.idf * (tf / (tf + norm))
        push(s, pivot_doc)
        for c in at_pivot:
            c.next()

    if not heap:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    items = sorted(heap, key=lambda t: (-t[0], -t[1]))
    ids = np.array([-d for _, d in items], dtype=np.int64)
    sc = np.array([s for s, _ in items], dtype=np.float64)
    return ids, sc
