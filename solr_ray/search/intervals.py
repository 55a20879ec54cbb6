"""Interval-function algebra with minimal-interval semantics.

Reference semantics: the Lucene intervals API surfaced through Solr's
query parsers (solr/core/src/java/org/apache/solr/search/
ComplexPhraseQParserPlugin.java:1 exposes positional composition;
org.apache.lucene.queries.intervals.Intervals defines the function set:
ordered / unordered / or / phrase / maxwidth / maxgaps / containing /
contained_by / not_containing / not_contained_by / overlapping /
non_overlapping / before / after). Algebra follows the minimal-interval
model of Clarke, Cormack & Burkowski (public literature): every operator
consumes and produces the MINIMAL list of matching intervals per document
— an interval is dropped when it properly contains another match, so
counts are canonical and composition is associative.

Encoding reuses the flat ``doc*mult + pos`` int64 keys of spans.py /
searcher's phrase matcher: an interval is a (start_key, end_key) pair in
one document; each node also carries the summed width of the leaf matches
inside it, so ``gaps = (end - start + 1) - inner_width`` is exact, which
is what maxgaps/phrase filter on.

Every operator is vectorized (searchsorted sweeps + accumulate-based
minimality filtering); nothing loops per document or per interval, and
work stays per-segment, so the operator distributes exactly like
phrase/span search: the actor-pool reader evaluates each segment it owns
and only (doc, tf) survivors leave the worker.

Invariant maintained throughout: a node's interval list is sorted by
start key, and within it start AND end keys are strictly increasing
(the defining property of a minimal list), which is what lets each
composite operator pick its optimal child interval with one searchsorted.

Unordered mode permits overlapping child intervals (modern Lucene
SpanNearQuery/unordered likewise); with overlap, inner_width can exceed
the window width and gaps go negative — maxgaps(g >= 0) then always
passes, same as Lucene's behavior for overlapping sub-iterators.
"""

from __future__ import annotations

import numpy as np

from solr_ray.search.spans import _clause_keys, expand_clause

_INT64_MAX = np.int64(np.iinfo(np.int64).max)
_EMPTY = (np.empty(0, np.int64), np.empty(0, np.int64),
          np.empty(0, np.int64))


class I:
    """Factory namespace for interval expressions (nested tuples).

    Leaves are terms or ``pre*`` prefix wildcards; a bare str anywhere a
    node is expected is promoted to a leaf.
    """

    @staticmethod
    def term(t: str):
        return ("term", t)

    @staticmethod
    def ordered(*xs):
        if len(xs) < 2:
            raise ValueError("ordered needs >= 2 sub-sources")
        return ("ordered", xs)

    @staticmethod
    def unordered(*xs):
        if len(xs) < 2:
            raise ValueError("unordered needs >= 2 sub-sources")
        return ("unordered", xs)

    @staticmethod
    def phrase(*xs):
        if len(xs) < 2:
            raise ValueError("phrase needs >= 2 sub-sources")
        return ("phrase", xs)

    @staticmethod
    def or_(*xs):
        if not xs:
            raise ValueError("or needs >= 1 sub-source")
        return ("or", xs)

    @staticmethod
    def maxwidth(x, width: int):
        return ("maxwidth", x, int(width))

    @staticmethod
    def maxgaps(x, gaps: int):
        return ("maxgaps", x, int(gaps))

    @staticmethod
    def containing(big, small):
        return ("containing", big, small)

    @staticmethod
    def contained_by(small, big):
        return ("contained_by", small, big)

    @staticmethod
    def not_containing(big, small):
        return ("not_containing", big, small)

    @staticmethod
    def not_contained_by(small, big):
        return ("not_contained_by", small, big)

    @staticmethod
    def overlapping(x, ref):
        return ("overlapping", x, ref)

    @staticmethod
    def non_overlapping(x, ref):
        return ("non_overlapping", x, ref)

    @staticmethod
    def before(x, ref):
        return ("before", x, ref)

    @staticmethod
    def after(x, ref):
        return ("after", x, ref)


def expr_terms(node) -> list[str]:
    """All leaf clauses in an expression (for df/idf bookkeeping)."""
    if isinstance(node, str):
        return [node]
    op = node[0]
    if op == "term":
        return [node[1]]
    if op in ("ordered", "unordered", "phrase", "or"):
        out = []
        for c in node[1]:
            out.extend(expr_terms(c))
        return out
    if op in ("maxwidth", "maxgaps"):
        return expr_terms(node[1])
    return expr_terms(node[1]) + expr_terms(node[2])


def _minimal(s, e, w):
    """Reduce to the minimal interval list: drop any interval that
    (non-strictly) contains a different one. Sorted by start; output
    start/end both strictly increasing."""
    if s.size == 0:
        return s, e, w
    order = np.lexsort((e, s))
    s, e, w = s[order], e[order], w[order]
    # exact duplicates first — otherwise the two rules below annihilate
    # BOTH copies (the suffix-min sees its own twin as a dominator);
    # e.g. or(x, x) must still yield x's intervals
    dup = np.zeros(s.size, dtype=bool)
    dup[1:] = (s[1:] == s[:-1]) & (e[1:] == e[:-1])
    if dup.any():
        s, e, w = s[~dup], e[~dup], w[~dup]
    keep = np.ones(s.size, dtype=bool)
    # equal starts: only the tightest (smallest end) survives
    keep[1:] &= s[1:] != s[:-1]
    # dominated by a later-starting interval with end <= ours (suffix min)
    suffmin = np.minimum.accumulate(e[::-1])[::-1]
    keep[:-1] &= suffmin[1:] > e[:-1]
    return s[keep], e[keep], w[keep]


def _eval_ordered(children, mult):
    s0, e0, w0 = children[0]
    if s0.size == 0:
        return _EMPTY
    cur_e = e0
    tot_w = w0.copy()
    valid = np.ones(s0.size, dtype=bool)
    for cs, ce, cw in children[1:]:
        if cs.size == 0:
            return _EMPTY
        # first child interval starting strictly after the chain's end:
        # minimal child lists make it also the one with the smallest end
        j = np.searchsorted(cs, cur_e, side="right")
        jj = np.minimum(j, cs.size - 1)
        ok = (j < cs.size) & ((cs[jj] // mult) == (cur_e // mult))
        valid &= ok
        cur_e = np.where(ok, ce[jj], cur_e)
        tot_w = tot_w + np.where(ok, cw[jj], 0)
    if not valid.any():
        return _EMPTY
    return _minimal(s0[valid], cur_e[valid], tot_w[valid])


def _eval_unordered(children, mult):
    if any(c[0].size == 0 for c in children):
        return _EMPTY
    # every minimal window's right edge is some child interval's end
    ends = np.unique(np.concatenate([c[1] for c in children]))
    win_s = np.full(ends.size, _INT64_MAX)
    tot_w = np.zeros(ends.size, np.int64)
    valid = np.ones(ends.size, dtype=bool)
    docs = ends // mult
    for cs, ce, cw in children:
        # latest child interval ending at or before the edge — largest
        # start among candidates because minimal lists rise in lockstep
        idx = np.searchsorted(ce, ends, side="right") - 1
        ii = np.maximum(idx, 0)
        ok = (idx >= 0) & ((ce[ii] // mult) == docs)
        valid &= ok
        win_s = np.minimum(win_s, np.where(ok, cs[ii], _INT64_MAX))
        tot_w += np.where(ok, cw[ii], 0)
    if not valid.any():
        return _EMPTY
    return _minimal(win_s[valid], ends[valid], tot_w[valid])


def _first_inside(xs, xe, s, e):
    """For each (s, e): does some (xs, xe) interval lie inside it?"""
    idx = np.searchsorted(xs, s, side="left")  # first x with start >= s
    ii = np.minimum(idx, xs.size - 1)
    return (idx < xs.size) & (xe[ii] <= e)


def _last_enclosing(xs, xe, s, e):
    """For each (s, e): does some (xs, xe) interval enclose it?"""
    idx = np.searchsorted(xs, s, side="right") - 1  # last x with start <= s
    ii = np.maximum(idx, 0)
    return (idx >= 0) & (xe[ii] >= e)


def _overlaps(xs, xe, s, e):
    """For each (s, e): does some (xs, xe) interval overlap it?
    Overlap = xs <= e and xe >= s; the last x starting at or before e has
    the largest end among that prefix, so one probe decides."""
    idx = np.searchsorted(xs, e, side="right") - 1
    ii = np.maximum(idx, 0)
    return (idx >= 0) & (xe[ii] >= s)


def _eval(seg, node, mult):
    if isinstance(node, str):
        node = ("term", node)
    op = node[0]
    if op == "term":
        keys = _clause_keys(seg, node[1], mult)
        return keys, keys, np.ones(keys.size, np.int64)
    if op == "ordered":
        return _eval_ordered([_eval(seg, c, mult) for c in node[1]], mult)
    if op == "unordered":
        return _eval_unordered([_eval(seg, c, mult) for c in node[1]], mult)
    if op == "phrase":
        s, e, w = _eval_ordered(
            [_eval(seg, c, mult) for c in node[1]], mult)
        good = (e - s + 1) == w  # zero gaps = consecutive blocks
        return s[good], e[good], w[good]
    if op == "or":
        parts = [_eval(seg, c, mult) for c in node[1]]
        return _minimal(np.concatenate([p[0] for p in parts]),
                        np.concatenate([p[1] for p in parts]),
                        np.concatenate([p[2] for p in parts]))
    if op == "maxwidth":
        s, e, w = _eval(seg, node[1], mult)
        good = (e - s + 1) <= node[2]
        return s[good], e[good], w[good]
    if op == "maxgaps":
        s, e, w = _eval(seg, node[1], mult)
        good = (e - s + 1) - w <= node[2]
        return s[good], e[good], w[good]
    # two-source filters: evaluate both sides, keep a subset of the first
    s, e, w = _eval(seg, node[1], mult)
    rs, re_, _rw = _eval(seg, node[2], mult)
    if s.size == 0:
        return _EMPTY
    if op in ("containing", "not_containing"):
        hit = (np.zeros(s.size, dtype=bool) if rs.size == 0
               else _first_inside(rs, re_, s, e))
        good = hit if op == "containing" else ~hit
    elif op in ("contained_by", "not_contained_by"):
        hit = (np.zeros(s.size, dtype=bool) if rs.size == 0
               else _last_enclosing(rs, re_, s, e))
        good = hit if op == "contained_by" else ~hit
    elif op in ("overlapping", "non_overlapping"):
        hit = (np.zeros(s.size, dtype=bool) if rs.size == 0
               else _overlaps(rs, re_, s, e))
        good = hit if op == "overlapping" else ~hit
    elif op == "before":
        if rs.size == 0:
            return _EMPTY
        # some reference interval starts strictly after our end, same doc
        j = np.searchsorted(rs, e, side="right")
        jj = np.minimum(j, rs.size - 1)
        good = (j < rs.size) & ((rs[jj] // mult) == (e // mult))
    elif op == "after":
        if rs.size == 0:
            return _EMPTY
        # some reference interval ends strictly before our start, same doc
        j = np.searchsorted(re_, s, side="left") - 1
        jj = np.maximum(j, 0)
        good = (j >= 0) & ((re_[jj] // mult) == (s // mult))
    else:
        raise ValueError(f"unknown interval op: {op}")
    return s[good], e[good], w[good]


def segment_intervals(seg, expr, mult=None):
    """Evaluate ``expr`` on one segment -> (start_keys, end_keys, widths).

    Mostly for tests/tools; search goes through interval_match."""
    if mult is None:
        mult = np.int64(int(seg.dl.max(initial=0)) + 2)
    return _eval(seg, expr, mult)


def interval_match(reader, expr):
    """(doc_ids, tfs) across all segments; tf = count of minimal
    intervals matching ``expr`` in the doc. Tombstoned docs excluded."""
    all_ids, all_tfs = [], []
    tomb = reader.tombstones
    for seg in reader.segments:
        mult = np.int64(int(seg.dl.max(initial=0)) + 2)
        s, _e, _w = _eval(seg, expr, mult)
        if s.size == 0:
            continue
        ids, tfs = np.unique(s // mult, return_counts=True)
        if tomb.size:
            live = ~np.isin(ids, tomb)
            ids, tfs = ids[live], tfs[live]
        if ids.size:
            all_ids.append(ids.astype(np.int64))
            all_tfs.append(tfs.astype(np.int64))
    if not all_ids:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(all_ids), np.concatenate(all_tfs)


def interval_search(reader, expr, k: int = 10):
    """Top-k docs by minimal-interval frequency (tf desc, docID asc)."""
    ids, tfs = interval_match(reader, expr)
    if ids.size == 0:
        return ids, tfs
    order = np.lexsort((ids, -tfs))[:k]
    return ids[order], tfs[order]


__all__ = ["I", "interval_match", "interval_search", "segment_intervals",
           "expr_terms", "expand_clause"]
