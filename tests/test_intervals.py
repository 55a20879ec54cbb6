"""Interval-function algebra tests vs a brute-force enumeration oracle."""

import itertools
import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from solr_ray.search.intervals import I


# ---------------------------------------------------------------- oracle

def _brute_minimal(ivs):
    """Drop every interval that (non-strictly) contains a different one."""
    out = set()
    for s, e in ivs:
        if not any((s2, e2) != (s, e) and s2 >= s and e2 <= e
                   for s2, e2 in ivs):
            out.add((s, e))
    return out


def _brute(toks, node):
    """Minimal (start, end) set for node over one doc's token list."""
    if isinstance(node, str):
        node = ("term", node)
    op = node[0]
    if op == "term":
        t = node[1]
        if t.endswith("*"):
            pre = t[:-1]
            return {(i, i) for i, x in enumerate(toks) if x.startswith(pre)}
        return {(i, i) for i, x in enumerate(toks) if x == t}
    if op in ("ordered", "phrase"):
        kids = [sorted(_brute(toks, c)) for c in node[1]]
        cand = set()
        for combo in itertools.product(*kids):
            ok = all(combo[i + 1][0] > combo[i][1]
                     for i in range(len(combo) - 1))
            if op == "phrase":
                ok = all(combo[i + 1][0] == combo[i][1] + 1
                         for i in range(len(combo) - 1))
            if ok:
                cand.add((combo[0][0], combo[-1][1]))
        return _brute_minimal(cand)
    if op == "unordered":
        kids = [sorted(_brute(toks, c)) for c in node[1]]
        cand = set()
        for combo in itertools.product(*kids):
            s = min(c[0] for c in combo)
            e = max(c[1] for c in combo)
            cand.add((s, e))
        return _brute_minimal(cand)
    if op == "or":
        cand = set()
        for c in node[1]:
            cand |= _brute(toks, c)
        return _brute_minimal(cand)
    if op == "maxwidth":
        return {(s, e) for s, e in _brute(toks, node[1])
                if e - s + 1 <= node[2]}
    if op == "maxgaps":
        # leaf-children only in tests: inner width == clause count
        k = len(node[1][1])
        return {(s, e) for s, e in _brute(toks, node[1])
                if (e - s + 1) - k <= node[2]}
    a = _brute(toks, node[1])
    b = _brute(toks, node[2])
    if op == "containing":
        return {(s, e) for s, e in a
                if any(s2 >= s and e2 <= e for s2, e2 in b)}
    if op == "not_containing":
        return {(s, e) for s, e in a
                if not any(s2 >= s and e2 <= e for s2, e2 in b)}
    if op == "contained_by":
        return {(s, e) for s, e in a
                if any(s2 <= s and e2 >= e for s2, e2 in b)}
    if op == "not_contained_by":
        return {(s, e) for s, e in a
                if not any(s2 <= s and e2 >= e for s2, e2 in b)}
    if op == "overlapping":
        return {(s, e) for s, e in a
                if any(s2 <= e and e2 >= s for s2, e2 in b)}
    if op == "non_overlapping":
        return {(s, e) for s, e in a
                if not any(s2 <= e and e2 >= s for s2, e2 in b)}
    if op == "before":
        return {(s, e) for s, e in a if any(s2 > e for s2, e2 in b)}
    if op == "after":
        return {(s, e) for s, e in a if any(e2 < s for s2, e2 in b)}
    raise ValueError(op)


# -------------------------------------------------------------- fixtures

VOCAB = ["red", "blue", "green", "gold", "gray", "redish", "pink"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    rng = random.Random(42)
    texts = [" ".join(rng.choice(VOCAB)
                      for _ in range(rng.randint(3, 30)))
             for _ in range(60)]
    urls = [f"https://p/{i:04d}" for i in range(len(texts))]
    t = pa.table({"url": pa.array(urls), "text": pa.array(texts)})
    out = str(tmp_path_factory.mktemp("iv") / "idx")
    build_index(ray.data.from_arrow(t), out, analyzer="whitespace",
                num_buckets=2, text_source="text", store_positions=True)
    return IndexReader(out), {u: txt.split() for u, txt in zip(urls, texts)}


def _engine_sets(reader, expr):
    """url -> set of (start, end) positions from the engine."""
    from solr_ray.search.intervals import segment_intervals

    out = {}
    for seg in reader.segments:
        mult = np.int64(int(seg.dl.max(initial=0)) + 2)
        s, e, _w = segment_intervals(seg, expr, mult)
        for sk, ek in zip(s.tolist(), e.tolist()):
            url = reader.url_of(int(sk // mult))
            out.setdefault(url, set()).add(
                (int(sk % mult), int(ek % mult)))
    return out


EXPRS = [
    I.ordered("red", "blue"),
    I.ordered("red", "blue", "green"),
    I.unordered("red", "blue"),
    I.unordered("red", "blue", "green"),
    I.unordered("red", "blue", "green", "gold", "gray", "pink"),
    I.phrase("red", "blue"),
    I.maxwidth(I.unordered("red", "green"), 4),
    I.maxgaps(I.unordered("red", "blue", "green"), 2),
    I.maxgaps(I.ordered("blue", "green"), 1),
    I.or_(I.phrase("red", "blue"), I.phrase("blue", "green")),
    I.ordered(I.or_("red", "pink"), "blue"),
    I.containing(I.unordered("red", "green"), "blue"),
    I.not_containing(I.unordered("red", "green"), "blue"),
    I.contained_by("gold", I.maxwidth(I.unordered("red", "green"), 6)),
    I.not_contained_by("gold", I.unordered("red", "green")),
    I.overlapping(I.unordered("red", "blue"), I.unordered("green", "gold")),
    I.non_overlapping(I.unordered("red", "blue"), I.phrase("green", "gold")),
    I.before("red", "green"),
    I.after("red", "green"),
    I.ordered("red*", "blue"),
    I.unordered("red*", "green", "gold"),
    I.maxwidth(I.ordered(I.unordered("red", "blue"), "green"), 7),
]


@pytest.mark.parametrize("idx", range(len(EXPRS)))
def test_algebra_vs_bruteforce(corpus, idx):
    reader, docs = corpus
    expr = EXPRS[idx]
    got = _engine_sets(reader, expr)
    want = {u: _brute(toks, expr) for u, toks in docs.items()}
    want = {u: s for u, s in want.items() if s}
    assert got == want, f"expr #{idx} {expr}"


def test_interval_search_ranking(corpus):
    from solr_ray.search.intervals import interval_match, interval_search

    reader, docs = corpus
    expr = I.unordered("red", "blue")
    ids, tfs = interval_match(reader, expr)
    want = {u: len(_brute(toks, expr)) for u, toks in docs.items()}
    want = {u: n for u, n in want.items() if n}
    got = {reader.url_of(int(d)): int(t) for d, t in zip(ids, tfs)}
    assert got == want
    top_ids, top_tfs = interval_search(reader, expr, k=5)
    assert len(top_ids) == 5
    assert list(top_tfs) == sorted(tfs.tolist(), reverse=True)[:5]
    # tie-break: doc asc within equal tf
    pairs = list(zip(top_tfs.tolist(), top_ids.tolist()))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_empty_and_unknown_terms(corpus):
    from solr_ray.search.intervals import interval_match

    reader, _ = corpus
    ids, _tfs = interval_match(reader, I.ordered("zzz", "red"))
    assert ids.size == 0
    ids, _tfs = interval_match(
        reader, I.containing(I.unordered("red", "blue"), "zzz"))
    assert ids.size == 0


def test_unordered_many_clauses_exact(corpus):
    """6-clause unordered — beyond span_near's 5-clause cap — stays exact
    because the edge-sweep is O(n·k), not O(2^k)."""
    reader, docs = corpus
    expr = I.unordered("red", "blue", "green", "gold", "gray", "pink")
    got = _engine_sets(reader, expr)
    want = {u: _brute(toks, expr) for u, toks in docs.items()}
    want = {u: s for u, s in want.items() if s}
    assert got == want
