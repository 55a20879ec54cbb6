"""Term positions + phrase query tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _mk_pages(texts):
    urls = [f"https://p/{i:04d}" for i in range(len(texts))]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


@pytest.fixture(scope="module")
def pos_idx(tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index

    texts = [
        "alpha beta gamma delta",          # has "alpha beta" and "beta gamma"
        "beta alpha beta gamma",           # "beta gamma" once, "alpha beta" once
        "gamma beta alpha",                # reversed only
        "alpha beta alpha beta",           # "alpha beta" twice
        "unrelated words here entirely",
    ]
    out = str(tmp_path_factory.mktemp("pos") / "idx")
    build_index(ray.data.from_arrow(_mk_pages(texts)), out,
                analyzer="whitespace", num_buckets=2, text_source="text",
                store_positions=True)
    return out


def test_phrase_exact_matches(pos_idx):
    from solr_ray.search.searcher import IndexReader

    r = IndexReader(pos_idx)
    ids, sc = r.phrase_search("alpha beta", 10)
    urls = [r.url_of(int(d)) for d in ids]
    assert set(urls) == {"https://p/0000", "https://p/0001", "https://p/0003"}
    # doc 3 has phrase tf=2 -> highest score
    assert r.url_of(int(ids[0])) == "https://p/0003"

    ids2, _ = r.phrase_search("beta gamma", 10)
    assert {r.url_of(int(d)) for d in ids2} == \
        {"https://p/0000", "https://p/0001"}

    ids3, _ = r.phrase_search("gamma alpha", 10)
    assert len(ids3) == 0  # never adjacent in order


def test_phrase_three_terms(pos_idx):
    from solr_ray.search.searcher import IndexReader

    r = IndexReader(pos_idx)
    ids, _ = r.phrase_search("alpha beta gamma", 10)
    # doc 1 "beta alpha beta gamma" contains the phrase at positions 1-3
    assert {r.url_of(int(d)) for d in ids} == \
        {"https://p/0000", "https://p/0001"}


def test_phrase_lazy_reader_identical(pos_idx):
    from solr_ray.search.searcher import IndexReader

    eager = IndexReader(pos_idx)
    lazy = IndexReader(pos_idx, lazy=True)
    for q in ("alpha beta", "beta gamma", "alpha beta gamma"):
        a = eager.phrase_search(q, 10)
        b = lazy.phrase_search(q, 10)
        assert a[0].tolist() == b[0].tolist()
        assert a[1].tolist() == b[1].tolist()


def test_phrase_survives_merge(pos_idx):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.stages.merge import merge_index

    r = IndexReader(pos_idx)
    pre = {q: r.phrase_search(q, 10)
           for q in ("alpha beta", "beta gamma", "alpha beta gamma")}
    man = merge_index(pos_idx, merge_factor=4)
    assert len(man["segments"]) == 1
    r2 = IndexReader(pos_idx)
    for q, (ids, sc) in pre.items():
        i2, s2 = r2.phrase_search(q, 10)
        assert i2.tolist() == ids.tolist(), q
        assert s2.tolist() == sc.tolist(), q


def test_phrase_requires_positions(pages_300_path, tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    out = str(tmp_path / "nopos")
    build_index(pages_300_path, out, analyzer="text_en", num_buckets=2)
    r = IndexReader(out)
    t1, t2 = sorted(r.global_df)[:2]
    with pytest.raises(ValueError, match="store_positions"):
        r.phrase_search(f"{t1} {t2}", 5)


def test_regular_search_unaffected_by_positions(pos_idx):
    from solr_ray.search.searcher import IndexReader

    r = IndexReader(pos_idx)
    ids, sc = r.search("alpha gamma", 10)
    assert len(ids) == 4  # all docs containing alpha or gamma


def test_sloppy_phrase(tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    texts = [
        "alpha beta",            # slop 0 ok
        "alpha x beta",          # gap 1 -> slop >= 1
        "alpha x y beta",        # gap 2 -> slop >= 2
        "beta alpha",            # reversed: never (ordered chains only)
        "alpha alpha x beta",    # chain from 2nd alpha needs slop 1
    ]
    out = str(tmp_path / "slop_idx")
    build_index(ray.data.from_arrow(_mk_pages(texts)), out,
                analyzer="whitespace", num_buckets=1, text_source="text",
                store_positions=True)
    r = IndexReader(out)

    def urls(q, slop):
        ids, _ = r.phrase_search(q, 10, slop=slop)
        return {r.url_of(int(d)) for d in ids}

    assert urls("alpha beta", 0) == {"https://p/0000"}
    assert urls("alpha beta", 1) == {"https://p/0000", "https://p/0001",
                                     "https://p/0004"}
    assert urls("alpha beta", 2) == {"https://p/0000", "https://p/0001",
                                     "https://p/0002", "https://p/0004"}


@pytest.fixture(scope="module")
def span_idx(tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index

    texts = [
        "apple banana cherry",            # ap* .. cherry ordered, gap 1
        "apricot melon melon cherry",     # ap* ... cherry ordered, gap 2
        "cherry apple",                   # reversed (unordered only)
        "apple melon melon melon cherry", # gap 3 (outside slop=2 ordered)
        "plum pear quince",               # no match
    ]
    out = str(tmp_path_factory.mktemp("span") / "idx")
    build_index(ray.data.from_arrow(_mk_pages(texts)), out,
                analyzer="whitespace", num_buckets=2, text_source="text",
                store_positions=True)
    return out


def test_span_wildcard_expansion(span_idx):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.spans import expand_clause

    r = IndexReader(span_idx)
    terms = set()
    for seg in r.segments:
        terms.update(expand_clause(seg, "ap*"))
    assert terms == {"apple", "apricot"}
    assert expand_clause(r.segments[0], "nosuch*") == []


def test_span_ordered(span_idx):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.spans import span_near_search

    r = IndexReader(span_idx)
    ids, sc = span_near_search(r, ["ap*", "cherry"], slop=2, k=10,
                               in_order=True)
    docs = {int(r.url_of(int(d)).rsplit("/", 1)[1]) for d in ids}
    assert docs == {0, 1}                # doc 2 reversed, doc 3 gap 3
    assert (np.diff(sc) <= 0).all()


def test_span_unordered(span_idx):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.spans import span_near_search

    r = IndexReader(span_idx)
    ids, _ = span_near_search(r, ["ap*", "cherry"], slop=2, k=10,
                              in_order=False)
    docs = {int(r.url_of(int(d)).rsplit("/", 1)[1]) for d in ids}
    assert docs == {0, 1, 2}             # reversed doc 2 now matches


def test_span_errors(span_idx):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.spans import span_near_search

    r = IndexReader(span_idx)
    with pytest.raises(ValueError):
        span_near_search(r, ["one"], slop=1)
    ids, sc = span_near_search(r, ["zz*", "cherry"], slop=1)
    assert ids.size == 0
    # >5 unordered clauses no longer raise: they route through the exact
    # minimal-interval sweep (absent terms -> empty, no crash)
    ids6, _ = span_near_search(r, list("abcdef"), slop=1, in_order=False)
    assert ids6.size == 0


def test_span_unordered_three_clauses(span_idx):
    """k=3 unordered vs a brute-force window check on the planted corpus."""
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.spans import span_near_search

    r = IndexReader(span_idx)
    texts = {
        0: "apple banana cherry",
        1: "apricot melon melon cherry",
        2: "cherry apple",
        3: "apple melon melon melon cherry",
        4: "plum pear quince",
    }

    def brute(clauses, slop):
        out = set()
        for did, text in texts.items():
            toks = text.split()
            poss = []
            for c in clauses:
                pre = c[:-1] if c.endswith("*") else None
                p = [i for i, t in enumerate(toks)
                     if (t.startswith(pre) if pre else t == c)]
                poss.append(p)
            if any(not p for p in poss):
                continue
            import itertools
            for combo in itertools.product(*poss):
                # engine semantics: non-anchor clauses must differ from the
                # ANCHOR position; they may coincide with each other
                if any(p == combo[0] for p in combo[1:]):
                    continue
                if (max(combo) - min(combo)) - (len(clauses) - 1) <= slop:
                    out.add(did)
                    break
        return out

    for clauses, slop in ([["ap*", "melon", "cherry"], 2],
                          [["ap*", "melon", "cherry"], 0],
                          [["apple", "banana", "cherry"], 0],
                          [["cherry", "apple", "melon"], 5]):
        ids, _ = span_near_search(r, clauses, slop=slop, k=10,
                                  in_order=False)
        got = {int(r.url_of(int(d)).rsplit("/", 1)[1]) for d in ids}
        assert got == brute(clauses, slop), (clauses, slop, got)


def test_span_unordered_six_clauses(tmp_path):
    """>5-clause unordered spans route through the minimal-interval sweep:
    match set == a brute-force any-order window check."""
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader
    from solr_ray.search.spans import span_near_search

    texts = [
        "a b c d e f",            # width 6, gaps 0 -> matches slop 0+
        "a x b c d e x x f",      # gaps 3 -> matches slop >= 3
        "f e d c b a",            # reversed, gaps 0
        "a b c d e",              # missing f
        "a b c d e x x x x x f",  # gaps 5 -> matches slop >= 5
    ]
    out = str(tmp_path / "idx6")
    build_index(ray.data.from_arrow(_mk_pages(texts)), out,
                analyzer="whitespace", num_buckets=2, text_source="text",
                store_positions=True)
    r = IndexReader(out)
    clauses = list("abcdef")
    for slop, expect in [(0, {0, 2}), (3, {0, 1, 2}), (5, {0, 1, 2, 4})]:
        ids, sc = span_near_search(r, clauses, slop=slop, k=10,
                                   in_order=False)
        docs = {int(r.url_of(int(d)).rsplit("/", 1)[1]) for d in ids}
        assert docs == expect, slop
        assert (sc > 0).all()
