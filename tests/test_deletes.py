"""Delete-tombstone (logical delete) tests."""

import numpy as np
import pytest

import ray.data


@pytest.fixture()
def built(pages_300_path, tmp_path):
    from solr_ray.pipelines.build_index import build_index

    idx = str(tmp_path / "del_idx")
    build_index(pages_300_path, idx, analyzer="text_en", num_buckets=4)
    return idx


def _top_query(idx):
    from solr_ray.fixtures import gen_queries
    from solr_ray.search.searcher import IndexReader

    r = IndexReader(idx)
    for t in gen_queries(40)["text"].to_pylist():
        ids, sc = r.search(t, 10)
        if len(ids) >= 5:
            return t, ids, sc
    raise AssertionError("no query with 5+ hits")


def test_delete_by_id_removes_doc_and_preserves_scores(built):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.state.tombstones import delete_by_id

    text, ids, sc = _top_query(built)
    victim = int(ids[0])
    delete_by_id(built, [victim])
    r = IndexReader(built)
    ids2, sc2 = r.search(text, 10)
    assert victim not in ids2.tolist()
    # remaining docs keep their exact scores and order
    keep = ids != victim
    n = min(len(ids2), keep.sum())
    assert ids2[:n].tolist() == ids[keep][:n].tolist()
    assert sc2[:n].tolist() == sc[keep][:n].tolist()


def test_delete_by_url_and_clear(built):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.state.tombstones import clear_tombstones, delete_by_url

    text, ids, _ = _top_query(built)
    r = IndexReader(built)
    url = r.url_of(int(ids[1]))
    delete_by_url(built, [url])
    r2 = IndexReader(built)
    ids2, _ = r2.search(text, 10)
    assert int(ids[1]) not in ids2.tolist()
    clear_tombstones(built)
    r3 = IndexReader(built)
    ids3, _ = r3.search(text, 10)
    assert ids3.tolist() == ids.tolist()


def test_delete_by_query(built):
    from solr_ray.search.searcher import IndexReader
    from solr_ray.state.tombstones import delete_by_query

    text, ids, _ = _top_query(built)
    n = delete_by_query(built, text)
    assert n >= len(ids)
    r = IndexReader(built)
    ids2, _ = r.search(text, 10)
    assert len(ids2) == 0


def test_deletes_consistent_across_modes(built):
    from solr_ray.fixtures import gen_queries
    from solr_ray.search.searcher import IndexReader
    from solr_ray.state.tombstones import delete_by_id

    text, ids, _ = _top_query(built)
    delete_by_id(built, [int(ids[0]), int(ids[2])])
    r = IndexReader(built)
    for t in gen_queries(20)["text"].to_pylist():
        a = r.search(t, 10, "taat")
        b = r.search(t, 10, "bmw")
        assert a[0].tolist() == b[0].tolist()
        assert a[1].tolist() == b[1].tolist()


def test_facet_search_counts_full_match_set(pages_300_path, tmp_path):
    from solr_ray.fixtures import gen_pages
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    idx = str(tmp_path / "facet_idx")
    build_index(pages_300_path, idx, analyzer="text_en", num_buckets=4,
                stored_cols=("lang",))
    r = IndexReader(idx)
    pages = gen_pages(300, seed=42)
    texts = pages["text"].to_pylist()
    langs = pages["lang"].to_pylist()
    urls = pages["url"].to_pylist()
    term_src = texts[0].split()[0]
    # oracle: docs whose analyzed tokens contain the analyzed term
    qterms = set(r.query_terms(term_src))
    expect = {}
    for txt, lg in zip(texts, langs):
        if qterms & set(r.analyzer.tokenize_text(txt)):
            expect[lg] = expect.get(lg, 0) + 1
    got = dict(r.facet_search(term_src, "lang", limit=10))
    assert got == expect
    # matching_doc_ids matches the oracle count
    assert len(r.matching_doc_ids(term_src)) == sum(expect.values())


def test_facet_search_respects_tombstones(pages_300_path, tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader
    from solr_ray.state.tombstones import delete_by_id

    idx = str(tmp_path / "facet_del_idx")
    build_index(pages_300_path, idx, analyzer="text_en", num_buckets=4,
                stored_cols=("lang",))
    r = IndexReader(idx)
    text, ids, _ = _top_query(idx)
    total_before = sum(c for _, c in r.facet_search(text, "lang", 100))
    delete_by_id(idx, [int(ids[0])])
    r2 = IndexReader(idx)
    total_after = sum(c for _, c in r2.facet_search(text, "lang", 100))
    assert total_after == total_before - 1
