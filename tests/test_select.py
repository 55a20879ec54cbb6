"""/select unified-request tests: q + fq + paging + fl + facets."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def idx(pages_300_path, tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index

    out = str(tmp_path_factory.mktemp("sel") / "idx")
    build_index(pages_300_path, out, analyzer="text_en", num_buckets=4,
                stored_cols=("lang",))
    return out


@pytest.fixture(scope="module")
def reader(idx):
    from solr_ray.search.searcher import IndexReader

    return IndexReader(idx)


def _good_query(reader):
    from solr_ray.fixtures import gen_queries

    for t in gen_queries(40)["text"].to_pylist():
        if len(reader.search(t, 30)[0]) >= 20:
            return t
    raise AssertionError("no rich query found")


def test_select_matches_search(reader):
    from solr_ray.search.select import select

    q = _good_query(reader)
    resp = select(reader, q, rows=10)
    ids, sc = reader.search(q, 10)
    assert [d["doc_id"] for d in resp["docs"]] == ids.tolist()
    assert [d["score"] for d in resp["docs"]] == sc.tolist()
    assert resp["numFound"] == len(reader.matching_doc_ids(q))


def test_select_paging_stitches(reader):
    from solr_ray.search.select import select

    q = _good_query(reader)
    full = reader.search(q, 20)[0].tolist()
    p1 = select(reader, q, start=0, rows=10)
    p2 = select(reader, q, start=10, rows=10)
    got = [d["doc_id"] for d in p1["docs"]] + [d["doc_id"] for d in p2["docs"]]
    assert got == full


def test_select_fq_exact(reader):
    from solr_ray.search.select import select

    q = _good_query(reader)
    fq = [{"op": "term", "field": "lang", "value": "en"}]
    resp = select(reader, q, fq=fq, rows=30, fl=("lang",),
                  facet_fields=("lang",))
    assert all(d["lang"] == "en" for d in resp["docs"])
    # exact filtered ranking: scores match unfiltered scores of those docs
    ids_all, sc_all = reader.search(q, 300)
    score_of = dict(zip(ids_all.tolist(), sc_all.tolist()))
    for d in resp["docs"]:
        assert d["score"] == pytest.approx(score_of[d["doc_id"]], abs=0)
    # filtered numFound == facet count total for the single facet field
    assert resp["numFound"] == sum(c for _, c in resp["facets"]["lang"])
    assert dict(resp["facets"]["lang"]).keys() == {"en"}


def test_select_facets_match_facet_search(reader):
    from solr_ray.search.select import select

    q = _good_query(reader)
    resp = select(reader, q, facet_fields=("lang",), facet_limit=10)
    assert resp["facets"]["lang"] == reader.facet_search(q, "lang", 10)


def test_select_fl_fields(reader):
    from solr_ray.search.select import select

    q = _good_query(reader)
    resp = select(reader, q, rows=5, fl=("lang",))
    assert all("lang" in d and isinstance(d["lang"], str)
               for d in resp["docs"])


def test_select_no_hits(reader):
    from solr_ray.search.select import select

    resp = select(reader, "zzzzzz qqqqqq", rows=10)
    assert resp == {"numFound": 0, "start": 0, "docs": [], "facets": {}}
