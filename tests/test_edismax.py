import numpy as np
import pyarrow as pa
import pytest
import ray

from solr_ray.search.edismax import EdismaxIndex, parse_mm


def test_parse_mm_forms():
    assert parse_mm(0, 3) == 0
    assert parse_mm(2, 3) == 2
    assert parse_mm(5, 3) == 3          # clamped to clause count
    assert parse_mm(-1, 3) == 2         # all but one
    assert parse_mm("-2", 3) == 1
    assert parse_mm("75%", 4) == 3      # floor
    assert parse_mm("75%", 3) == 2
    assert parse_mm("-25%", 4) == 3     # all but floor(25% of 4)
    assert parse_mm("100%", 3) == 3


@pytest.fixture(scope="module")
def two_field_index(tmp_path_factory):
    """Tiny two-field layout: body = full text, title = first 2 tokens.
    Same urls + num_buckets in both builds -> aligned docIDs."""
    from solr_ray.pipelines.build_index import build_index

    texts = [
        "merge join fast table scan",
        "table scan slow merge",
        "fast merge join join join",
        "window sort order by key",
        "merge sort window batch",
        "join the fast lane now",
        "scan scan scan table",
        "quiet unrelated words here",
    ]
    urls = [f"{i:04d}" for i in range(len(texts))]
    root = tmp_path_factory.mktemp("edismax")
    body_dir, title_dir = str(root / "body"), str(root / "title")
    pages = ray.data.from_arrow(pa.table({"url": urls, "text": texts}))
    build_index(pages, body_dir, analyzer="whitespace", num_buckets=2,
                text_source="text", store_positions=True)
    titles = [" ".join(t.split()[:2]) for t in texts]
    tpages = ray.data.from_arrow(pa.table({"url": urls, "text": titles}))
    build_index(tpages, title_dir, analyzer="whitespace", num_buckets=2,
                text_source="text")
    return {"body": body_dir, "title": title_dir}, texts, urls


def _text_of(idx, texts, urls, doc_id):
    url = idx.readers["body"].url_of(int(doc_id))
    return texts[urls.index(url)]


def test_single_field_dismax_equals_plain_bm25(two_field_index):
    from solr_ray.search.searcher import IndexReader

    dirs, texts, urls = two_field_index
    idx = EdismaxIndex({"body": dirs["body"]})
    reader = IndexReader(dirs["body"])
    for q in ["merge join", "table scan", "fast merge join"]:
        ids, sc = idx.search(q, {"body": 1.0}, k=10, tie=0.0)
        rids, rsc = reader.search(q, 10)
        assert ids.tolist() == rids.tolist()
        assert np.array_equal(sc, rsc)


def test_mm_requires_both_clauses(two_field_index):
    dirs, texts, urls = two_field_index
    idx = EdismaxIndex(dirs)
    qf = {"title": 2.0, "body": 1.0}
    loose, _ = idx.search("merge window", qf, k=10, mm=1)
    strict, _ = idx.search("merge window", qf, k=10, mm=2)
    assert set(strict) < set(loose)  # mm=2 strictly narrows
    for d in strict:
        t = _text_of(idx, texts, urls, d)
        assert "merge" in t and "window" in t
    for d in loose:
        t = _text_of(idx, texts, urls, d)
        assert "merge" in t or "window" in t


def test_title_boost_promotes_title_matches(two_field_index):
    dirs, texts, urls = two_field_index
    idx = EdismaxIndex(dirs)
    ids, sc = idx.search("merge join", {"title": 10.0, "body": 1.0},
                         k=10, tie=0.0)
    # top doc must have the term in its TITLE (first 2 tokens)
    top_text = _text_of(idx, texts, urls, ids[0])
    assert "merge" in top_text.split()[:2]


def test_tie_blends_between_max_and_sum(two_field_index):
    dirs, texts, urls = two_field_index
    idx = EdismaxIndex(dirs)
    qf = {"title": 1.0, "body": 1.0}
    ids0, s0 = idx.search("merge join", qf, k=10, tie=0.0)
    ids1, s1 = idx.search("merge join", qf, k=10, tie=1.0)
    idsh, sh = idx.search("merge join", qf, k=10, tie=0.5)
    m0 = dict(zip(ids0.tolist(), s0.tolist()))
    m1 = dict(zip(ids1.tolist(), s1.tolist()))
    mh = dict(zip(idsh.tolist(), sh.tolist()))
    assert set(m0) == set(m1) == set(mh)
    for d in m0:
        assert m0[d] <= mh[d] <= m1[d]
    # tie=1.0 = per-field SUM: strictly above max for any doc matching in
    # both fields
    both = [d for d in m0 if m1[d] > m0[d]]
    assert both, "fixture must contain docs matching in both fields"


def test_pf_phrase_boost(two_field_index):
    dirs, texts, urls = two_field_index
    idx = EdismaxIndex(dirs)
    qf = {"body": 1.0}
    ids, base = idx.search("merge join", qf, k=10)
    idsb, boosted = idx.search("merge join", qf, k=10, pf={"body": 2.0})
    b0 = dict(zip(ids.tolist(), base.tolist()))
    b1 = dict(zip(idsb.tolist(), boosted.tolist()))
    for d in b0:
        has_phrase = "merge join" in _text_of(idx, texts, urls, d)
        if has_phrase:
            assert b1[d] > b0[d]
        else:
            assert b1[d] == b0[d]


def test_edismax_dataset_matches_direct(two_field_index):
    from solr_ray.search.edismax import edismax_search

    dirs, texts, urls = two_field_index
    idx = EdismaxIndex(dirs)
    queries = ["merge join", "table scan", "window sort"]
    qds = ray.data.from_arrow(pa.table({
        "qid": pa.array(range(len(queries)), pa.int64()),
        "text": pa.array(queries, pa.string()),
    }))
    qf = {"title": 2.0, "body": 1.0}
    df = edismax_search(qds, dirs, qf, k=5, mm=1, pf={"body": 1.5},
                        tie=0.3, concurrency=2).to_pandas()
    for qid, q in enumerate(queries):
        g = df[df.qid == qid].sort_values("rank")
        ids, sc = idx.search(q, qf, k=5, mm=1, pf={"body": 1.5}, tie=0.3)
        assert g["doc_id"].tolist() == ids.tolist()
        assert np.array_equal(g["score"].to_numpy(), sc)
