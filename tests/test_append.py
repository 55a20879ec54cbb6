"""Incremental append + lazy segment reading."""

import numpy as np
import pytest

import ray.data


@pytest.fixture(scope="module")
def split_corpus():
    from solr_ray.fixtures import gen_pages

    pages = gen_pages(400, seed=42)
    return pages.slice(0, 300), pages.slice(300, 100), pages


def test_append_matches_full_build(split_corpus, tmp_path):
    from solr_ray.pipelines.build_index import append_to_index, build_index
    from solr_ray.search.oracle import OracleIndex
    from solr_ray.search.searcher import IndexReader

    first, extra, full = split_corpus
    idx = str(tmp_path / "inc_idx")
    build_index(ray.data.from_arrow(first), idx,
                analyzer="text_en", num_buckets=4)
    man = append_to_index(ray.data.from_arrow(extra), idx)
    assert man["n_docs"] == 400
    assert man["append_gen"] == 1

    reader = IndexReader(idx)
    # global stats must equal a from-scratch oracle over the full corpus
    orc = OracleIndex(full, "text_en", num_buckets=4)
    assert reader.n_docs == orc.n_docs
    assert abs(reader.avgdl - orc.avgdl) < 1e-9
    for term in ("the", "page", "crawl"):
        if term in orc.df:
            assert reader.global_df.get(term) == orc.df[term]

    # ranking over the appended index must match the oracle's SCORES and
    # retrieve the same documents (by url); docIDs themselves differ from a
    # from-scratch build because appended docs live in a later id range
    from solr_ray.fixtures import gen_queries

    texts = gen_queries(30)["text"].to_pylist()
    for t in texts:
        ids, sc = reader.search(t, 10)
        o_ids, o_sc, o_urls = orc.search(t, 10)
        assert np.allclose(sc, o_sc, rtol=0, atol=0), t
        # urls must agree wherever the score is unique; within tied-score
        # runs the tie-break is internal docID, and appended docs sit in a
        # different id range than a from-scratch build would place them
        urls = [reader.url_of(int(d)) for d in ids]
        uniq = {s for s in sc.tolist() if sc.tolist().count(s) == 1}
        for u, ou, s in zip(urls, o_urls, sc.tolist()):
            if s in uniq:
                assert u == ou, (t, s)


def test_append_then_merge(split_corpus, tmp_path):
    from solr_ray.pipelines.build_index import append_to_index, build_index
    from solr_ray.search.searcher import IndexReader
    from solr_ray.stages.merge import merge_index

    from solr_ray.fixtures import gen_queries

    first, extra, full = split_corpus
    idx = str(tmp_path / "incm_idx")
    build_index(ray.data.from_arrow(first), idx,
                analyzer="text_en", num_buckets=4)
    append_to_index(ray.data.from_arrow(extra), idx)
    pre = IndexReader(idx)
    texts = gen_queries(25)["text"].to_pylist()
    pre_results = [pre.search(t, 10) for t in texts]
    man = merge_index(idx, merge_factor=8)
    assert len(man["segments"]) < 8
    post = IndexReader(idx)
    for t, (ids, sc) in zip(texts, pre_results):
        pids, psc = post.search(t, 10)
        assert pids.tolist() == ids.tolist(), t
        assert psc.tolist() == sc.tolist(), t


def test_lazy_reader_identical(split_corpus, tmp_path):
    from solr_ray.fixtures import gen_queries
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    _, _, full = split_corpus
    idx = str(tmp_path / "lazy_idx")
    build_index(ray.data.from_arrow(full), idx,
                analyzer="text_en", num_buckets=4)
    eager = IndexReader(idx)
    lazy = IndexReader(idx, lazy=True)
    for t in gen_queries(30)["text"].to_pylist():
        for mode in ("taat", "bmw"):
            a = eager.search(t, 10, mode)
            b = lazy.search(t, 10, mode)
            assert a[0].tolist() == b[0].tolist()
            assert a[1].tolist() == b[1].tolist()


def test_fetch_stored_fields(split_corpus, tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader, fetch_stored

    _, _, full = split_corpus
    idx = str(tmp_path / "stored_idx")
    build_index(ray.data.from_arrow(full), idx, analyzer="text_en",
                num_buckets=4, stored_cols=("lang",))
    reader = IndexReader(idx)
    ids, _ = reader.search("the page data", 10)
    want = [3, 7, 150, 399] + [int(i) for i in ids[:3]]
    got = fetch_stored(idx, want, cols=["lang"])
    assert set(got.column_names) >= {"doc_id", "url", "lang"}
    assert sorted(got["doc_id"].to_pylist()) == sorted(set(want))
    # url/lang must match the source rows
    urls = full["url"].to_pylist()
    langs = full["lang"].to_pylist()
    src = dict(zip(urls, langs))
    for u, lg in zip(got["url"].to_pylist(), got["lang"].to_pylist()):
        assert src[u] == lg


def test_fetch_stored_empty(split_corpus, tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import fetch_stored

    _, _, full = split_corpus
    idx = str(tmp_path / "stored_idx2")
    build_index(ray.data.from_arrow(full), idx, analyzer="text_en",
                num_buckets=2)
    got = fetch_stored(idx, [])
    assert got.num_rows == 0


def test_empty_corpus_build_and_search(tmp_path):
    import pyarrow as pa

    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    empty = pa.table({"url": pa.array([], pa.string()),
                      "text": pa.array([], pa.string())})
    idx = str(tmp_path / "empty_idx")
    man = build_index(ray.data.from_arrow(empty), idx, analyzer="text_en",
                      num_buckets=4, text_source="text")
    assert man["n_docs"] == 0 and man["segments"] == []
    r = IndexReader(idx)
    ids, sc = r.search("anything at all", 10)
    assert len(ids) == 0


def test_k_exceeds_matches(split_corpus, tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    _, _, full = split_corpus
    idx = str(tmp_path / "bigk_idx")
    build_index(ray.data.from_arrow(full), idx, analyzer="text_en",
                num_buckets=2)
    r = IndexReader(idx)
    text = full["text"][0].as_py().split()[0]
    ids, sc = r.search(text, 100000)
    assert 0 < len(ids) <= 400
    assert (sc[:-1] >= sc[1:]).all()


def test_num_buckets_invariance(split_corpus, tmp_path):
    """Different bucket counts produce identical (url, score) rankings —
    scores use global stats; only id-based tie order may differ."""
    from solr_ray.fixtures import gen_queries
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    _, _, full = split_corpus
    readers = []
    for nb in (1, 4):
        idx = str(tmp_path / f"nb{nb}_idx")
        build_index(ray.data.from_arrow(full), idx, analyzer="text_en",
                    num_buckets=nb)
        readers.append(IndexReader(idx))
    a, b = readers
    assert a.n_docs == b.n_docs and a.avgdl == b.avgdl
    for t in gen_queries(25)["text"].to_pylist():
        ia, sa = a.search(t, 10)
        ib, sb = b.search(t, 10)
        assert sa.tolist() == sb.tolist(), t
        # where scores are unique the url must agree
        uniq = {s for s in sa.tolist() if sa.tolist().count(s) == 1}
        for da, db, s in zip(ia, ib, sa.tolist()):
            if s in uniq:
                assert a.url_of(int(da)) == b.url_of(int(db)), t


def test_search_dataset_lazy_sharded_identical(split_corpus, tmp_path):
    import ray.data as rd

    from solr_ray.fixtures import gen_queries
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import search_dataset

    _, _, full = split_corpus
    idx = str(tmp_path / "lazy_shard_idx")
    build_index(ray.data.from_arrow(full), idx, analyzer="text_en",
                num_buckets=4)
    qds = rd.from_arrow(gen_queries(20))
    a = search_dataset(qds, idx, k=10).to_pandas()
    b = search_dataset(qds, idx, k=10, num_shards=2, lazy=True).to_pandas()
    a = a.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = b.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
