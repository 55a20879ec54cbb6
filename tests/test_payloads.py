"""Delimited-payload indexing + payload_score / payload_check tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


@pytest.fixture(scope="module")
def payload_idx(tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    texts = [
        "alpha|2.5 beta|0.5 alpha|1.0",
        "beta alpha|3.0 gamma|0.5 alpha",   # bare tokens default to 1.0
        "gamma beta|1.5",
        "alpha|0.5 alpha|0.5 alpha|0.5",
    ]
    t = pa.table({
        "url": pa.array([f"https://p/{i:04d}" for i in range(len(texts))]),
        "text": pa.array(texts),
    })
    out = str(tmp_path_factory.mktemp("payl") / "idx")
    build_index(ray.data.from_arrow(t), out, analyzer="whitespace",
                num_buckets=2, text_source="text", store_positions=True,
                payload_delimiter="|")
    return IndexReader(out)


def _by_url(r, ids, vals):
    return {r.url_of(int(i)): float(v) for i, v in zip(ids, vals)}


def test_payload_score_funcs(payload_idx):
    from solr_ray.search.payloads import payload_score

    r = payload_idx
    got = _by_url(r, *payload_score(r, "alpha", "sum", 10))
    assert got == {"https://p/0000": 3.5, "https://p/0001": 4.0,
                   "https://p/0003": 1.5}
    got = _by_url(r, *payload_score(r, "alpha", "max", 10))
    assert got["https://p/0001"] == 3.0 and got["https://p/0000"] == 2.5
    got = _by_url(r, *payload_score(r, "alpha", "min", 10))
    assert got["https://p/0001"] == 1.0  # the bare default
    got = _by_url(r, *payload_score(r, "alpha", "avg", 10))
    assert got["https://p/0000"] == 1.75 and got["https://p/0001"] == 2.0


def test_payload_score_ranking_and_missing(payload_idx):
    from solr_ray.search.payloads import payload_score

    r = payload_idx
    ids, sc = payload_score(r, "alpha", "sum", 2)
    assert len(ids) == 2 and sc[0] == 4.0 and sc[1] == 3.5
    ids, _sc = payload_score(r, "nosuchterm", "sum", 10)
    assert ids.size == 0
    with pytest.raises(ValueError):
        payload_score(r, "alpha", "median", 10)


def test_payload_check(payload_idx):
    from solr_ray.search.payloads import payload_check

    r = payload_idx
    ids, tf = payload_check(r, ["alpha", "beta"], [2.5, 0.5], 10)
    assert _by_url(r, ids, tf) == {"https://p/0000": 1.0}
    # None = unconstrained occurrence
    ids, tf = payload_check(r, ["alpha", "gamma"], [None, 0.5], 10)
    assert _by_url(r, ids, tf) == {"https://p/0001": 1.0}
    # payload mismatch -> no hit even though the phrase occurs
    ids, _tf = payload_check(r, ["alpha", "beta"], [2.5, 1.0], 10)
    assert ids.size == 0
    # repeated-phrase tf counts chains
    ids, tf = payload_check(r, ["alpha", "alpha"], [0.5, 0.5], 10)
    assert _by_url(r, ids, tf) == {"https://p/0003": 2.0}


def test_payload_requires_whitespace_and_positions(tmp_path):
    from solr_ray.pipelines.build_index import build_index

    t = ray.data.from_arrow(pa.table({"url": ["https://p/0"],
                                      "text": ["a|1.0"]}))
    with pytest.raises(ValueError, match="store_positions"):
        build_index(t, str(tmp_path / "i1"), analyzer="whitespace",
                    text_source="text", payload_delimiter="|")
    with pytest.raises(ValueError, match="whitespace"):
        build_index(t, str(tmp_path / "i2"), analyzer="text_en",
                    text_source="text", store_positions=True,
                    payload_delimiter="|")


def test_plain_positional_index_rejects_payload_queries(tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.payloads import payload_score
    from solr_ray.search.searcher import IndexReader

    t = ray.data.from_arrow(pa.table({"url": ["https://p/0"],
                                      "text": ["alpha beta"]}))
    build_index(t, str(tmp_path / "idx"), analyzer="whitespace",
                num_buckets=1, text_source="text", store_positions=True)
    r = IndexReader(str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="payload"):
        payload_score(r, "alpha", "sum", 10)


def test_phrase_search_unaffected_by_payloads(payload_idx):
    """The positional machinery still works on a payload index (payloads
    are stripped from terms before analysis)."""
    ids, _sc = payload_idx.phrase_search("alpha beta", 10)
    assert {payload_idx.url_of(int(d)) for d in ids} == {"https://p/0000"}


def test_payloads_survive_merge(tmp_path):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.payloads import payload_check, payload_score
    from solr_ray.search.searcher import IndexReader
    from solr_ray.stages.merge import merge_index

    t = pa.table({
        "url": pa.array([f"{i:04d}" for i in range(8)]),
        "text": pa.array([f"alpha|{(i % 3) * 0.5} beta|1.0"
                          for i in range(8)]),
    })
    out = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(t), out, analyzer="whitespace",
                num_buckets=4, text_source="text", store_positions=True,
                payload_delimiter="|")
    before = payload_score(IndexReader(out), "alpha", "sum", 10)
    merge_index(out, merge_factor=10)
    r = IndexReader(out)
    assert len(r.segments) == 1
    after = payload_score(r, "alpha", "sum", 10)
    assert before[0].tolist() == after[0].tolist()
    assert before[1].tolist() == after[1].tolist()
    ids, tf = payload_check(r, ["alpha", "beta"], [0.5, 1.0], 10)
    assert ids.tolist() == [1, 4, 6]
