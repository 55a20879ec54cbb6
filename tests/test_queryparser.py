"""Boolean user-query syntax tests (+must -not "phrase" should)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _mk_pages(texts):
    urls = [f"https://q/{i:04d}" for i in range(len(texts))]
    return pa.table({"url": pa.array(urls, pa.string()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def reader(tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    texts = [
        "apple banana cherry",       # 0
        "apple banana",              # 1
        "apple cherry",              # 2
        "banana cherry",             # 3
        "apple apple banana date",   # 4
        "date fig grape",            # 5
    ]
    out = str(tmp_path_factory.mktemp("qp") / "idx")
    build_index(ray.data.from_arrow(_mk_pages(texts)), out,
                analyzer="whitespace", num_buckets=2, text_source="text",
                store_positions=True)
    return IndexReader(out)


def _urls(reader, ids):
    return {reader.url_of(int(d)) for d in ids}


def test_parse():
    from solr_ray.search.queryparser import parse_user_query

    p = parse_user_query('+apple -fig "banana cherry"~1 date')
    assert p["must"] == ["apple"]
    assert p["must_not"] == ["fig"]
    assert p["should"] == ["date"]
    assert p["phrases"] == [("should", "banana cherry", 1)]


def test_should_matches_plain_search(reader):
    from solr_ray.search.queryparser import boolean_search

    ids, sc = boolean_search(reader, "apple banana", 10)
    ids2, sc2 = reader.search("apple banana", 10)
    assert ids.tolist() == ids2.tolist()
    assert sc.tolist() == sc2.tolist()


def test_must_restricts(reader):
    from solr_ray.search.queryparser import boolean_search

    ids, _ = boolean_search(reader, "+apple banana", 10)
    assert _urls(reader, ids) == {"https://q/0000", "https://q/0001",
                                  "https://q/0002", "https://q/0004"}


def test_must_not_excludes(reader):
    from solr_ray.search.queryparser import boolean_search

    ids, _ = boolean_search(reader, "apple -banana", 10)
    assert _urls(reader, ids) == {"https://q/0002"}


def test_phrase_clause_scores_and_restricts(reader):
    from solr_ray.search.queryparser import boolean_search

    ids, _ = boolean_search(reader, '+"apple banana" cherry', 10)
    assert _urls(reader, ids) == {"https://q/0000", "https://q/0001",
                                  "https://q/0004"}
    # phrase-only should query
    ids2, _ = boolean_search(reader, '"banana cherry"', 10)
    assert _urls(reader, ids2) == {"https://q/0000", "https://q/0003"}
    # negated phrase
    ids3, _ = boolean_search(reader, 'apple -"apple banana"', 10)
    assert _urls(reader, ids3) == {"https://q/0002"}


def test_pure_negative_matches_nothing(reader):
    from solr_ray.search.queryparser import boolean_search

    ids, _ = boolean_search(reader, "-apple", 10)
    assert len(ids) == 0


def test_missing_must_term_matches_nothing(reader):
    from solr_ray.search.queryparser import boolean_search

    ids, _ = boolean_search(reader, "+nonexistentterm apple", 10)
    assert len(ids) == 0
