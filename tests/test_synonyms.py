"""Query-side synonym expansion tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _mk_pages(texts):
    urls = [f"https://s/{i:04d}" for i in range(len(texts))]
    return pa.table({"url": pa.array(urls, pa.string()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def reader(tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.searcher import IndexReader

    texts = [
        "couch in the living room",
        "sofa by the window",
        "a table and a chair",
        "sofa sofa couch",
    ]
    out = str(tmp_path_factory.mktemp("syn") / "idx")
    build_index(ray.data.from_arrow(_mk_pages(texts)), out,
                analyzer="whitespace", num_buckets=2, text_source="text")
    return IndexReader(out)


def test_load_synonyms_formats():
    from solr_ray.search.synonyms import load_synonyms

    m = load_synonyms([
        "couch, sofa",
        "tv => television, telly  # one-way",
        "# comment only",
        "",
    ])
    assert m["couch"] == ["sofa"] and m["sofa"] == ["couch"]
    assert m["tv"] == ["television", "telly"]
    assert "television" not in m


def test_synonym_search_unions_group(reader):
    from solr_ray.search.synonyms import load_synonyms, synonym_search

    syn = load_synonyms(["couch, sofa"])
    ids, sc = synonym_search(reader, "couch", syn, 10)
    urls = {reader.url_of(int(d)) for d in ids}
    assert urls == {"https://s/0000", "https://s/0001", "https://s/0003"}
    # doc 3 has group tf = 3 (sofa x2 + couch) -> top
    assert reader.url_of(int(ids[0])) == "https://s/0003"


def test_synonym_scoring_matches_hand_computed(reader):
    import math

    from solr_ray.search.synonyms import synonym_search

    syn = {"couch": ["sofa"], "sofa": ["couch"]}
    ids, sc = synonym_search(reader, "couch", syn, 10)
    # hand-compute for the top doc: df_max = max(df_couch, df_sofa),
    # tf = couch+sofa occurrences in doc 3 = 3
    df_max = max(reader.global_df["couch"], reader.global_df["sofa"])
    idf = math.log(1.0 + (reader.n_docs - df_max + 0.5) / (df_max + 0.5))
    dl = 3.0
    expect = idf * (3.0 / (3.0 + 1.2 * (1 - 0.75 + 0.75 * dl / reader.avgdl)))
    assert sc[0] == pytest.approx(expect, rel=0, abs=0)


def test_no_synonyms_equals_plain_search(reader):
    from solr_ray.search.synonyms import synonym_search

    ids, sc = synonym_search(reader, "table chair", {}, 10)
    ids2, sc2 = reader.search("table chair", 10)
    assert ids.tolist() == ids2.tolist()
    assert sc.tolist() == sc2.tolist()
