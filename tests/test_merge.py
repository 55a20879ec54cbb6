"""Tiered merge: merged index must be search-identical to the unmerged one."""

import json
import os

import numpy as np
import pytest

from solr_ray.pipelines.build_index import build_index
from solr_ray.search.oracle import OracleIndex
from solr_ray.search.searcher import IndexReader
from solr_ray.stages.merge import merge_index, plan_tiered_merges


def test_plan_tiered_merges():
    segs = [{"n_docs": 10} for _ in range(7)]
    assert plan_tiered_merges(segs, merge_factor=3) == [[0, 1, 2], [3, 4, 5]]
    assert plan_tiered_merges(segs, merge_factor=10) == [[0, 1, 2, 3, 4, 5, 6]]
    assert plan_tiered_merges(segs[:1], merge_factor=3) == []
    assert plan_tiered_merges(segs, merge_factor=10, max_docs=25) == [
        [0, 1], [2, 3], [4, 5]
    ]


@pytest.fixture(scope="module")
def merged_setup(pages_300_path, pages_300, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("merge_idx"))
    build_index(pages_300_path, out, analyzer="text_en", num_buckets=8)
    before = IndexReader(out)
    man = merge_index(out, merge_factor=4)
    after = IndexReader(out)
    oracle = OracleIndex(pages_300, "text_en", num_buckets=8)
    return out, before, after, man, oracle


def test_merge_reduces_segments(merged_setup):
    out, before, after, man, _ = merged_setup
    assert len(before.segments) == 8
    assert len(after.segments) == 2
    assert man["merge_gen"] == 1


def test_merge_preserves_docs_and_stats(merged_setup):
    _, before, after, _, oracle = merged_setup
    urls_before = [u for s in before.segments for u in s.urls.to_pylist()]
    urls_after = [u for s in after.segments for u in s.urls.to_pylist()]
    assert urls_before == urls_after == oracle.urls
    assert after.n_docs == oracle.n_docs
    # global stats are untouched by merging
    assert before.global_df == after.global_df


def test_merge_search_identical(merged_setup, queries_40):
    _, before, after, _, oracle = merged_setup
    for text in queries_40["text"].to_pylist():
        ids_b, sc_b = before.search(text, 10, mode="taat")
        ids_a, sc_a = after.search(text, 10, mode="taat")
        assert np.array_equal(ids_b, ids_a), text
        assert np.array_equal(sc_b, sc_a), text
        ids_w, sc_w = after.search(text, 10, mode="bmw")
        assert np.array_equal(ids_a, ids_w), text
        ids_o, sc_o, _ = oracle.search(text, 10)
        assert np.array_equal(ids_a, ids_o) and np.array_equal(sc_a, sc_o), text


def test_merge_idempotent_resume(merged_setup):
    out, _, _, _, _ = merged_setup
    with open(os.path.join(out, "index.json")) as f:
        segs_before = json.load(f)["segments"]
    man2 = merge_index(out, merge_factor=4)  # second round: merges the 2 into 1
    assert len(man2["segments"]) == 1
    reader = IndexReader(out)
    assert reader.n_docs == 300
