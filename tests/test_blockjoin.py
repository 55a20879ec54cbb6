import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


@pytest.fixture(scope="module")
def nested(tmp_path_factory):
    from solr_ray.ops.blockjoin import nest_children

    parents = pd.DataFrame({
        "pid": [1, 2, 3, 4],
        "pname": ["a", "b", "c", "d"],
    })
    children = pd.DataFrame({
        "pid": [1, 1, 2, 2, 2, 3, 9],   # 9 = orphan, 4 = childless
        "size": [10, 50, 20, 60, 70, 5, 99],
        "color": ["red", "blue", "red", "red", "blue", "green", "red"],
    })
    ds = nest_children(ray.data.from_pandas(parents),
                       ray.data.from_pandas(children),
                       "pid", "pid").materialize()
    return ds, parents, children


def test_nest_children_layout(nested):
    ds, parents, children = nested
    rows = {r["pid"]: r for r in ds.take_all()}
    assert set(rows) == {1, 2, 3, 4}          # orphans dropped
    assert len(rows[4]["_childDocuments_"]) == 0   # childless -> empty list
    assert sorted(k["size"] for k in rows[2]["_childDocuments_"]) == [20, 60, 70]
    assert rows[1]["pname"] == "a"


def test_parent_query_score_modes(nested):
    from solr_ray.ops.blockjoin import parent_query

    ds, parents, children = nested
    pred = {"op": "range", "field": "size", "lo": 20, "include_lo": True}
    for mode, expect in [
        ("max", {1: 50.0, 2: 70.0}),
        ("total", {1: 50.0, 2: 150.0}),
        ("avg", {1: 50.0, 2: 50.0}),
        ("none", {1: 1.0, 2: 3.0}),
    ]:
        out = parent_query(ds, pred, score_field="size",
                           score_mode=mode).to_pandas()
        got = dict(zip(out["pid"], out["score"]))
        assert got == expect, mode
    out = parent_query(ds, pred, score_field="size").to_pandas()
    assert dict(zip(out["pid"], out["n_matching_children"])) == {1: 1, 2: 3}


def test_parent_query_with_parent_filter(nested):
    from solr_ray.ops.blockjoin import parent_query

    ds, *_ = nested
    out = parent_query(
        ds, {"op": "term", "field": "color", "value": "red"},
        score_field="size", score_mode="max",
        parent_filter={"op": "term", "field": "pname", "value": "b"},
    ).to_pandas()
    assert out["pid"].tolist() == [2]
    assert out["score"].tolist() == [60.0]


def test_child_query(nested):
    from solr_ray.ops.blockjoin import child_query

    ds, parents, children = nested
    out = child_query(
        ds, {"op": "terms", "field": "pname", "values": ["a", "b"]},
        child_filter={"op": "term", "field": "color", "value": "red"},
        parent_cols=("pid", "pname"),
    ).to_pandas()
    # red children of parents a and b
    assert sorted(out["size"]) == [10, 20, 60]
    assert set(out["pname"]) == {"a", "b"}


def test_parent_query_matches_flat_join(nested):
    """Nested {!parent} result == the flat SQL-style join+group rollup."""
    from solr_ray.ops.blockjoin import parent_query

    ds, parents, children = nested
    out = parent_query(
        ds, {"op": "range", "field": "size", "lo": 20, "include_lo": True},
        score_field="size", score_mode="total").to_pandas()
    flat = (children[children["size"] >= 20]
            .merge(parents, on="pid")
            .groupby("pid")["size"].agg(["sum", "count"]))
    assert dict(zip(out["pid"], out["score"])) == flat["sum"].astype(float).to_dict()
    assert dict(zip(out["pid"], out["n_matching_children"])) == flat["count"].to_dict()
