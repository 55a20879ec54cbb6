"""Sources/sinks (SURVEY §2.1) and set-op coverage."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


def test_read_json_docs_with_split(tmp_path):
    from solr_ray.sources.loaders import read_json_docs

    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "tags": f"a{i},b{i}"}) + "\n")
    ds = read_json_docs(str(p), field_splits={"tags": ","})
    got = ds.to_pandas().sort_values("id")
    assert list(got["tags"].iloc[0]) == ["a0", "b0"]
    assert len(got) == 5


def test_read_csv_docs(tmp_path):
    from solr_ray.sources.loaders import read_csv_docs

    p = tmp_path / "docs.csv"
    pd.DataFrame({"id": [1, 2], "vals": ["x;y", "z"]}).to_csv(p, index=False)
    ds = read_csv_docs(str(p), field_splits={"vals": ";"})
    got = ds.to_pandas().sort_values("id")
    assert [list(v) for v in got["vals"]] == [["x", "y"], ["z"]]


def test_read_pages_pruned_and_filtered(pages_300_path):
    from solr_ray.sources.loaders import read_pages

    ds = read_pages(pages_300_path, columns=["url", "lang"], lang="de")
    t = ds.to_pandas()
    assert set(t.columns) == {"url", "lang"}
    assert (t["lang"] == "de").all()
    assert 0 < len(t) < 300


def test_export_sorted_total_order(tmp_path):
    from solr_ray.sources.loaders import export_sorted

    df = pd.DataFrame({"k": [3, 1, 2, 5, 4], "v": list("abcde")})
    out = str(tmp_path / "exp")
    export_sorted(ray.data.from_pandas(df).repartition(3), out, ["k"],
                  descending=True)
    back = pq.read_table(out).to_pandas()
    assert back["k"].tolist() == [5, 4, 3, 2, 1]


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_write_results_formats(tmp_path, fmt):
    from solr_ray.sources.loaders import write_results

    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    out = str(tmp_path / fmt)
    write_results(ray.data.from_pandas(df), out, fmt)
    files = os.listdir(out)
    assert files, fmt


def test_union_merge_stream():
    a = ray.data.from_items([{"k": i} for i in range(5)])
    b = ray.data.from_items([{"k": i} for i in range(5, 8)])
    got = sorted(r["k"] for r in a.union(b).take_all())
    assert got == list(range(8))


def test_intersect_keys():
    from solr_ray.ops.joins import intersect_keys

    left = ray.data.from_items([{"k": i, "v": i * 2} for i in range(10)])
    right = ray.data.from_items([{"k": i} for i in range(5, 15)])
    got = sorted(r["k"] for r in intersect_keys(left, right, "k").take_all())
    assert got == [5, 6, 7, 8, 9]
