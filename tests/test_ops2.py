"""Tests for atomic updates, structured filters, cursor paging,
highlighting, and more-like-this."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


# ------------------------------------------------------------ atomic update

def test_atomic_update_set_inc():
    from solr_ray.ops.updates import atomic_update

    base = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "bal": [10.0, 20.0, 30.0, 40.0],
        "seg": ["a", "b", "c", "d"],
    })
    updates = pd.DataFrame({
        "id": [2, 4, 99],
        "bal": [5.0, -10.0, 1.0],
        "seg": ["VIP", "VIP", "x"],
    })
    ds = ray.data.from_pandas(base).repartition(2)
    out = atomic_update(ds, updates, "id", {"bal": "inc", "seg": "set"})
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    assert got["bal"].tolist() == [10.0, 25.0, 30.0, 30.0]
    assert got["seg"].tolist() == ["a", "VIP", "c", "VIP"]


def test_atomic_update_list_ops():
    from solr_ray.ops.updates import atomic_update

    base = pd.DataFrame({
        "id": [1, 2, 3],
        "tags": [["x"], ["x", "y"], []],
    })
    updates = pd.DataFrame({"id": [1, 2, 3], "tags": ["y", "y", "z"]})
    ds = ray.data.from_pandas(base)
    add = atomic_update(ds, updates, "id", {"tags": "add_distinct"}) \
        .to_pandas().sort_values("id")
    assert add["tags"].tolist() == [["x", "y"], ["x", "y"], ["z"]]
    rem = atomic_update(ds, updates, "id", {"tags": "remove"}) \
        .to_pandas().sort_values("id")
    assert rem["tags"].tolist() == [["x"], ["x"], []]


def test_atomic_update_last_write_wins():
    from solr_ray.ops.updates import atomic_update

    base = pd.DataFrame({"id": [1], "v": [0.0]})
    updates = pd.DataFrame({"id": [1, 1], "v": [5.0, 7.0]})
    out = atomic_update(ray.data.from_pandas(base), updates, "id",
                        {"v": "set"}).to_pandas()
    assert out["v"].tolist() == [7.0]


# ------------------------------------------------------- structured filters

@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(3)
    return pd.DataFrame({
        "etype": rng.choice(["click", "view", "error"], 200).tolist(),
        "value": np.round(rng.uniform(0, 100, 200), 3),
        "name": [f"u{i%17}" for i in range(200)],
    })


def test_filter_query_matches_pandas(events_df):
    from solr_ray.ops.queryfilter import filter_query

    spec = {"op": "or", "clauses": [
        {"op": "and", "clauses": [
            {"op": "terms", "field": "etype", "values": ["click", "view"]},
            {"op": "range", "field": "value", "lo": 10.0, "hi": 50.0},
        ]},
        {"op": "and", "clauses": [
            {"op": "term", "field": "etype", "value": "error"},
            {"op": "not", "clauses": [
                {"op": "range", "field": "value", "hi": 80.0}]},
        ]},
    ]}
    ds = ray.data.from_pandas(events_df).repartition(3)
    got = filter_query(ds, spec).to_pandas()
    exp = events_df[
        (events_df.etype.isin(["click", "view"])
         & (events_df.value >= 10) & (events_df.value < 50))
        | ((events_df.etype == "error") & ~(events_df.value < 80))
    ]
    assert sorted(map(tuple, got.to_numpy().tolist())) == \
        sorted(map(tuple, exp.to_numpy().tolist()))


def test_filter_prefix(events_df):
    from solr_ray.ops.queryfilter import filter_query

    ds = ray.data.from_pandas(events_df)
    got = filter_query(ds, {"op": "prefix", "field": "name",
                            "value": "u1"}).to_pandas()
    assert set(got["name"]) == {n for n in events_df.name if n.startswith("u1")}


# ---------------------------------------------------------- cursor paging

def test_cursor_page_stitches_full_order(events_df):
    from solr_ray.ops.queryfilter import cursor_page

    events_df = events_df.reset_index().rename(columns={"index": "rid"})
    ds = ray.data.from_pandas(events_df).repartition(3)
    full = events_df.sort_values(["value", "rid"],
                                 ascending=[False, True]).reset_index(drop=True)
    pages, after = [], None
    for _ in range(4):
        page = cursor_page(ds, ["value", "rid"], after, 30,
                           descending=[True, False]).to_pandas()
        if page.empty:
            break
        pages.append(page)
        after = (page["value"].iloc[-1], page["rid"].iloc[-1])
    got = pd.concat(pages).reset_index(drop=True)
    assert got["rid"].tolist() == full["rid"].tolist()[:len(got)]
    assert len(got) == 120


# ------------------------------------------------------------- highlight

def test_highlight_batch():
    from solr_ray.search.highlight import highlight_batch

    t = pa.table({"text": [
        "the quick brown foxes jumped over lazy dogs " * 5,
        "nothing relevant here at all",
    ]})
    out = highlight_batch(t, "fox jump", analyzer="text_en", window=8)
    s0 = out["snippet"][0].as_py()
    assert "<em>foxes</em>" in s0 and "<em>jumped</em>" in s0
    assert out["snippet"][1].as_py() == ""


def test_mlt_finds_near_duplicate(pages_300_path, tmp_path):
    import ray

    from solr_ray.fixtures import gen_pages
    from solr_ray.pipelines.build_index import build_index
    from solr_ray.search.highlight import more_like_this_text
    from solr_ray.search.searcher import IndexReader

    out = str(tmp_path / "mlt_idx")
    build_index(pages_300_path, out, analyzer="text_en", num_buckets=4)
    reader = IndexReader(out)
    pages = gen_pages(300, seed=42)
    texts = pages["text"].to_pylist()
    # the fixture corpus has exact duplicate bodies (dup_fraction=0.02):
    # MLT from a duplicated text must surface its twin at the top
    seen = {}
    dup = None
    for i, t in enumerate(texts):
        if t in seen:
            dup = (seen[t], i)
            break
        seen[t] = i
    assert dup is not None
    ids, scores = more_like_this_text(reader, texts[dup[1]], k=5)
    # twin doc and source doc should be the two top hits (identical text)
    urls = pages["url"].to_pylist()
    sorted_urls = sorted(urls)
    top_urls = {reader.url_of(int(d)) for d in ids[:2]}
    assert {urls[dup[0]], urls[dup[1]]} == top_urls
    assert scores[0] == scores[1]


def test_new_scalar_functions():
    import numpy as np
    import pyarrow as pa

    from solr_ray.functions.scalar import FUNCTIONS

    s = pa.array(["hello world", "abc", "", "xyzzy"])
    assert FUNCTIONS["left"](s, 3).to_pylist() == ["hel", "abc", "", "xyz"]
    assert FUNCTIONS["right"](s, 3).to_pylist() == ["rld", "abc", "", "zzy"]
    assert FUNCTIONS["trimLeft"](pa.array(["  a ", "b"])).to_pylist() == ["a ", "b"]
    assert FUNCTIONS["trimRight"](pa.array(["  a ", "b"])).to_pylist() == ["  a", "b"]
    assert FUNCTIONS["startsWith"](s, "he").to_pylist() == [True, False, False, False]
    assert FUNCTIONS["endsWith"](s, "c").to_pylist() == [False, True, False, False]
    assert FUNCTIONS["contains"](s, "o w").to_pylist() == [True, False, False, False]
    assert FUNCTIONS["indexOf"](s, "world").to_pylist() == [6, -1, -1, -1]

    x = pa.array([1.0, 5.0, 10.0])
    m = FUNCTIONS["map"](x, 4.0, 6.0, 0.0)
    assert m.to_pylist() == [1.0, 0.0, 10.0]
    assert FUNCTIONS["precision"](pa.array([3.14159]), 2).to_pylist() == [3.14]

    lv = FUNCTIONS["strdist"](pa.array(["kitten"]), pa.array(["sitting"]),
                              "levenshtein").to_pylist()[0]
    assert abs(lv - (1 - 3 / 7)) < 1e-12
    jc = FUNCTIONS["strdist"](pa.array(["night"]), pa.array(["nacht"]),
                              "jaccard").to_pylist()[0]
    assert 0 < jc < 1

    arr = pa.array([[3.0, 1.0, 2.0], [], [5.0]])
    assert FUNCTIONS["arrayLength"](arr).to_pylist() == [3, 0, 1]
    assert FUNCTIONS["arrayMax"](arr).to_pylist()[0] == 3.0
    assert FUNCTIONS["arrayMin"](arr).to_pylist()[2] == 5.0
    assert FUNCTIONS["arraySum"](arr).to_pylist()[0] == 6.0
    assert FUNCTIONS["arrayMean"](arr).to_pylist()[0] == 2.0
    assert np.isnan(FUNCTIONS["arrayMean"](arr).to_pylist()[1])
    assert FUNCTIONS["arraySort"](arr).to_pylist()[0] == [1.0, 2.0, 3.0]
    assert FUNCTIONS["rev"](arr).to_pylist()[0] == [2.0, 1.0, 3.0]
    assert FUNCTIONS["distinct"](pa.array([[1.0, 1.0, 2.0]])).to_pylist() == [[1.0, 2.0]]
    assert FUNCTIONS["valueAt"](arr, 0).to_pylist()[0] == 3.0
    assert FUNCTIONS["sequence"](4, 2, 3).to_pylist() == [[2, 5, 8, 11]]
    h = FUNCTIONS["murmur3"](pa.array(["a", "b", "a"])).to_pylist()
    assert h[0] == h[2] and h[0] != h[1]


def test_interval_facet_overlap_and_brackets(ray_session):
    import pyarrow as pa
    import ray.data

    from solr_ray.ops.grouping import facet_interval

    ds = ray.data.from_arrow(pa.table({"v": [0.0, 50.0, 50.5, 100.0, 250.0]}))
    out = facet_interval(ds, "v", [
        ("closed", 0.0, 50.0, True, True),     # [0, 50]   -> 0, 50
        ("open_lo", 50.0, 200.0, False, True), # (50, 200] -> 50.5, 100
        ("unbounded", 100.0, None, True, False),  # [100, *) -> 100, 250
    ]).to_pandas().set_index("interval")["count"]
    assert out["closed"] == 2
    assert out["open_lo"] == 2
    assert out["unbounded"] == 2  # 100 counts here AND in open_lo (overlap)


def test_facet_prefix_sort_and_missing(ray_session):
    import pyarrow as pa
    import ray.data

    from solr_ray.ops.grouping import facet_field, facet_missing

    t = ray.data.from_arrow(pa.table({
        "f": ["ab", "ab", "ac", "b", None, None, "ab"],
    }))
    out = facet_field(t, "f", limit=10, prefix="a",
                      sort="index").to_pandas()
    assert out["f"].tolist() == ["ab", "ac"]
    assert out["count"].tolist() == [3, 1]
    out2 = facet_field(t, "f", limit=10).to_pandas()
    assert out2["f"].tolist()[0] == "ab"  # count-desc default
    assert None not in out2["f"].tolist()  # nulls never facet
    assert facet_missing(t, "f") == 2


def test_facets_mostly_null_keys(ray_session):
    """Mostly-null facet fields across many blocks used to crash Ray's
    sort-groupby partition search (np.searchsorted over None/str
    boundaries) — nulls are now dropped BEFORE the shuffle."""
    import pyarrow as pa
    import ray.data

    from solr_ray.ops.grouping import facet_field, pivot_facet
    from solr_ray.ops.jsonfacet import json_facet

    n = 200
    g = [None if (i % 10) < 8 else f"g{i % 3}" for i in range(n)]
    h = [None if (i % 10) < 9 else f"h{i % 2}" for i in range(n)]
    t = pa.table({"f": pa.array(g, pa.string()),
                  "h": pa.array(h, pa.string()),
                  "v": pa.array(range(n), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(8)
    out = facet_field(ds, "f", limit=5).to_pandas()
    assert sorted(out["count"].tolist(), reverse=True) == \
        out["count"].tolist() and len(out) == 3
    piv = pivot_facet(ds, ["f", "h"], limit=50).to_pandas()
    assert piv["count()"].sum() == sum(
        1 for a, b in zip(g, h) if a is not None and b is not None)
    res = json_facet(ds, {"type": "terms", "field": "f", "limit": 5,
                          "facet": {"u": "unique(h)"}})
    assert len(res["buckets"]) == 3
    assert all(b["val"] is not None for b in res["buckets"])


def test_relatedness_facet(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from solr_ray.ops.grouping import relatedness_facet

    # bucket 'hot' is strongly foreground-correlated; 'cold' is anti
    rows = ([{"b": "hot", "fg": "y"}] * 30 + [{"b": "hot", "fg": "n"}] * 5
            + [{"b": "cold", "fg": "y"}] * 2 + [{"b": "cold", "fg": "n"}] * 40
            + [{"b": "mid", "fg": "y"}] * 10 + [{"b": "mid", "fg": "n"}] * 10)
    ds = ray.data.from_items(rows).repartition(3)
    out = relatedness_facet(ds, "b", {"op": "term", "field": "fg",
                                      "value": "y"}, limit=10).to_pandas()
    assert out["b"].tolist()[0] == "hot" and out["b"].tolist()[-1] == "cold"
    assert out[out.b == "hot"]["relatedness"].iloc[0] > 0
    assert out[out.b == "cold"]["relatedness"].iloc[0] < 0
    # reference formula spot-check (computeRelatedness, RelatednessAgg.java)
    row = out[out.b == "hot"].iloc[0]
    fgc, bgc = row["fg_count"], row["bg_count"]
    fg_size, bg_size = 42.0, 97.0
    p = bgc / bg_size
    z = (fgc - fg_size * p) / math.sqrt(fg_size * p * (1 - p))
    sig = lambda x, o, s: (x + o) / (s + abs(x + o))  # noqa: E731
    want = (0.2 * sig(z, -80, 50) + 0.2 * sig(z, -30, 30)
            + 0.2 * sig(z, 0, 30) + 0.2 * sig(z, 30, 30)
            + 0.2 * sig(z, 80, 50))
    assert abs(row["relatedness"] - math.floor(want * 1e5 + 0.5) / 1e5) < 1e-12


def test_daemon_runner(ray_session, tmp_path):
    """Incremental daemon runs over a growing log == one batch run."""
    import pandas as pd
    import ray.data

    from solr_ray.ops.windows import DaemonRunner

    full = pd.DataFrame({
        "ts": pd.to_datetime(np.arange(1000) * 1_000_000, unit="us"),
        "v": np.arange(1000, dtype=np.int64),
    })
    landed = {"n": 0}

    def ds_factory():
        return ray.data.from_pandas(full.iloc[:landed["n"]].copy())

    def pipeline(ds):
        # per-increment sum of v (a stand-in for any downstream stream)
        return sum(r["v"] for r in
                   ds.map_batches(lambda t: t.select(["v"]),
                                  batch_format="pyarrow").take_all())

    d = DaemonRunner(str(tmp_path / "daemon.json"), "ts", pipeline)
    totals = []
    for n in (300, 300, 650, 1000, 1000):  # includes an idle iteration
        landed["n"] = n
        out, got = d.run_once(ds_factory())
        totals.append((out, got))
    assert [g for _o, g in totals] == [300, 0, 350, 350, 0]
    assert sum(o for o, g in totals if g) == int(full["v"].sum())
    # run_until_idle drains whatever is left after a partial restart
    d2 = DaemonRunner(str(tmp_path / "daemon.json"), "ts", pipeline)
    assert d2.run_until_idle(ds_factory) == []


def test_distance_value_sources():
    """rad/deg/dist/sqedist/hsin/geodist value sources (ValueSourceParser
    parity tier) vs closed forms."""
    import pyarrow as pa

    from solr_ray.functions.scalar import FUNCTIONS as F

    assert np.allclose(F["rad"](pa.array([180.0])).to_pylist(), [np.pi])
    assert np.allclose(F["deg"](pa.array([np.pi / 2])).to_pylist(), [90.0])
    z, t3, t4 = pa.array([0.0]), pa.array([3.0]), pa.array([4.0])
    assert F["dist"](1, z, z, t3, t4).to_pylist() == [7.0]
    assert F["dist"](2, z, z, t3, t4).to_pylist() == [5.0]
    assert np.allclose(F["dist"](3, z, z, t3, t4).to_pylist(),
                       [(27 + 64) ** (1 / 3)])
    assert F["sqedist"](z, z, t3, t4).to_pylist() == [25.0]
    # geodist agrees with the spatial kernel (same formula, same radius)
    from solr_ray.ops.spatial import haversine_km

    got = F["geodist"](pa.array([48.85]), pa.array([2.35]),
                       40.71, -74.0).to_pylist()[0]
    want = haversine_km(np.array([48.85]), np.array([2.35]),
                        40.71, -74.0)[0]
    assert abs(got - want) < 1e-9
