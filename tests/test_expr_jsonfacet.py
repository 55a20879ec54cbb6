"""Streaming-expression DSL + JSON facet API tests."""

import numpy as np
import pandas as pd
import pytest

import ray.data


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(5)
    docs = pd.DataFrame({
        "id": range(100),
        "lang": rng.choice(["en", "de", "fr"], 100, p=[0.6, 0.25, 0.15]),
        "source": rng.choice(["s1", "s2"], 100),
        "n_chars": rng.integers(10, 500, 100),
    })
    tags = pd.DataFrame({
        "id": range(100),
        "tags": [["a", "b"] if i % 2 else ["c"] for i in range(100)],
    })
    return {
        "docs": ray.data.from_pandas(docs).repartition(3),
        "tags": ray.data.from_pandas(tags),
        "_docs_pd": docs,
    }


# --------------------------------------------------------------- expr DSL

def test_parse_nested():
    from solr_ray.expr import parse_expr

    e = parse_expr('top(rollup(search(docs), over="lang", count(*)), '
                   'n=2, sort="count(*) desc")')
    assert e.name == "top" and e.kwargs["n"] == 2
    assert e.args[0].name == "rollup"


def test_expr_rollup_matches_pandas(tables):
    from solr_ray.expr import eval_expr

    out = eval_expr(
        'rollup(search(docs), over="lang", count(*), avg(n_chars))',
        tables).to_pandas().sort_values("lang").reset_index(drop=True)
    exp = (tables["_docs_pd"].groupby("lang")
           .agg(**{"count(*)": ("id", "size"),
                   "avg(n_chars)": ("n_chars", "mean")})
           .reset_index().sort_values("lang").reset_index(drop=True))
    assert out["count(*)"].tolist() == exp["count(*)"].tolist()
    assert np.allclose(out["avg(n_chars)"], exp["avg(n_chars)"])


def test_expr_search_filter_select_top(tables):
    from solr_ray.expr import eval_expr

    q = '{"op": "term", "field": "lang", "value": "en"}'
    out = eval_expr(
        f'top(select(search(docs, q="{q.replace(chr(34), chr(92)+chr(34))}"), '
        f'"id", "n_chars as len"), n=5, sort="len desc")',
        tables).to_pandas()
    exp = tables["_docs_pd"]
    exp = exp[exp.lang == "en"].nlargest(5, "n_chars")
    assert out["len"].tolist() == exp["n_chars"].tolist()


def test_expr_having_and_unique(tables):
    from solr_ray.expr import eval_expr

    out = eval_expr(
        'having(rollup(search(docs), over="lang", count(*)), '
        'gt("count(*)", 20))', tables).to_pandas()
    exp = tables["_docs_pd"].groupby("lang").size()
    assert set(out["lang"]) == set(exp[exp > 20].index)

    u = eval_expr('unique(search(docs), over="source")', tables).to_pandas()
    assert sorted(u["source"].unique()) == ["s1", "s2"]
    assert len(u) == 2


def test_expr_joins_and_explode(tables):
    from solr_ray.expr import eval_expr

    j = eval_expr(
        'innerJoin(search(docs, fl="id,lang"), '
        'search(docs, fl="id,n_chars"), on="id")', tables).to_pandas()
    assert len(j) == 100 and {"lang", "n_chars"} <= set(j.columns)

    ex = eval_expr('cartesianProduct(search(tags), tags)', tables).to_pandas()
    assert len(ex) == 50 * 2 + 50 * 1


def test_expr_merge_intersect_complement(tables):
    from solr_ray.expr import eval_expr

    q_en = '{\\"op\\": \\"term\\", \\"field\\": \\"lang\\", \\"value\\": \\"en\\"}'
    m = eval_expr(
        f'merge(search(docs, q="{q_en}"), search(docs, q="{q_en}"))',
        tables).to_pandas()
    n_en = int((tables["_docs_pd"].lang == "en").sum())
    assert len(m) == 2 * n_en


# ------------------------------------------------------------- JSON facets

def test_json_facet_terms_with_stats(tables):
    from solr_ray.ops.jsonfacet import json_facet

    resp = json_facet(tables["docs"], {
        "type": "terms", "field": "lang", "limit": 10,
        "facet": {"avg_chars": "avg(n_chars)", "n_sources": "unique(source)"},
    })
    exp = tables["_docs_pd"].groupby("lang")
    by_val = {b["val"]: b for b in resp["buckets"]}
    for lang, g in exp:
        b = by_val[lang]
        assert b["count"] == len(g)
        assert b["avg_chars"] == pytest.approx(g["n_chars"].mean())
        assert b["n_sources"] == g["source"].nunique()
    counts = [b["count"] for b in resp["buckets"]]
    assert counts == sorted(counts, reverse=True)


def test_json_facet_nested(tables):
    from solr_ray.ops.jsonfacet import json_facet

    resp = json_facet(tables["docs"], {
        "type": "terms", "field": "lang",
        "facet": {"by_source": {"type": "terms", "field": "source",
                                "facet": {"sum_chars": "sum(n_chars)"}}},
    })
    df = tables["_docs_pd"]
    for b in resp["buckets"]:
        g = df[df.lang == b["val"]]
        sub = {x["val"]: x for x in b["by_source"]["buckets"]}
        for src, gg in g.groupby("source"):
            assert sub[src]["count"] == len(gg)
            assert sub[src]["sum_chars"] == pytest.approx(gg["n_chars"].sum())


def test_json_facet_range_and_query(tables):
    from solr_ray.ops.jsonfacet import json_facet

    resp = json_facet(tables["docs"], {
        "type": "range", "field": "n_chars", "start": 0, "end": 500,
        "gap": 100, "limit": 10,
    })
    df = tables["_docs_pd"]
    for b in resp["buckets"]:
        lo = b["val"]
        exp = ((df.n_chars >= lo) & (df.n_chars < lo + 100)).sum()
        assert b["count"] == exp

    q = json_facet(tables["docs"], {
        "type": "query",
        "q": {"op": "term", "field": "lang", "value": "de"},
        "facet": {"avg_chars": "avg(n_chars)"},
    })
    g = df[df.lang == "de"]
    assert q["count"] == len(g)
    assert q["avg_chars"] == pytest.approx(g["n_chars"].mean())


def test_select_evaluator_calls(ray_session):
    import pyarrow as pa
    import ray.data

    from solr_ray.expr import eval_expr

    t = pa.table({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0],
                  "s": ["x", "yy", "zzz"]})
    tables = {"t": ray.data.from_arrow(t)}
    out = eval_expr(
        'select(search(t), "add(a, b) as apb", "mul(a, 2) as a2", '
        '"length(s) as slen", "a as keep_a")', tables).to_pandas()
    assert list(out.columns) == ["apb", "a2", "slen", "keep_a"]
    assert out.apb.tolist() == [11.0, 22.0, 33.0]
    assert out.a2.tolist() == [2.0, 4.0, 6.0]
    assert out.slen.tolist() == [1, 2, 3]
    assert out.keep_a.tolist() == [1.0, 2.0, 3.0]


def test_broadcast_side_guard(ray_session):
    import ray.data

    from solr_ray.expr import _guarded_small_side

    big = ray.data.range(100)
    with pytest.raises(ValueError, match="broadcast to the driver"):
        _guarded_small_side(big, "hashJoin 'hashed'", max_rows=50)
    ok = _guarded_small_side(big, "fetch lookup", max_rows=100)
    assert len(ok) == 100


def test_json_facet_percentile(ray_session):
    """percentile(field, p) = the reference PercentileAgg (t-digest):
    distributed terms path, query-facet flat path, and the nested pandas
    path all stay within 1% rank error of the true quantile."""
    import pyarrow as pa
    import ray.data

    from solr_ray.ops.jsonfacet import json_facet

    rng = np.random.default_rng(11)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 30_000)]
    vals = rng.normal(100, 25, 30_000)
    t = pa.table({"lang": langs, "v": vals})
    ds = ray.data.from_arrow(t).repartition(8)

    def rank_err(sub, q, est):
        return abs((sub <= est).mean() - q)

    # terms facet (distributed combiner path)
    out = json_facet(ds, {"type": "terms", "field": "lang", "limit": 10,
                          "facet": {"p50": "percentile(v, 50)",
                                    "p90": "percentile(v, 90)"}})
    assert len(out["buckets"]) == 3
    for b in out["buckets"]:
        sub = vals[langs == b["val"]]
        assert rank_err(sub, 0.5, b["p50"]) < 0.01
        assert rank_err(sub, 0.9, b["p90"]) < 0.01

    # query facet (flat _agg_dataset path, mixed with other aggs)
    out2 = json_facet(ds, {"type": "query", "q": {"op": "term",
                                                  "field": "lang",
                                                  "value": "en"},
                           "facet": {"p50": "percentile(v, 50)",
                                     "mx": "max(v)"}})
    sub = vals[langs == "en"]
    assert out2["count"] == len(sub)
    assert rank_err(sub, 0.5, out2["p50"]) < 0.01
    assert out2["mx"] == sub.max()

    # nested path (per-bucket pandas evaluator)
    out3 = json_facet(ds, {"type": "terms", "field": "lang", "limit": 3,
                           "facet": {"p50": "percentile(v, 50)",
                                     "sub": {"type": "range", "field": "v",
                                             "start": 0, "end": 200,
                                             "gap": 100}}})
    for b in out3["buckets"]:
        sub = vals[langs == b["val"]]
        assert rank_err(sub, 0.5, b["p50"]) < 0.01
