"""Spellcheck/suggest + rerank tests."""

import numpy as np
import pandas as pd
import pytest

import ray.data


@pytest.fixture(scope="module")
def small_index(pages_300_path, tmp_path_factory):
    from solr_ray.pipelines.build_index import build_index

    out = str(tmp_path_factory.mktemp("spell") / "idx")
    build_index(pages_300_path, out, analyzer="text_en", num_buckets=4)
    return out


def test_spellcheck_exact_and_typo(small_index):
    from solr_ray.search.spellcheck import SpellChecker

    sc = SpellChecker(small_index, max_edits=2)
    # pick a real vocab term
    term = max(sc.df, key=lambda t: (sc.df[t], len(t) > 4))
    assert sc.suggest(term)[0] == (term, 0, sc.df[term])
    typo = term[:-1] + ("x" if term[-1] != "x" else "y")
    got = sc.suggest(typo, 5)
    assert got, typo
    assert term in [g[0] for g in got]
    dist = dict((g[0], g[1]) for g in got)
    assert dist[term] <= 2


def test_spellcheck_orders_by_distance_then_df(small_index):
    from solr_ray.search.spellcheck import SpellChecker

    sc = SpellChecker(small_index)
    term = sorted(sc.df, key=lambda t: -sc.df[t])[0]
    got = sc.suggest(term + "z", 5)
    dists = [d for _, d, _ in got]
    assert dists == sorted(dists)


def test_prefix_suggest(small_index):
    from solr_ray.search.spellcheck import SpellChecker

    sc = SpellChecker(small_index)
    term = sorted(sc.df, key=lambda t: -sc.df[t])[0]
    pre = term[:2]
    got = sc.prefix_suggest(pre, 10)
    assert all(t.startswith(pre) for t, _ in got)
    assert term in [t for t, _ in got]
    dfs = [df for _, df in got]
    assert dfs == sorted(dfs, reverse=True)


def test_correct_query(small_index):
    from solr_ray.analysis.chain import get_analyzer
    from solr_ray.search.spellcheck import SpellChecker

    sc = SpellChecker(small_index)
    az = get_analyzer("text_en")
    term = sorted(sc.df, key=lambda t: (-sc.df[t], t))[0]
    typo = term[:-1] + ("x" if term[-1] != "x" else "q")
    fixed = sc.correct_query(typo, az)
    assert term in fixed.split()


def test_spellcheck_actor_stage(small_index):
    from solr_ray.search.spellcheck import SpellChecker, SpellcheckActor

    sc = SpellChecker(small_index)
    term = sorted(sc.df, key=lambda t: (-sc.df[t], t))[0]
    typo = term[:-1] + ("x" if term[-1] != "x" else "q")
    qds = ray.data.from_items([{"qid": 0, "text": typo}])
    out = qds.map_batches(
        SpellcheckActor, fn_constructor_args=(small_index,),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert set(out.columns) == {"qid", "term", "suggestion", "distance", "df"}
    assert term in out["suggestion"].tolist()


def test_rerank_blends_and_preserves_tail():
    from solr_ray.search.rerank import LinearModel, rerank_results

    rows = []
    for qid in (0, 1):
        for r in range(1, 11):
            rows.append({"qid": qid, "rank": r, "doc_id": 100 - r,
                         "score": 10.0 - r, "boost": 1.0 if r == 5 else 0.0})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    model = LinearModel({"boost": 100.0})
    out = rerank_results(
        ds, feature_fn=lambda g: g[["boost"]], model=model,
        rerank_depth=5, blend_weight=1.0,
    ).to_pandas()
    for qid in (0, 1):
        g = out[out.qid == qid].sort_values("rank")
        # old rank-5 doc (boost=1) must now lead; ranks 6-10 untouched
        assert g.iloc[0]["doc_id"] == 95
        assert g.iloc[0]["score"] == pytest.approx(105.0)
        assert g[g["rank"] > 5]["doc_id"].tolist() == [94, 93, 92, 91, 90]
        assert g["rank"].tolist() == list(range(1, 11))


def test_multiple_additive_trees_routing():
    import numpy as np
    import pandas as pd

    from solr_ray.search.rerank import MultipleAdditiveTreesModel

    m = MultipleAdditiveTreesModel([
        {"weight": 2.0, "root": {
            "feature": "a", "threshold": 1.0,
            "left": {"value": 10.0},
            "right": {"feature": "b", "threshold": 0.0,
                      "left": {"value": -1.0}, "right": {"value": 3.0}}}},
        {"weight": 0.5, "root": {"value": 4.0}},
    ])
    feats = pd.DataFrame({"a": [0.5, 1.0, 2.0, 2.0],
                          "b": [9.0, 9.0, -1.0, 5.0]})
    # a<=1 -> 10; else b<=0 -> -1 else 3; plus 0.5*4 = 2
    assert np.allclose(m(feats), [22.0, 22.0, 0.0, 8.0])


def test_neural_network_model_forward():
    import numpy as np
    import pandas as pd

    from solr_ray.search.rerank import NeuralNetworkModel

    m = NeuralNetworkModel(["x", "y"], [
        {"matrix": [[1.0, -1.0], [2.0, 0.0]], "bias": [0.0, -3.0],
         "activation": "relu"},
        {"matrix": [[1.0, 10.0]], "bias": [0.5]},
    ])
    feats = pd.DataFrame({"x": [1.0, 2.0], "y": [0.0, 5.0]})
    # row0: h=[relu(1), relu(-1)]=[1,0] -> 1*1+10*0+0.5 = 1.5
    # row1: h=[relu(-3), relu(1)]=[0,1] -> 0+10+0.5 = 10.5
    assert np.allclose(m(feats), [1.5, 10.5])


def test_nn_activations():
    import numpy as np

    from solr_ray.search.rerank import _ACTIVATIONS

    x = np.array([-2.0, 0.0, 3.0])
    assert np.allclose(_ACTIVATIONS["relu"](x), [0, 0, 3])
    assert np.allclose(_ACTIVATIONS["leakyrelu"](x), [-0.02, 0, 3])
    assert np.allclose(_ACTIVATIONS["sigmoid"](x), 1 / (1 + np.exp(-x)))
    assert np.allclose(_ACTIVATIONS["tanh"](x), np.tanh(x))
    assert np.allclose(_ACTIVATIONS["identity"](x), x)


def test_suggest_weighted_prefix_and_fuzzy():
    from solr_ray.search.spellcheck import (
        build_suggest_dictionary,
        suggest_fuzzy_weighted,
        suggest_prefix_weighted,
    )

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "search searching searcher query"},
        {"doc_id": 2, "text": "search query engine"},
        {"doc_id": 3, "text": "search segment merge"},
    ])
    d = build_suggest_dictionary(docs, "text", analyzer="whitespace")
    out = suggest_prefix_weighted(d, "sea", 10).to_pandas()
    assert out["term"].tolist()[0] == "search"  # weight 3 beats the rest
    assert out["weight"].tolist()[0] == 3
    assert all(t.startswith("sea") for t in out["term"])
    ws = out["weight"].tolist()
    assert ws == sorted(ws, reverse=True)

    fz = suggest_fuzzy_weighted(d, "serch", 10, max_edits=2).to_pandas()
    assert "search" in fz["term"].tolist()
    ds_ = fz["distance"].tolist()
    assert ds_ == sorted(ds_)


def test_suggest_dictionary_explicit_columns():
    from solr_ray.search.spellcheck import (
        build_suggest_dictionary,
        suggest_prefix_weighted,
    )

    prods = ray.data.from_items([
        {"name": "apple", "popularity": 5},
        {"name": "apricot", "popularity": 9},
        {"name": "banana", "popularity": 7},
    ])
    d = build_suggest_dictionary(prods, term_col="name",
                                 weight_col="popularity")
    out = suggest_prefix_weighted(d, "ap", 10).to_pandas()
    assert out["term"].tolist() == ["apricot", "apple"]
    assert out["weight"].tolist() == [9, 5]
