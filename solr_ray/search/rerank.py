"""Rerank stage: rescore the top-N of a first-pass result with a second
model, keeping the rest of the ranking intact.

Reference: ReRankQParserPlugin (`rerank` in QParserPlugin.java:50-91 —
rescore top reRankDocs with a second query, blending scores) and the LTR
module's rescoring (solr/modules/ltr/.../LTRScoringQuery.java:53): features
per (query, doc) -> model score. Here the "model" is any callable
(features_df) -> scores; a LinearModel mirrors LTR's LinearModel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class LinearModel:
    """LTR LinearModel: score = w · features (+ bias)."""

    def __init__(self, weights: dict[str, float], bias: float = 0.0):
        self.weights = weights
        self.bias = bias

    def __call__(self, feats: pd.DataFrame) -> np.ndarray:
        s = np.full(len(feats), self.bias, dtype=np.float64)
        for name, w in self.weights.items():
            s = s + w * feats[name].to_numpy(dtype=np.float64)
        return s


class MultipleAdditiveTreesModel:
    """LTR MultipleAdditiveTreesModel (gradient-boosted tree ensemble).

    Mirrors solr/modules/ltr/.../model/MultipleAdditiveTreesModel.java:
    score = sum over trees of tree.weight * leaf(features), routing left
    when feature <= threshold. Trees are nested dicts:
        {"feature": name, "threshold": x, "left": <node>, "right": <node>}
      | {"value": v}
    Evaluation is vectorized: each split routes the whole candidate set
    with a boolean mask (no per-row python).
    """

    def __init__(self, trees: list[dict]):
        self.trees = trees  # each: {"weight": w, "root": node}

    @staticmethod
    def _eval_node(node: dict, feats: pd.DataFrame,
                   mask: np.ndarray, out: np.ndarray) -> None:
        if "value" in node:
            out[mask] += float(node["value"])
            return
        f = feats[node["feature"]].to_numpy(dtype=np.float64)
        go_left = mask & (f <= float(node["threshold"]))
        MultipleAdditiveTreesModel._eval_node(
            node["left"], feats, go_left, out)
        MultipleAdditiveTreesModel._eval_node(
            node["right"], feats, mask & ~go_left, out)

    def __call__(self, feats: pd.DataFrame) -> np.ndarray:
        s = np.zeros(len(feats), dtype=np.float64)
        for tree in self.trees:
            leaf = np.zeros(len(feats), dtype=np.float64)
            self._eval_node(tree["root"], feats,
                            np.ones(len(feats), dtype=bool), leaf)
            s = s + float(tree["weight"]) * leaf
        return s


_ACTIVATIONS = {
    "identity": lambda x: x,
    "relu": lambda x: np.maximum(x, 0.0),
    "leakyrelu": lambda x: np.where(x >= 0.0, x, 0.01 * x),
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "tanh": np.tanh,
}


class NeuralNetworkModel:
    """LTR NeuralNetworkModel (solr/modules/ltr/.../model/
    NeuralNetworkModel.java): dense layers, each
    out = activation(W @ in + b). Feature order fixes the input vector;
    the whole candidate set evaluates as one matmul per layer.
    """

    def __init__(self, features: list[str],
                 layers: list[dict]):
        """layers: [{"matrix": [[...]], "bias": [...],
                     "activation": "relu"|...}, ...]; the last layer must
        produce one output per row."""
        self.features = features
        self.layers = [
            (np.asarray(l["matrix"], dtype=np.float64),
             np.asarray(l["bias"], dtype=np.float64),
             _ACTIVATIONS[l.get("activation", "identity")])
            for l in layers
        ]

    def __call__(self, feats: pd.DataFrame) -> np.ndarray:
        # per-unit accumulation in fixed order (bias first, then weights
        # ascending) instead of BLAS matmul: keeps float rounding identical
        # to a plain-arithmetic re-implementation (the SQL oracle), since
        # dgemm kernels may use FMA and different summation orders
        x = [feats[f].to_numpy(dtype=np.float64) for f in self.features]
        n = len(feats)
        for w, b, act in self.layers:
            nxt = []
            for i in range(w.shape[0]):
                s = np.full(n, b[i], dtype=np.float64)
                for j in range(w.shape[1]):
                    s = s + w[i, j] * x[j]
                nxt.append(act(s))
            x = nxt
        return x[0]


def rerank_results(results_ds, feature_fn, model, rerank_depth: int = 50,
                   blend_weight: float = 1.0):
    """Rescore rank <= rerank_depth rows per qid:
    new_score = blend_weight * model(features) + first_pass_score
    (the reference's reRankWeight semantics). Rows deeper than rerank_depth
    keep their original score and order below all reranked rows.

    feature_fn(group_df) -> feature DataFrame aligned to the group rows —
    runs inside the per-qid map_groups so feature extraction parallelizes
    per query.
    """

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rank", kind="stable").reset_index(drop=True)
        top = g.iloc[:rerank_depth].copy()
        rest = g.iloc[rerank_depth:].copy()
        feats = feature_fn(top)
        top["score"] = blend_weight * model(feats) + top["score"].to_numpy()
        top = top.sort_values(["score", "doc_id"], ascending=[False, True],
                              kind="stable")
        out = pd.concat([top, rest]).reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
        return out

    return results_ds.groupby("qid").map_groups(regroup, batch_format="pandas")
