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
