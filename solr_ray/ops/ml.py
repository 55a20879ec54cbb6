"""Streaming ML operators: igain feature selection, logistic regression.

Reference semantics: Solr's text-classification streaming stack —
`features(igain)` ranks terms by information gain against a binary class
(solr/core/src/java/org/apache/solr/search/IGainTermsQParserPlugin.java:43),
`train()` fits a logistic-regression model by iterative full-batch
gradient descent over the sharded collection
(solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/stream/
TextLogitStream.java:60), and `classify()`/`tlogit` scores documents with
a fixed model (ClassifyStream.java). Re-expressed Ray-Data-first:

- igain: per-batch combiner emits one (term, df_pos, df_all) partial per
  (term, batch) — document-level presence, never per posting — then ONE
  small groupby(term) and a vectorized closed-form IG over the merged
  counts. The class totals come from a single tiny aggregate. Scales like
  term_doc_freq: the shuffle carries vocab-sized rows.

- train: the feature matrix (per-doc tf of the chosen terms + intercept)
  is materialized ONCE as numeric columns; each GD iteration is one
  map_batches pass emitting the partial gradient X^T(sigmoid(Xw) - y) and
  partial log-loss, merged on the driver (a k+1-float vector per batch —
  the only driver state is the weight vector itself, exactly
  TextLogitStream's per-iteration shard->driver weight exchange).

- classify: pure vectorized map_batches inference (sigmoid(Xw)).

IG definition (binary class, binary term presence; natural log):
with n docs, np positives, nt docs containing t, ntp positives containing
t, and H(a, b) = -(a/b)ln(a/b) - ((b-a)/b)ln((b-a)/b) (0 when a==0 or
a==b): IG(t) = H(np, n) - (nt/n)H(ntp, nt) - ((n-nt)/n)H(np-ntp, n-nt).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from solr_ray.analysis.chain import process_analyzer


def _entropy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized H(a, b) with the 0log0 = 0 convention."""
    with np.errstate(divide="ignore", invalid="ignore"):
        p = a / b
        q = (b - a) / b
        h = -p * np.log(p) - q * np.log(q)
    h[(a <= 0) | (a >= b) | (b <= 0)] = 0.0
    return h


def igain_features(ds, text_col: str, label_col: str, positive,
                   analyzer: str = "whitespace"):
    """Dataset(term, df_pos, df_all, igain) over the whole vocabulary.

    Rank/limit downstream (`sort('igain', descending=True).limit(k)` for
    features(igain) top-k)."""

    def partial(t: pa.Table) -> pa.Table:
        az = process_analyzer(analyzer)
        toks = az.tokenize_array(t[text_col])
        flat = toks.flatten()
        n = len(t)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), counts)
        is_pos = pc.equal(t[label_col], positive).to_numpy(
            zero_copy_only=False).astype(np.int64)
        prs = (
            pa.table({"term": flat, "doc": pa.array(parent)})
            .group_by(["term", "doc"], use_threads=False)
            .aggregate([])
        )
        lab = is_pos[prs["doc"].to_numpy(zero_copy_only=False)]
        agg = (
            pa.table({"term": prs["term"], "pos": pa.array(lab),
                      "one": pa.array(np.ones(len(prs), np.int64))})
            .group_by("term", use_threads=False)
            .aggregate([("pos", "sum"), ("one", "sum")])
        )
        return pa.table({"term": agg["term"], "df_pos": agg["pos_sum"],
                         "df_all": agg["one_sum"]})

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_pos", alias_name="df_pos"),
                   Sum("df_all", alias_name="df_all"))
    )
    # one tiny pass for the class totals
    n = ds.count()
    n_pos = ds.map_batches(
        lambda t: pa.table({"c": pa.array(
            [int(pc.sum(pc.cast(pc.equal(t[label_col], positive),
                                pa.int64())).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").sum("c")

    nf, npf = float(n), float(n_pos)

    def score(t: pa.Table) -> pa.Table:
        ntp = t["df_pos"].to_numpy(zero_copy_only=False).astype(np.float64)
        nt = t["df_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        base = _entropy(np.array([npf]), np.array([nf]))[0]
        ig = (base
              - (nt / nf) * _entropy(ntp, nt)
              - ((nf - nt) / nf) * _entropy(npf - ntp, nf - nt))
        return t.append_column("igain", pa.array(ig, pa.float64()))

    return merged.map_batches(score, batch_format="pyarrow")


def term_features(ds, text_col: str, terms: list[str],
                  analyzer: str = "whitespace", keep: list[str] = ()):
    """Append f0..f{k-1} int64 tf columns (occurrence counts of each
    term) — the TextLogitStream feature vector, extracted once."""

    def feats(t: pa.Table) -> pa.Table:
        az = process_analyzer(analyzer)
        toks = az.tokenize_array(t[text_col])
        flat = toks.flatten()
        n = len(t)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), counts)
        cols = {c: t[c] for c in t.column_names if not keep or c in keep
                or c == text_col}
        for i, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(parent[hit], minlength=n).astype(np.int64)
            cols[f"f{i}"] = pa.array(tf)
        return pa.table(cols)

    return ds.map_batches(feats, batch_format="pyarrow")


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def train_logit(ds, text_col: str, label_col: str, positive,
                terms: list[str], iters: int = 20, lr: float = 0.1,
                analyzer: str = "whitespace"):
    """Full-batch GD logistic regression; returns (weights[k], bias,
    history[(iter, loss)]). Deterministic: zero init, fixed order-free
    partial-sum merge (float sums over per-batch partials)."""
    k = len(terms)
    feat = term_features(ds, text_col, terms, analyzer=analyzer,
                         keep=[label_col]).materialize()
    n = feat.count()
    w = np.zeros(k + 1, dtype=np.float64)  # [w..., bias]
    history = []
    import ray as _ray

    for it in range(iters):
        wv = w  # captured by value per iteration

        def grad_part(t: pa.Table, _w=wv) -> pa.Table:
            X = np.column_stack(
                [t[f"f{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
                 for i in range(k)] + [np.ones(len(t))])
            y = pc.equal(t[label_col], positive).to_numpy(
                zero_copy_only=False).astype(np.float64)
            p = _sigmoid(X @ _w)
            g = X.T @ (p - y)
            eps = 1e-12
            loss = -float(np.sum(y * np.log(p + eps)
                                 + (1 - y) * np.log(1 - p + eps)))
            return pa.table({"g": pa.array(np.append(g, loss), pa.float64()),
                             "i": pa.array(np.arange(k + 2, dtype=np.int64))})

        tot = np.zeros(k + 2)
        for ref in feat.map_batches(
                grad_part, batch_format="pyarrow").to_arrow_refs():
            t = _ray.get(ref)
            tot[np.asarray(t["i"])] += np.asarray(t["g"])
        w = w - lr * tot[:k + 1] / n
        history.append((it, tot[k + 1] / n))
    return w[:k], w[k], history


def classify_logit(ds, text_col: str, terms: list[str],
                   weights: list[float], bias: float,
                   analyzer: str = "whitespace", out_col: str = "score"):
    """Vectorized inference: out_col = sigmoid(tf . weights + bias)."""
    wv = np.asarray(weights, dtype=np.float64)

    def score(t: pa.Table) -> pa.Table:
        az = process_analyzer(analyzer)
        toks = az.tokenize_array(t[text_col])
        flat = toks.flatten()
        n = len(t)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), counts)
        z = np.full(n, float(bias))
        for i, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            z += wv[i] * np.bincount(parent[hit], minlength=n)
        return t.append_column(out_col, pa.array(_sigmoid(z), pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def save_model_artifact(path: str, terms: list[str], weights, bias: float,
                        analyzer: str = "whitespace") -> None:
    """Persist a trained text-logit model as a real on-disk artifact
    (npz: vocab + weight vector + bias + analyzer name) — the thing a
    model registry would hand a serving fleet. Written atomically."""
    tmp = path + ".tmp.npz"
    np.savez(tmp.removesuffix(".npz"),
             terms=np.asarray(terms, dtype=object).astype(str),
             weights=np.asarray(weights, dtype=np.float64),
             bias=np.float64(bias),
             analyzer=np.str_(analyzer))
    import os
    os.replace(tmp, path)


class ModelScoreActor:
    """Model-in-__init__ actor stage (the pattern every model-scoring
    map_batches stage on this engine should follow): the ARTIFACT loads
    from disk ONCE PER ACTOR — vocab index, weight vector, compiled
    analyzer — never per batch; __call__ is pure vectorized inference
    (one index_in against the vocab + one scatter-add per batch, no
    per-term scan). Use as
    ds.map_batches(ModelScoreActor, fn_constructor_args=(path,),
    concurrency=N, batch_size=B). With tag_actor=True each output row
    carries the actor's uuid so tests can assert the pool is REUSED
    (distinct tags == pool size, not batch count)."""

    def __init__(self, artifact_path: str, text_col: str = "text",
                 out_col: str = "score", tag_actor: bool = False):
        import uuid

        z = np.load(artifact_path, allow_pickle=False)
        self.terms = [str(x) for x in z["terms"]]
        self.weights = z["weights"].astype(np.float64)
        self.bias = float(z["bias"])
        self.az = process_analyzer(str(z["analyzer"]))
        self.vocab = pa.array(self.terms, pa.string())
        self.text_col = text_col
        self.out_col = out_col
        self.tag = uuid.uuid4().hex if tag_actor else None

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = self.az.tokenize_array(t[self.text_col])
        flat = toks.flatten()
        n = len(t)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), counts)
        idx = pc.index_in(flat, value_set=self.vocab)
        iv = idx.to_numpy(zero_copy_only=False)
        hit = ~np.isnan(iv) if iv.dtype.kind == "f" else \
            ~idx.is_null().to_numpy(zero_copy_only=False)
        z = np.full(n, self.bias)
        np.add.at(z, parent[hit], self.weights[iv[hit].astype(np.int64)])
        t = t.append_column(self.out_col, pa.array(_sigmoid(z), pa.float64()))
        if self.tag is not None:
            t = t.append_column("__actor", pa.array([self.tag] * n))
        return t


def score_with_model(ds, artifact_path: str, text_col: str = "text",
                     out_col: str = "score", concurrency: int = 4,
                     batch_size: int = 1024, tag_actor: bool = False):
    """Actor-pool model inference over a Dataset (artifact loaded once per
    actor, vectorized per batch)."""
    return ds.map_batches(
        ModelScoreActor,
        fn_constructor_args=(artifact_path, text_col, out_col, tag_actor),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


__all__ = ["igain_features", "term_features", "train_logit",
           "classify_logit", "save_model_artifact", "ModelScoreActor",
           "score_with_model"]
