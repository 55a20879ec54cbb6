"""igain / train_logit / classify_logit / hash_range tests."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _corpus():
    # 'pos' docs contain "spam"; negatives contain "ham"; "common" in all
    rows = []
    for i in range(40):
        pos = i % 2 == 0
        body = ("spam spam common offer" if pos else "ham common meeting")
        rows.append({"doc_id": i, "text": body + f" filler{i % 5}",
                     "label": "pos" if pos else "neg"})
    return ray.data.from_items(rows).repartition(4)


def _h(a, b):
    if a <= 0 or a >= b or b <= 0:
        return 0.0
    p, q = a / b, (b - a) / b
    return -p * math.log(p) - q * math.log(q)


def test_igain_features():
    from solr_ray.ops.ml import igain_features

    out = igain_features(_corpus(), "text", "label", "pos").to_pandas()
    ig = dict(zip(out["term"], out["igain"]))
    # perfect separators get the full class entropy; 'common' gets 0
    assert abs(ig["spam"] - _h(20, 40)) < 1e-12
    assert abs(ig["ham"] - _h(20, 40)) < 1e-12
    assert abs(ig["common"]) < 1e-12
    assert abs(ig["filler0"]) < 1e-9  # uncorrelated with class
    row = out[out.term == "spam"].iloc[0]
    assert row["df_pos"] == 20 and row["df_all"] == 20
    top = out.sort_values(["igain", "term"],
                          ascending=[False, True]).head(4)["term"].tolist()
    # all four perfect separators tie at the full class entropy
    assert set(top) == {"spam", "ham", "offer", "meeting"}


def test_train_logit_separable():
    from solr_ray.ops.ml import classify_logit, train_logit

    w, b, hist = train_logit(_corpus(), "text", "label", "pos",
                             ["spam", "ham"], iters=60, lr=0.5)
    # loss decreases monotonically on full-batch GD with stable lr
    losses = [l for _, l in hist]
    assert all(l2 <= l1 + 1e-12 for l1, l2 in zip(losses, losses[1:]))
    assert losses[-1] < losses[0] / 2
    assert w[0] > 0 > w[1]  # spam -> positive, ham -> negative
    scored = classify_logit(_corpus(), "text", ["spam", "ham"],
                            list(w), b).to_pandas()
    pred = scored["score"] > 0.5
    truth = scored["label"] == "pos"
    assert (pred == truth).all()  # separable -> perfect accuracy


def test_classify_logit_fixed_weights():
    from solr_ray.ops.ml import classify_logit

    t = ray.data.from_items([
        {"id": 1, "text": "a a b"},      # tf = (2, 1)
        {"id": 2, "text": "c"},          # tf = (0, 0)
    ])
    out = classify_logit(t, "text", ["a", "b"], [1.0, -2.0],
                         0.5).to_pandas().sort_values("id")
    z1 = 0.5 + 1.0 * 2 + (-2.0) * 1
    assert abs(out["score"].iloc[0] - 1 / (1 + math.exp(-z1))) < 1e-12
    assert abs(out["score"].iloc[1] - 1 / (1 + math.exp(-0.5))) < 1e-12


def test_hash_range_partitions():
    from solr_ray.ops.queryfilter import filter_query

    ds = ray.data.from_items(
        [{"id": f"doc{i}", "v": i} for i in range(200)]).repartition(4)
    n = 0
    seen = set()
    B = 16
    for lo, hi in [(0, 3), (4, 7), (8, 11), (12, 15)]:
        part = filter_query(ds, {"op": "hash_range", "field": "id",
                                 "lo": lo, "hi": hi,
                                 "buckets": B}).to_pandas()
        ids = set(part["id"])
        assert not (ids & seen)  # ranges are disjoint
        seen |= ids
        n += len(ids)
    assert n == 200  # and they cover
    # deterministic across evaluations
    again = filter_query(ds, {"op": "hash_range", "field": "id",
                              "lo": 0, "hi": 3, "buckets": B}).to_pandas()
    assert set(again["id"]) <= seen


def test_fingerprint_md5_matches_duckdb_semantics():
    import duckdb

    from solr_ray.ops.textstats import rolling_fingerprint_md5

    texts = ["red blue green gold gray pink", "a b", "", "one two three four"]
    for t in texts:
        got = rolling_fingerprint_md5(t)
        toks = t.split()
        if not toks:
            assert got == 0
            continue
        grams = ([" ".join(toks)] if len(toks) < 4 else
                 [" ".join(toks[i:i + 4]) for i in range(len(toks) - 3)])
        want = duckdb.execute(
            "SELECT list_aggregate(list_transform($1::VARCHAR[], g -> "
            "CAST(md5_number_lower(g) % 9223372036854775808 AS BIGINT)), "
            "'min')", [grams]).fetchone()[0]
        assert got == want


def test_minhash_batch_matches_scalar_signatures():
    """The batched permute-min must produce EXACTLY the scalar
    minhash_signature values (bucket hashes depend on raw bytes)."""
    import numpy as np

    from solr_ray.ops.dedup import (
        _MERSENNE_P, _perm_params, _shingle_hashes, minhash_signature)

    texts = ["the quick brown fox", "", "abc", "aaaaa bbbbb ccccc"]
    parts = [_shingle_hashes(t, 5) & np.uint64((1 << 61) - 1)
             for t in texts]
    counts = np.array([max(p.size, 1) for p in parts])
    flat = np.concatenate([p if p.size else np.zeros(1, np.uint64)
                           for p in parts])
    a, b = _perm_params(64)
    # wrapping multiply-add permutation (round 4: the mod-Mersenne
    # reduction was the minhash hot spot and is gone from BOTH paths)
    with np.errstate(over="ignore"):
        vals = np.outer(a, flat) + b[:, None]
    offs = np.zeros(len(texts), np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    sig = np.minimum.reduceat(vals, offs, axis=1)
    sig[:, [p.size == 0 for p in parts]] = 0
    for i, t in enumerate(texts):
        assert np.array_equal(sig[:, i], minhash_signature(t, 64, 5)), t


def test_add_fingerprint_batch_matches_scalar():
    import pyarrow as pa

    from solr_ray.ops.textstats import add_fingerprint, rolling_fingerprint

    texts = ["the quick brown fox jumps", "", "a b",
             "hash join merge sort scan", "x " * 40]
    t = pa.table({"text": pa.array(texts)})
    got = add_fingerprint(t)["fingerprint"].to_pylist()
    assert got == [rolling_fingerprint(x) for x in texts]


def test_model_artifact_actor_pool_reuse(ray_session, tmp_path):
    """The model-in-__init__ pattern: artifact loads once per ACTOR, not
    per batch — with concurrency=2 over many blocks, the per-row actor
    tags collapse to <=2 distinct uuids, and scores match classify_logit
    (token-order float-sum tolerance only)."""
    import ray.data

    from solr_ray.ops.ml import (classify_logit, save_model_artifact,
                                 score_with_model, train_logit)

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["the", "data", "table", "query"]
    w, b, _ = train_logit(ds, "text", "lang", "en", terms, iters=3)
    art = str(tmp_path / "model.npz")
    save_model_artifact(art, terms, w, b)
    out = score_with_model(ds.repartition(10), art, concurrency=2,
                           batch_size=16, tag_actor=True).to_pandas()
    ref = classify_logit(ds, "text", terms, list(w), b).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert np.allclose(out["score"].to_numpy(), ref["score"].to_numpy(),
                       atol=1e-12)
    n_batches = max(1, len(out) // 16)
    assert len(set(out["__actor"])) <= 2 < n_batches
