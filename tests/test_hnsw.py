"""Per-segment HNSW ANN (ops/hnsw.py): recall vs brute force + persistence."""

import numpy as np
import pyarrow as pa
import pytest

from solr_ray.ops.hnsw import HNSWGraph, build_hnsw_index, knn_hnsw_index


def _vectors(n, d, seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def _brute_topk(vecs, q, k):
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qq = q / np.linalg.norm(q)
    sims = v @ qq
    return np.argsort(-sims)[:k]


def test_graph_recall_single_segment():
    vecs = _vectors(2000, 32)
    g = HNSWGraph.build(vecs, m=16, ef_construction=100)
    rng = np.random.default_rng(9)
    hits = total = 0
    for _ in range(20):
        q = rng.standard_normal(32).astype(np.float32)
        truth = set(_brute_topk(vecs, q, 10).tolist())
        got, sims = g.search(q, k=10, ef=80)
        assert (np.diff(sims) <= 1e-9).all()  # best-first
        hits += len(truth & set(got.tolist()))
        total += 10
    assert hits / total >= 0.9, hits / total


def test_graph_roundtrip_tables():
    vecs = _vectors(300, 16)
    g = HNSWGraph.build(vecs, m=8, ef_construction=60)
    vt, at = g.to_tables()
    g2 = HNSWGraph.from_tables(vt, at)
    q = _vectors(1, 16, seed=5)[0]
    i1, s1 = g.search(q, k=5, ef=50)
    i2, s2 = g2.search(q, k=5, ef=50)
    assert np.array_equal(i1, i2) and np.allclose(s1, s2)


def test_distributed_index_recall(ray_session, tmp_path):
    import ray.data

    n, d = 3000, 24
    vecs = _vectors(n, d, seed=11)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array(vecs.tolist(),
                              pa.list_(pa.float32())),
    }))
    out = str(tmp_path / "hnsw")
    meta = build_hnsw_index(ds, out, num_segments=3, m=12,
                            ef_construction=80)
    assert sum(meta["sizes"].values()) == n
    queries = _vectors(10, d, seed=21)
    res = knn_hnsw_index(out, queries, k=10, ef=80).to_pandas()
    hits = 0
    for qi in range(10):
        truth = set(_brute_topk(vecs, queries[qi], 10).tolist())
        got = set(res[res.qid == qi].vec_id.tolist())
        hits += len(truth & got)
    assert hits / 100 >= 0.9, hits / 100
    # rank column is 1..k, sims non-increasing per query
    g0 = res[res.qid == 0]
    assert list(g0["rank"]) == list(range(1, 11))
    assert g0.sim.is_monotonic_decreasing or np.allclose(
        np.diff(g0.sim), 0, atol=1e-9) or (np.diff(g0.sim) <= 1e-9).all()
