"""IVF ANN (ops/ivf.py): recall vs brute force + partition pruning."""

import numpy as np
import pyarrow as pa
import pytest

from solr_ray.ops.ivf import build_ivf_index, kmeans_fit, knn_ivf_index


def _clustered_vectors(n, d, n_clusters=8, seed=13):
    """Clustered data (IVF's sweet spot): gaussian blobs on the sphere."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 3.0
    assign = rng.integers(0, n_clusters, n)
    return (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)


def _brute_topk(vecs, q, k):
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qq = q / np.linalg.norm(q)
    return np.argsort(-(v @ qq))[:k]


def test_kmeans_converges_and_normalizes():
    x = _clustered_vectors(500, 16)
    cent = kmeans_fit(x, 8, n_iters=10)
    assert cent.shape == (8, 16)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-5)
    with pytest.raises(ValueError):
        kmeans_fit(x[:4], 8)


def test_ivf_index_recall_and_pruning(ray_session, tmp_path):
    import ray.data

    n, d = 4000, 24
    vecs = _clustered_vectors(n, d)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    }))
    out = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, out, n_lists=16, train_sample=2000)
    assert meta["n_lists"] == 16

    rng = np.random.default_rng(31)
    queries = vecs[rng.choice(n, 10, replace=False)] + \
        0.1 * rng.standard_normal((10, d)).astype(np.float32)
    # I/O pruning: a few queries at small nprobe read strictly fewer
    # lists than exist (10 queries x nprobe=4 can cover all 16)
    stats = {}
    knn_ivf_index(out, queries[:3], k=10, nprobe=2, stats_out=stats)
    assert stats["lists_probed"] < stats["lists_total"]

    res = knn_ivf_index(out, queries, k=10, nprobe=4).to_pandas()
    hits = 0
    for qi in range(10):
        truth = set(_brute_topk(vecs, queries[qi], 10).tolist())
        got = set(res[res.qid == qi].vec_id.tolist())
        hits += len(truth & got)
    assert hits / 100 >= 0.85, hits / 100
    # nprobe = all lists -> exact (recall 1.0)
    res_all = knn_ivf_index(out, queries, k=10, nprobe=16).to_pandas()
    hits = 0
    for qi in range(10):
        truth = set(_brute_topk(vecs, queries[qi], 10).tolist())
        hits += len(truth & set(res_all[res_all.qid == qi].vec_id))
    assert hits == 100


def test_kmeans_dead_lists_get_distinct_reseeds():
    """More lists than natural clusters: reseeded centroids must be
    distinct, so every list stays usable."""
    rng = np.random.default_rng(2)
    # 2 tight blobs, 8 lists -> several dead lists per iteration
    centers = rng.standard_normal((2, 8)) * 5.0
    x = (centers[rng.integers(0, 2, 200)]
         + 0.01 * rng.standard_normal((200, 8))).astype(np.float32)
    cent = kmeans_fit(x, 8, n_iters=8)
    # reseeds draw DISTINCT worst-covered points, so no two centroids are
    # bit-identical (near-identical is legitimate for tight blobs)
    assert np.unique(cent, axis=0).shape[0] == 8


def test_rebuild_replaces_stale_partitions(ray_session, tmp_path):
    import ray.data

    n, d = 400, 8
    vecs = _clustered_vectors(n, d, n_clusters=4, seed=3)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    }))
    out = str(tmp_path / "ivf2")
    build_ivf_index(ds, out, n_lists=4, train_sample=400)
    build_ivf_index(ds, out, n_lists=4, train_sample=400)  # rebuild
    res = knn_ivf_index(out, vecs[:1], k=5, nprobe=4).to_pandas()
    assert res.vec_id.is_unique  # no duplicate rows from stale partitions
