"""IVF (inverted-file) approximate nearest neighbor: k-means coarse
quantizer + centroid-partitioned vector storage.

The third ANN scale path next to `ops/similarity.build_lsh_index` (random
hyperplane buckets) and `ops/hnsw` (per-segment graphs): IVF learns a
DATA-DEPENDENT partitioning (Lloyd's k-means on a sample, the public
IVF-Flat scheme from the FAISS/Jégou line of work), writes vectors
partitioned by nearest centroid (hive layout `list=<i>/`), and answers a
query by scanning only the `nprobe` partitions whose centroids are
closest — both compute AND I/O scale with probed lists, not corpus size.

Ray layout mirrors the LSH index: training runs driver-side on a bounded
sample (`take`), assignment is one vectorized map_batches pass, storage is
`write_parquet(partition_cols=["list"])`, and the probed-partition read
path is plain parquet. Everything is cosine over L2-normalized float32.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


from solr_ray.ops.similarity import l2_normalize as _normalize


def kmeans_fit(sample: np.ndarray, n_lists: int, n_iters: int = 15,
               seed: int = 23) -> np.ndarray:
    """Lloyd's k-means on L2-normalized vectors (cosine == euclidean on
    the unit sphere up to ordering). Returns (n_lists, dim) float32
    centroids, themselves re-normalized each round (spherical k-means)."""
    x = _normalize(sample)
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    if n < n_lists:
        raise ValueError(f"sample ({n}) smaller than n_lists ({n_lists})")
    cent = x[rng.choice(n, n_lists, replace=False)].copy()
    for _ in range(n_iters):
        sims = x @ cent.T                     # (n, k)
        assign = np.argmax(sims, axis=1)
        # reseed each dead list with a DISTINCT worst-covered point
        # (successive points by ascending best-sim) — reseeding them all
        # with the same farthest point would keep the duplicates dead
        worst = iter(np.argsort(sims.max(axis=1)))
        for j in range(n_lists):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
            else:
                cent[j] = x[int(next(worst))]
        cent = _normalize(cent)
    return cent


def build_ivf_index(ds, out_dir: str, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_lists: int = 16,
                    train_sample: int = 10_000, seed: int = 23) -> dict:
    """Train centroids on a bounded sample, then write vectors PARTITIONED
    BY NEAREST CENTROID (out_dir/list=<j>/*.parquet). The train step is
    the only driver-side work and is O(train_sample · n_lists · dim)."""
    import ray
    import ray.data  # noqa: F401

    import shutil

    # fresh-build semantics: partitioned write APPENDS into existing
    # list=<j>/ dirs, so a crashed/stale build must not leak into this one
    # (_ivf.json is written LAST as the commit marker)
    shutil.rmtree(out_dir, ignore_errors=True)

    rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
    sample = np.stack([np.asarray(r[vec_col], dtype=np.float32)
                       for r in rows])
    cent = kmeans_fit(sample, n_lists, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(np.stack(
            [np.asarray(v, dtype=np.float32)
             for v in batch[vec_col].to_pylist()]))
        lst = np.argmax(m @ c.T, axis=1).astype(np.int64)
        if "list" in batch.column_names:
            batch = batch.drop_columns(["list"])
        return batch.append_column("list", pa.array(lst))

    (ds.select_columns([id_col, vec_col])
       .map_batches(assign, batch_format="pyarrow")
       .write_parquet(out_dir, partition_cols=["list"]))
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    meta = {"n_lists": n_lists, "dim": int(cent.shape[1]),
            "id_col": id_col, "vec_col": vec_col, "seed": seed}
    with open(os.path.join(out_dir, "_ivf.json"), "w") as f:
        json.dump(meta, f)
    return meta


def knn_ivf_index(index_dir: str, query_vecs: np.ndarray, k: int = 10,
                  nprobe: int = 4, stats_out: dict | None = None) -> pa.Table:
    """Approximate cosine top-k: read ONLY the nprobe partitions whose
    centroids are nearest each query. stats_out (optional) gets
    {"lists_probed", "lists_total"} so callers can assert the pruning."""
    with open(os.path.join(index_dir, "_ivf.json")) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_vecs, dtype=np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    wanted = sorted({int(j) for row in probe for j in row})
    if stats_out is not None:
        stats_out["lists_probed"] = len(wanted)
        stats_out["lists_total"] = int(meta["n_lists"])

    # load probed lists once, score every query that probes them
    per_q: list[list[tuple[float, int]]] = [[] for _ in range(q.shape[0])]
    probe_sets = [set(int(j) for j in row) for row in probe]
    for j in wanted:
        d = os.path.join(index_dir, f"list={j}")
        if not os.path.isdir(d):
            continue
        t = pq.read_table(d, columns=[id_col, vec_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vecs = _normalize(np.stack(
            [np.asarray(v, dtype=np.float32)
             for v in t[vec_col].to_pylist()]))
        qi_here = [qi for qi in range(q.shape[0]) if j in probe_sets[qi]]
        if not qi_here:
            continue
        sims = q[qi_here] @ vecs.T            # (nq_here, n_in_list)
        for row_i, qi in enumerate(qi_here):
            s = sims[row_i]
            if s.size > k:
                # keep EVERY candidate tied at the k-th boundary (the
                # repo-wide top-k invariant) — the final (-sim, id) sort
                # breaks ties deterministically
                kth = -np.partition(-s, k - 1)[k - 1]
                top = np.flatnonzero(s >= kth)
            else:
                top = np.arange(s.size)
            per_q[qi].extend(
                (float(s[t_]), int(ids[t_])) for t_ in top)

    rows = {"qid": [], id_col: [], "sim": [], "rank": []}
    for qi, cand in enumerate(per_q):
        cand.sort(key=lambda t: (-t[0], t[1]))
        for r, (sv, vid) in enumerate(cand[:k], 1):
            rows["qid"].append(qi)
            rows[id_col].append(vid)
            rows["sim"].append(sv)
            rows["rank"].append(r)
    return pa.table({
        "qid": pa.array(rows["qid"], pa.int64()),
        id_col: pa.array(rows[id_col], pa.int64()),
        "sim": pa.array(rows["sim"], pa.float64()),
        "rank": pa.array(rows["rank"], pa.int64()),
    })
