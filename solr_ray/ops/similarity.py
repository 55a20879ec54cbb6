"""Similarity search over embedding columns (list<float>).

Reference anchor: DenseVectorField + KnnQParser
(solr/core/src/java/org/apache/solr/schema/DenseVectorField.java:62-72,
solr/core/src/java/org/apache/solr/search/neural/KnnQParser.java:35 — HNSW
under Lucene). Ray-native design:

- brute-force cosine top-k: queries broadcast once via ray.put, each
  map_batches task does one numpy matmul per batch against its block —
  exact, streaming, no shuffle; per-batch partial top-k then a small
  groupby(query) merge.
- LSH-bucketed variant (scale path): random-hyperplane signatures partition
  vectors into buckets; queries probe their own bucket ± nearest buckets —
  approximate, turns the scan into a pruned per-bucket scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def l2_normalize(m: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization with a zero-norm guard (float32 in/out).
    The ONE copy shared by all ANN modules (similarity / hnsw / ivf)."""
    m = np.asarray(m, dtype=np.float32)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


_l2_normalize = l2_normalize  # internal alias, existing call sites


def _vec_matrix(col) -> np.ndarray:
    """(n, dim) float32 matrix from an Arrow list/fixed_size_list column.

    Zero-copy path: for FixedSizeList — or a List whose offsets are
    uniform — `values.to_numpy()` + reshape touches no Python objects.
    Ragged lists (invalid embeddings) fall back to the object path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        if pa.types.is_fixed_size_list(col.type):
            dim = col.type.list_size
            vals = col.values.to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                vals.reshape(len(col), dim), dtype=np.float32)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            offs = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            if len(widths) and (widths == widths[0]).all():
                dim = int(widths[0])
                vals = col.values.to_numpy(zero_copy_only=False)
                # offsets need not start at 0 on a sliced array
                vals = vals[offs[0]:offs[-1]]
                return np.ascontiguousarray(
                    vals.reshape(len(col), dim), dtype=np.float32)
    except (pa.ArrowInvalid, ValueError):
        pass
    return np.array(col.to_pylist(), dtype=np.float32)


def knn_brute(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
):
    """Exact top-k for each query row (query_id = row index of query_vecs).

    Returns Dataset(query_id, rank, id, score) ordered per query by
    (-score, id). Queries ship to workers ONCE (ray.put); each batch is one
    matmul; per-batch candidates merge in a small groupby(query_id).
    """
    import ray

    q = np.asarray(query_vecs, dtype=np.float32)
    if metric == "cosine":
        q = _l2_normalize(q)
    q_ref = ray.put(q)

    def score_batch(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _vec_matrix(batch[vec_col])
        if metric == "cosine":
            m = _l2_normalize(m)
            sims = m @ qm.T  # (n, Q)
        elif metric == "dot":
            sims = m @ qm.T
        else:  # euclidean -> negative distance so "higher is better"
            sims = -np.sqrt(
                np.maximum(
                    (m * m).sum(1)[:, None] - 2 * m @ qm.T + (qm * qm).sum(1)[None, :],
                    0,
                )
            )
        n, nq = sims.shape
        kk = min(k, n)
        # per-query partial top-k within this batch
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        out_q = np.repeat(np.arange(nq, dtype=np.int64), kk)
        rows = part.T.reshape(-1)
        return pa.table({
            "query_id": pa.array(out_q),
            "id": pa.array(ids[rows]),
            "score": pa.array(sims[rows, out_q].astype(np.float64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "rank", "id", "score"]]

    return (
        ds.map_batches(score_batch, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def lsh_signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits.astype(np.uint64) << np.arange(planes.shape[0], dtype=np.uint64)).sum(axis=1)


def knn_lsh(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    probe_radius: int = 1,
    seed: int = 11,
):
    """Approximate cosine top-k: random-hyperplane LSH buckets; each vector
    lands in 1 bucket, each query multiprobes every bucket within
    probe_radius Hamming distance of its own signature.

    This IN-STREAM variant still reads every block of `ds` — buckets prune
    only the per-batch matmul, not I/O. For the 100 TB path use
    build_lsh_index + knn_lsh_index below, which persist vectors PARTITIONED
    by bucket so queries read only probed partitions. Recall vs probe cost
    is tunable (radius 2 of 6 bits probes 22/64 buckets); tested against
    knn_brute."""
    import itertools

    import ray

    q = _l2_normalize(np.asarray(query_vecs, dtype=np.float32))
    planes = _hyperplanes(q.shape[1], n_bits, seed)
    q_sig = lsh_signature(q, planes)
    probes: dict[int, list[int]] = {}
    flips = [0] + [
        sum(1 << b for b in combo)
        for r in range(1, probe_radius + 1)
        for combo in itertools.combinations(range(n_bits), r)
    ]
    for qi, s in enumerate(q_sig):
        for f in flips:
            probes.setdefault(int(s) ^ f, []).append(qi)
    q_ref = ray.put((q, probes))

    def score_batch(batch: pa.Table) -> pa.Table:
        qm, probe_map = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _l2_normalize(_vec_matrix(batch[vec_col]))
        sigs = lsh_signature(m, planes)
        out_q, out_id, out_s = [], [], []
        for bkt in np.unique(sigs):
            qis = probe_map.get(int(bkt))
            if not qis:
                continue
            rows = np.flatnonzero(sigs == bkt)
            sims = m[rows] @ qm[qis].T
            for j, qi in enumerate(qis):
                out_q.extend([qi] * rows.size)
                out_id.extend(ids[rows].tolist())
                out_s.extend(sims[:, j].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "id": pa.array(out_id),
            "score": pa.array(out_s, pa.float64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "rank", "id", "score"]]

    return (
        ds.map_batches(score_batch, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def build_lsh_index(ds, out_dir: str, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_bits: int = 8,
                    seed: int = 11) -> dict:
    """Persist vectors PARTITIONED BY LSH BUCKET (hive layout
    out_dir/bucket=<sig>/*.parquet) so queries can read only probed
    partitions — the storage-pruned ANN path. Analogous to per-bucket
    posting files: the bucket IS the unit of I/O.

    Returns the index metadata dict (also written to out_dir/_lsh.json).
    """
    import json
    import os

    dim = _probe_dim(ds, vec_col)
    planes = _hyperplanes(dim, n_bits, seed)

    def add_sig(batch: pa.Table) -> pa.Table:
        m = _l2_normalize(_vec_matrix(batch[vec_col]))
        sig = lsh_signature(m, planes).astype(np.int64)
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        return batch.append_column("bucket", pa.array(sig))

    (ds.select_columns([id_col, vec_col])
       .map_batches(add_sig, batch_format="pyarrow")
       .write_parquet(out_dir, partition_cols=["bucket"]))
    meta = {"n_bits": n_bits, "seed": seed, "dim": dim,
            "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(out_dir, "_lsh.json"), "w") as f:
        json.dump(meta, f)
    return meta


def knn_lsh_index(index_dir: str, query_vecs: np.ndarray, k: int = 10,
                  probe_radius: int = 1, stats_out: dict | None = None):
    """Approximate cosine top-k over a build_lsh_index layout: only the
    bucket partitions within probe_radius Hamming distance of a query
    signature are READ — I/O scales with probed buckets, not corpus size.
    Same signatures/probing as the in-stream knn_lsh (identical results for
    equal n_bits/seed/radius). stats_out (optional dict) is filled with
    {"files_probed", "files_total"} so callers can assert the pruning.
    """
    import itertools
    import json
    import os

    import ray

    with open(os.path.join(index_dir, "_lsh.json")) as f:
        meta = json.load(f)
    n_bits, id_col, vec_col = meta["n_bits"], meta["id_col"], meta["vec_col"]
    planes = _hyperplanes(meta["dim"], n_bits, meta["seed"])
    q = _l2_normalize(np.asarray(query_vecs, dtype=np.float32))
    q_sig = lsh_signature(q, planes)
    probes: dict[int, list[int]] = {}
    flips = [0] + [
        sum(1 << b for b in combo)
        for r in range(1, probe_radius + 1)
        for combo in itertools.combinations(range(n_bits), r)
    ]
    for qi, s in enumerate(q_sig):
        for f in flips:
            probes.setdefault(int(s) ^ f, []).append(qi)

    part_dirs = {
        int(name.split("=", 1)[1]): os.path.join(index_dir, name)
        for name in os.listdir(index_dir) if name.startswith("bucket=")
    }
    probed = sorted(b for b in probes if b in part_dirs)
    if stats_out is not None:
        count = lambda d: sum(  # noqa: E731
            len(files) for _, _, files in os.walk(d))
        stats_out["files_probed"] = sum(count(part_dirs[b]) for b in probed)
        stats_out["files_total"] = sum(count(d) for d in part_dirs.values())
    q_ref = ray.put((q, probes))

    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        "id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    })
    if not probed:
        return ray.data.from_arrow(empty)

    def score_batch(batch: pa.Table) -> pa.Table:
        qm, probe_map = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _l2_normalize(_vec_matrix(batch[vec_col]))
        # recompute signatures (cheap matmul) — partition col isn't needed,
        # and a batch may span partitions after read coalescing
        sigs = lsh_signature(m, planes)
        out = []
        for bkt in np.unique(sigs):
            qis = probe_map.get(int(bkt))
            if not qis:
                continue
            rows = np.flatnonzero(sigs == bkt)
            sims = m[rows] @ qm[qis].T
            nq = len(qis)
            out.append(pa.table({
                "query_id": pa.array(
                    np.repeat(np.asarray(qis, np.int64), rows.size)),
                "id": pa.array(np.tile(ids[rows], nq)),
                "score": pa.array(
                    sims.T.reshape(-1).astype(np.float64)),
            }))
        return pa.concat_tables(out) if out else empty

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[["query_id", "rank", "id", "score"]]

    # read_parquet treats list entries as FILES — enumerate the probed
    # partitions' parquet files explicitly
    probed_files = [
        os.path.join(root, fn)
        for b in probed
        for root, _, files in os.walk(part_dirs[b])
        for fn in files if fn.endswith(".parquet")
    ]
    return (
        ray.data.read_parquet(probed_files)
        .map_batches(score_batch, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def pairwise_cosine_topk(ds, k: int | None = None, id_col: str = "vec_id",
                         vec_col: str = "embedding", threshold: float = 0.9,
                         method: str = "exact", n_bits: int = 8,
                         bands: int = 4, seed: int = 11,
                         dtype=None):
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).

    method="exact": block-vs-block all-pairs. The corpus is materialized into
    object-store block refs; each map task streams peer blocks one at a time
    (never the whole matrix), so per-worker memory is O(batch + one block)
    and the driver holds only refs. Compute is inherently O(n²) — exact
    all-pairs is a verification tool; use method="lsh" at corpus scale.

    method="lsh": banded random-hyperplane LSH. Each vector gets `bands`
    bucket keys (n_bits hyperplane bits per band); pairs colliding in ANY
    band are exact-cosine-verified inside their (band, bucket) group, then
    deduped. Only the bucket shuffle touches the whole dataset — no
    quadratic scan; recall is tunable via bands × n_bits (standard LSH
    S-curve, same construction as dedup.minhash_lsh_candidates).

    k (optional): keep at most k partners per id_a after thresholding
    (per-id top-k cut, cosine desc / id_b asc).
    """
    import ray

    if method == "lsh":
        planes_all = _hyperplanes(
            _probe_dim(ds, vec_col), n_bits * bands, seed)

        def bucketize(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _l2_normalize(_vec_matrix(batch[vec_col]))
            n = len(ids)
            sigs = np.empty((n, bands), dtype=np.uint64)
            for j in range(bands):
                sigs[:, j] = lsh_signature(
                    m, planes_all[j * n_bits:(j + 1) * n_bits])
            return pa.table({
                id_col: pa.array(np.repeat(ids, bands)),
                vec_col: pa.array(
                    [v for v in batch[vec_col].to_pylist() for _ in range(bands)]),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "bucket": pa.array(sigs.reshape(-1)),
            })

        def in_bucket_pairs(g: pa.Table) -> pa.Table:
            ids = g[id_col].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            m = _l2_normalize(_vec_matrix(g[vec_col].take(pa.array(order))))
            # chunk-vs-group matmul: a degenerate hot bucket (LSH's known
            # skew mode — many near-identical vectors) would otherwise
            # allocate a dense |g|x|g| float matrix and OOM the worker.
            # Peak memory is capped at CH x |g| floats; compute is the same.
            CH = 1024
            a_parts, b_parts, c_parts = [], [], []
            for s in range(0, ids.size, CH):
                sims = m[s:s + CH] @ m.T
                ii, jj = np.where(sims >= threshold)
                gi = ii + s
                keep = (jj > gi) & (ids[gi] != ids[jj])
                a_parts.append(ids[gi[keep]])
                b_parts.append(ids[jj[keep]])
                c_parts.append(sims[ii[keep], jj[keep]].astype(np.float64))
            return pa.table({
                "id_a": pa.array(np.concatenate(a_parts) if a_parts
                                 else np.empty(0, ids.dtype)),
                "id_b": pa.array(np.concatenate(b_parts) if b_parts
                                 else np.empty(0, ids.dtype)),
                "cosine": pa.array(np.concatenate(c_parts) if c_parts
                                   else np.empty(0, np.float64)),
            })

        from solr_ray.ops.grouping import distinct

        pairs_ds = distinct(
            ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(["band", "bucket"])
            .map_groups(in_bucket_pairs, batch_format="pyarrow"),
            ["id_a", "id_b"],
        ).select_columns(["id_a", "id_b", "cosine"])
    else:
        mat = ds.select_columns([id_col, vec_col]).materialize()
        block_refs = mat.to_arrow_refs()

        # dtype=np.float64 makes the exact path SQL-comparable (float32
        # normalize+matmul drifts ~1e-7 — enough to flip a threshold or a
        # 1e-5 quantile; float64 agrees with any engine to ~1e-13)
        _dt = dtype

        def _norm_mat(col):
            m = _vec_matrix(col)
            if _dt is None:
                return _l2_normalize(m)  # float32 scale path
            m = m.astype(_dt)
            nr = np.linalg.norm(m, axis=1, keepdims=True)
            nr[nr == 0] = 1.0
            return m / nr

        def pairs(batch: pa.Table) -> pa.Table:
            bids = batch[id_col].to_numpy(zero_copy_only=False)
            bm = _norm_mat(batch[vec_col])
            out = []
            for ref in block_refs:
                blk = ray.get(ref)
                if blk.num_rows == 0:
                    continue
                oids = blk[id_col].to_numpy(zero_copy_only=False)
                om = _norm_mat(blk[vec_col])
                sims = bm @ om.T
                ii, jj = np.where((sims >= threshold)
                                  & (oids[None, :] > bids[:, None]))
                if ii.size:
                    out.append(pa.table({
                        "id_a": pa.array(bids[ii]),
                        "id_b": pa.array(oids[jj]),
                        "cosine": pa.array(sims[ii, jj].astype(np.float64)),
                    }))
            if not out:
                return pa.table({
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                })
            return pa.concat_tables(out)

        pairs_ds = mat.map_batches(pairs, batch_format="pyarrow")

    if k is None:
        return pairs_ds

    def topk_per_id(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "id_b"], ascending=[False, True],
                             kind="stable").head(k)

    return pairs_ds.groupby("id_a").map_groups(topk_per_id,
                                               batch_format="pandas")


def _probe_dim(ds, vec_col: str) -> int:
    """Embedding dimensionality from the first row (list<float> has no
    fixed-size type to read it from)."""
    return len(ds.take(1)[0][vec_col])
