"""Per-segment HNSW approximate nearest neighbor (cosine).

Reference semantics: Lucene HNSW as used by the reference's dense vector
search (solr/core/src/java/org/apache/solr/schema/DenseVectorField.java:62-72
+ search/neural/KnnQParser.java:35): each SEGMENT owns an independent HNSW
graph; a k-NN query searches every segment's graph and merges the per-
segment top-k — exactly the scatter/gather shape the BM25 searcher uses.

Algorithm: Malkov & Yashunin 2016 (public paper). Level l ~ floor(-ln(U)·mL)
with mL = 1/ln(M); insertion greedy-descends from the entry point through
upper layers, then beam-searches (efConstruction) each layer ≤ l, linking
the M nearest and pruning back-links to Mmax (2M at layer 0).

Ray layout: `build_hnsw_index` hash-partitions vectors into segments with
ONE groupby shuffle; each segment's graph builds inside its map_groups task
(parallelism across segments — a graph build is inherently sequential, so
segment size is the worker-heap / build-latency knob, same as index
buckets). Graphs persist as parquet (vectors + flattened adjacency), and
`knn_hnsw_index` reads only graph files, never a full corpus scan.

Distances: cosine via normalized float32 dot products; candidate batches
evaluate as one matmul per hop — no per-dimension python.
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


from solr_ray.ops.similarity import l2_normalize as _normalize


class HNSWGraph:
    """One segment's in-memory HNSW graph over L2-normalized vectors."""

    def __init__(self, vecs: np.ndarray, levels: np.ndarray,
                 neighbors: list[list[np.ndarray]], entry: int):
        self.vecs = vecs            # (n, d) float32, normalized
        self.levels = levels        # (n,) int16 max layer per node
        self.neighbors = neighbors  # [layer][node] -> int32 array
        self.entry = entry

    # ---- construction ----

    @classmethod
    def build(cls, vectors: np.ndarray, m: int = 16,
              ef_construction: int = 100, seed: int = 17) -> "HNSWGraph":
        vecs = _normalize(vectors)
        n = vecs.shape[0]
        rng = np.random.default_rng(seed)
        ml = 1.0 / np.log(m)
        levels = np.minimum(
            np.floor(-np.log(rng.random(n)) * ml), 32).astype(np.int16)
        max_level = int(levels.max(initial=0))
        neighbors: list[list[np.ndarray]] = [
            [None] * n for _ in range(max_level + 1)]
        empty = np.empty(0, dtype=np.int32)
        g = cls(vecs, levels, neighbors, entry=0)
        for node in range(n):
            g._insert(node, m, ef_construction, empty)
        return g

    def _insert(self, node: int, m: int, ef: int, empty: np.ndarray) -> None:
        lvl = int(self.levels[node])
        for l in range(lvl + 1):
            self.neighbors[l][node] = empty
        if node == 0:
            self.entry = 0
            return
        q = self.vecs[node]
        ep = self.entry
        top = int(self.levels[self.entry])
        # greedy descent above the node's level
        for l in range(top, lvl, -1):
            ep = self._greedy(q, ep, l)
        # beam search + link at each level <= min(lvl, top)
        for l in range(min(lvl, top), -1, -1):
            cand = self._search_layer(q, [ep], l, ef)
            mmax = m * 2 if l == 0 else m
            chosen = cand[:m]
            self.neighbors[l][node] = np.array(
                [c for _, c in chosen], dtype=np.int32)
            for _, c in chosen:
                cur = self.neighbors[l][c]
                merged = np.append(cur, np.int32(node))
                if merged.size > mmax:
                    d = self.vecs[merged] @ self.vecs[c]
                    keep = np.argsort(-d)[:mmax]
                    merged = merged[keep]
                self.neighbors[l][c] = merged
            ep = cand[0][1]
        if lvl > int(self.levels[self.entry]):
            self.entry = node

    def _greedy(self, q: np.ndarray, ep: int, layer: int) -> int:
        best = ep
        best_sim = float(self.vecs[ep] @ q)
        while True:
            nb = self.neighbors[layer][best]
            if nb is None or nb.size == 0:
                return best
            sims = self.vecs[nb] @ q
            i = int(np.argmax(sims))
            if sims[i] <= best_sim:
                return best
            best, best_sim = int(nb[i]), float(sims[i])

    def _search_layer(self, q: np.ndarray, eps: list[int], layer: int,
                      ef: int) -> list[tuple[float, int]]:
        """Beam search; returns [(similarity, node)] best-first, len<=ef."""
        visited = set(eps)
        sims = self.vecs[np.array(eps, dtype=np.int64)] @ q
        cand = [(-float(s), e) for s, e in zip(sims, eps)]  # max-heap
        heapq.heapify(cand)
        result = [(float(s), e) for s, e in zip(sims, eps)]  # min-heap on sim
        heapq.heapify(result)
        while cand:
            negs, c = heapq.heappop(cand)
            if -negs < result[0][0] and len(result) >= ef:
                break
            nb = self.neighbors[layer][c]
            if nb is None or nb.size == 0:
                continue
            fresh = [int(x) for x in nb if int(x) not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            fs = self.vecs[np.array(fresh, dtype=np.int64)] @ q
            for s, fnode in zip(fs, fresh):
                s = float(s)
                if len(result) < ef or s > result[0][0]:
                    heapq.heappush(cand, (-s, fnode))
                    heapq.heappush(result, (s, fnode))
                    if len(result) > ef:
                        heapq.heappop(result)
        return sorted(result, key=lambda t: -t[0])

    def search(self, query: np.ndarray, k: int = 10,
               ef: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """(local_indices, cosine_sims) best-first for one query vector."""
        q = _normalize(query.reshape(1, -1))[0]
        ep = self.entry
        for l in range(int(self.levels[self.entry]), 0, -1):
            ep = self._greedy(q, ep, l)
        out = self._search_layer(q, [ep], 0, max(ef, k))[:k]
        return (np.array([c for _, c in out], dtype=np.int64),
                np.array([s for s, _ in out], dtype=np.float64))

    # ---- (de)serialization ----

    def to_tables(self) -> tuple[pa.Table, pa.Table]:
        n, d = self.vecs.shape
        rows_l, rows_n, rows_nb = [], [], []
        for l, layer in enumerate(self.neighbors):
            for node in range(n):
                nb = layer[node]
                if nb is not None:
                    rows_l.append(l)
                    rows_n.append(node)
                    rows_nb.append(nb.tolist())
        adj = pa.table({
            "layer": pa.array(rows_l, pa.int32()),
            "node": pa.array(rows_n, pa.int32()),
            "nbrs": pa.array(rows_nb, pa.list_(pa.int32())),
        })
        vec = pa.table({
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(self.vecs.reshape(-1), pa.float32()), d),
            "level": pa.array(self.levels, pa.int16()),
        })
        vec = vec.replace_schema_metadata({"entry": str(self.entry)})
        return vec, adj

    @classmethod
    def from_tables(cls, vec: pa.Table, adj: pa.Table) -> "HNSWGraph":
        d = vec["vec"].type.list_size
        vecs = np.asarray(vec["vec"].combine_chunks().flatten()
                          .to_numpy(zero_copy_only=False),
                          dtype=np.float32).reshape(-1, d)
        levels = vec["level"].to_numpy(zero_copy_only=False)
        n = vecs.shape[0]
        max_level = int(levels.max(initial=0))
        neighbors = [[None] * n for _ in range(max_level + 1)]
        lcol = adj["layer"].to_numpy(zero_copy_only=False)
        ncol = adj["node"].to_numpy(zero_copy_only=False)
        nbcol = adj["nbrs"].to_pylist()
        for l, node, nb in zip(lcol, ncol, nbcol):
            neighbors[int(l)][int(node)] = np.array(nb, dtype=np.int32)
        entry = int(vec.schema.metadata[b"entry"].decode())
        return cls(vecs, levels, neighbors, entry)


def build_hnsw_index(ds, out_dir: str, id_col: str = "vec_id",
                     vec_col: str = "embedding", num_segments: int = 4,
                     m: int = 16, ef_construction: int = 100) -> dict:
    """Hash-partition vectors into `num_segments` HNSW graphs (one groupby
    shuffle; each graph builds in its own task) and persist them under
    out_dir/seg=<i>/. Size segments to ~100k-1M vectors: build is the
    sequential part, so segments are the parallelism AND memory knob."""
    def add_seg(t: pa.Table) -> pa.Table:
        h = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = (h * np.int64(2654435761)) % np.int64(num_segments)
        return t.append_column("seg", pa.array(np.abs(seg)))

    def build_one(g: pa.Table) -> pa.Table:
        seg = int(g["seg"][0].as_py())
        ids = g[id_col].to_numpy(zero_copy_only=False)
        vecs = np.stack(
            [np.asarray(v, dtype=np.float32) for v in
             g[vec_col].to_pylist()])
        graph = HNSWGraph.build(vecs, m=m, ef_construction=ef_construction)
        vec_t, adj_t = graph.to_tables()
        vec_t = vec_t.append_column(id_col, pa.array(ids))
        d = os.path.join(out_dir, f"seg={seg}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(vec_t, os.path.join(d, "vectors.parquet"))
        pq.write_table(adj_t, os.path.join(d, "graph.parquet"))
        return pa.table({"seg": [seg], "n": [len(ids)]})

    segs = (ds.select_columns([id_col, vec_col])
            .map_batches(add_seg, batch_format="pyarrow")
            .groupby("seg")
            .map_groups(build_one, batch_format="pyarrow")
            .take_all())
    meta = {"num_segments": num_segments, "m": m,
            "ef_construction": ef_construction, "id_col": id_col,
            "sizes": {str(s["seg"]): int(s["n"]) for s in segs}}
    with open(os.path.join(out_dir, "_hnsw.json"), "w") as f:
        json.dump(meta, f)
    return meta


# per-process reader cache (SegmentIndex's load-once pattern): repeated
# query batches against the same index skip graph deserialization. Keyed
# by (dir, _hnsw.json mtime) so a rebuilt index invalidates naturally.
_GRAPH_CACHE: dict = {}


def _load_graphs(index_dir: str, meta: dict):
    key = (index_dir, os.path.getmtime(os.path.join(index_dir, "_hnsw.json")))
    got = _GRAPH_CACHE.get(key)
    if got is None:
        id_col = meta["id_col"]
        got = []
        for s in sorted(meta["sizes"]):
            d = os.path.join(index_dir, f"seg={s}")
            vec_t = pq.read_table(os.path.join(d, "vectors.parquet"))
            adj_t = pq.read_table(os.path.join(d, "graph.parquet"))
            ids = vec_t[id_col].to_numpy(zero_copy_only=False)
            got.append((ids, HNSWGraph.from_tables(
                vec_t.drop_columns([id_col]), adj_t)))
        _GRAPH_CACHE.clear()  # hold one index per process
        _GRAPH_CACHE[key] = got
    return got


def knn_hnsw_index(index_dir: str, query_vecs: np.ndarray, k: int = 10,
                   ef: int = 64) -> pa.Table:
    """Search every segment graph, merge per-segment top-k.

    Returns (qid, vec_id, sim, rank). Graph files are the only I/O (read
    once per process via a reader cache) — no corpus scan; per-query work
    is O(num_segments · ef · M) distance evaluations.
    """
    with open(os.path.join(index_dir, "_hnsw.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    q = np.asarray(query_vecs, dtype=np.float32)
    per_q: list[list[tuple[float, int]]] = [[] for _ in range(q.shape[0])]
    for ids, graph in _load_graphs(index_dir, meta):
        for qi in range(q.shape[0]):
            loc, sims = graph.search(q[qi], k=k, ef=ef)
            per_q[qi].extend(
                (float(sv), int(ids[li])) for sv, li in zip(sims, loc))
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
