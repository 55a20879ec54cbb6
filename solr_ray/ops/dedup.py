"""Deduplication operators: exact signatures, fuzzy profiles, MinHash-LSH,
SimHash.

Reference semantics:
- exact + overwrite-dupes signature dedup: SignatureUpdateProcessorFactory
  (solr/core/src/java/org/apache/solr/update/processor/SignatureUpdateProcessorFactory.java:43,62-64,200-203)
  — MD5 of chosen fields, first-writer-wins per signature. Here:
  hash-partition on the signature + per-group deterministic first.
- near-dup text profile: TextProfileSignature.java:40-51 (Nutch-style
  quantized term-frequency profile, QUANT_RATE=0.01).
- MinHash/LSH: MinHashQParser.java + Lucene MinHashFilter (banded LSH over
  shingle minhashes — standard Broder/LSH construction, public literature).

All per-record work is vectorized map_batches; the only shuffles are keyed by
signature / band-bucket (uniform unless the corpus is one giant duplicate
class — the pathological key is the duplicate itself, which is exactly what
must co-locate).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from solr_ray.analysis.chain import process_analyzer
from solr_ray.stages.worker_gc import tune_worker_gc


# ---------------------------------------------------------------- exact dedup

def add_signature(batch: pa.Table, cols: list[str], out_col: str = "sig") -> pa.Table:
    """MD5 signature of the given columns' values, row-wise."""
    arrays = [batch[c].to_pylist() for c in cols]
    sigs = []
    for vals in zip(*arrays):
        h = hashlib.md5()
        for v in vals:
            h.update(b"\x00")
            h.update(str(v).encode("utf-8", "surrogatepass"))
        sigs.append(h.hexdigest())
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(sigs, pa.string()))


def exact_dedup(ds, cols: list[str], order_col: str, sig_fn=add_signature):
    """Keep one row per signature: the row with the MINIMUM order_col value
    (deterministic first-writer-wins, like overwriteDupes). Shuffle key = sig."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="stable").head(1)

    return (
        ds.map_batches(lambda t: sig_fn(t, cols), batch_format="pyarrow")
        .groupby("sig")
        .map_groups(first, batch_format="pandas")
    )


# ------------------------------------------------------- text profile (fuzzy)

QUANT_RATE = 0.01


def text_profile_signature(text: str, analyzer: str = "simple",
                           min_token_len: int = 2) -> str:
    """Nutch-style fuzzy content signature (TextProfileSignature.java:40-51):
    count token freqs, quantize by QUANT_RATE * max_freq (floor 2 if max>1),
    drop below-quantum tokens, round down to quantum, sort by (-freq, token),
    md5 the "token freq" profile."""
    az = process_analyzer(analyzer)
    counts: dict[str, int] = {}
    for t in az.tokenize_text(text or ""):
        if len(t) >= min_token_len:
            counts[t] = counts.get(t, 0) + 1
    if not counts:
        return hashlib.md5(b"").hexdigest()
    max_freq = max(counts.values())
    quant = max(2, int(round(max_freq * QUANT_RATE))) if max_freq > 1 else 1
    prof = []
    for t, c in counts.items():
        q = (c // quant) * quant
        if q >= quant:
            prof.append((t, q))
    prof.sort(key=lambda x: (-x[1], x[0]))
    return hashlib.md5(
        " ".join(f"{t} {q}" for t, q in prof).encode()
    ).hexdigest()


def add_text_profile_sig(batch: pa.Table, text_col: str = "text",
                         out_col: str = "sig", analyzer: str = "simple") -> pa.Table:
    sigs = [text_profile_signature(t, analyzer) for t in batch[text_col].to_pylist()]
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(sigs, pa.string()))


# ------------------------------------------------------------------- minhash

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of character k-shingles (deterministic)."""
    if not text or len(text) < k:
        data = [text or ""]
    else:
        data = [text[i : i + k] for i in range(len(text) - k + 1)]
    arr = pd.util.hash_array(np.array(data, dtype=object), hash_key="solr_ray_shingl0")
    return np.unique(arr)


# universal-hash parameters: h_i(x) = (a_i * x + b_i) mod p, fixed seeds
_MERSENNE_P = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int = 64, shingle_k: int = 5,
                      _params_cache: dict = {}) -> np.ndarray:
    key = num_perm
    if key not in _params_cache:
        _params_cache[key] = _perm_params(num_perm)
    a, b = _params_cache[key]
    sh = _shingle_hashes(text, shingle_k) & np.uint64((1 << 61) - 1)
    if sh.size == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    # (P, S) matrix of permuted hashes -> min over shingles
    vals = (np.outer(a, sh) + b[:, None]) % _MERSENNE_P
    return vals.min(axis=1)


def minhash_lsh_candidates(
    ds,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
):
    """Stage 1+2 of MinHash-LSH dedup: per-doc signatures -> banded bucket
    rows -> groupby(band, bucket) -> candidate pairs (id_a < id_b).

    Band geometry sets the LSH S-curve threshold ~ (1/bands)^(bands/num_perm):
    8 bands x 8 rows targets ~0.77 Jaccard (near-dup dedup); 16 x 4 targets
    ~0.5 (looser similarity search) but floods the verify stage with false
    candidates when the corpus shares vocabulary.

    The (band, bucket) shuffle is the only exchange; bucket keys are hashes
    (uniform except true near-dup clusters, which must co-locate by design).
    """
    rows_per_band = num_perm // bands
    assert bands * rows_per_band == num_perm

    def sigs(batch: pa.Table) -> pa.Table:
        tune_worker_gc()
        ids = batch[id_col].to_pylist()
        out_ids, out_band, out_bucket = [], [], []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            sig = minhash_signature(t, num_perm, shingle_k)
            bb = sig.reshape(bands, rows_per_band)
            buckets = pd.util.hash_array(
                np.array([bb[j].tobytes() for j in range(bands)], dtype=object),
                hash_key="solr_ray_band000",
            )
            out_ids.extend([i] * bands)
            out_band.extend(range(bands))
            out_bucket.extend(buckets.tolist())
        return pa.table({
            id_col: pa.array(out_ids),
            "band": pa.array(out_band, pa.int32()),
            "bucket": pa.array(np.array(out_bucket, dtype=np.uint64)),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique().tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        out_a, out_b = [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                out_a.append(ids[x])
                out_b.append(ids[y])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    from solr_ray.ops.grouping import distinct

    cand = (
        # single-file sources arrive as one block; spread so signature
        # computation (the CPU-heavy stage) parallelizes
        ds.repartition(target_num_rows_per_block=512)
        .map_batches(sigs, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(pairs, batch_format="pandas")
    )
    # a pair can match in several bands: dedupe before the (expensive) verify
    return distinct(cand, ["id_a", "id_b"])


def jaccard_verify_pairs(
    pairs_ds, corpus_ds, id_col: str, text_col: str = "text",
    shingle_k: int = 5, threshold: float = 0.8,
):
    """Stage 3: verify candidate pairs by true shingle Jaccard.

    Scale path: the corpus is first SEMI-JOINED down to ids that appear in a
    candidate pair (a distributed `pc.is_in` filter — only the sparse
    near-dup subset ever leaves the workers), and only that subset is
    broadcast via ray.put for random access during verification. The full
    corpus is never materialized on the driver; driver memory is
    O(candidate ids + candidate texts), which is small by construction
    (candidates come from LSH-bucket collisions).
    """
    import pyarrow.compute as pc
    import ray

    pairs_ds = pairs_ds.materialize()  # iterated twice (id set + verify)
    id_set: set = set()
    for b in pairs_ds.select_columns(["id_a", "id_b"]).iter_batches(
        batch_format="pyarrow"
    ):
        id_set.update(b["id_a"].to_pylist())
        id_set.update(b["id_b"].to_pylist())
    docs = {}
    if id_set:
        want_ref = ray.put(pa.array(sorted(id_set)))

        def keep_candidates(t: pa.Table) -> pa.Table:
            w = ray.get(want_ref)
            return t.filter(pc.is_in(t[id_col], value_set=w))

        needed = corpus_ds.select_columns([id_col, text_col]).map_batches(
            keep_candidates, batch_format="pyarrow"
        )
        for b in needed.iter_batches(batch_format="pyarrow"):
            docs.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
    ref = ray.put(docs)

    def verify(batch: pa.Table) -> pa.Table:
        import ray as _r

        d = _r.get(ref)
        out_a, out_b, out_j = [], [], []
        for a_, b_ in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            sa = _shingle_hashes(d.get(a_, ""), shingle_k)
            sb = _shingle_hashes(d.get(b_, ""), shingle_k)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(a_)
                out_b.append(b_)
                out_j.append(j)
        return pa.table({
            "id_a": pa.array(out_a), "id_b": pa.array(out_b),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def connected_components(pairs: pd.DataFrame, id_a="id_a", id_b="id_b") -> dict:
    """Union-find over verified duplicate pairs -> {id: cluster_rep}.

    Driver-side: the verified-duplicate edge set is tiny relative to the
    corpus. (For adversarial corpora, iterate min-label propagation with a
    groupby per round instead — see SNIPPETS guidance.)"""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs[id_a], pairs[id_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in set(pairs[id_a]) | set(pairs[id_b])}


# -------------------------------------------------------------------- simhash

def simhash64(text: str, analyzer: str = "simple") -> np.uint64:
    """64-bit SimHash (Charikar) over analyzed tokens, tf-weighted."""
    az = process_analyzer(analyzer)
    toks = az.tokenize_text(text or "")
    if not toks:
        return np.uint64(0)
    hashes = pd.util.hash_array(np.array(toks, dtype=object), hash_key="solr_ray_simhash")
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return np.uint64(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def add_simhash(batch: pa.Table, text_col: str = "text",
                out_col: str = "simhash", analyzer: str = "simple") -> pa.Table:
    vals = np.array([simhash64(t, analyzer) for t in batch[text_col].to_pylist()],
                    dtype=np.uint64)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(vals))


def simhash_candidates(ds, id_col: str, text_col: str = "text",
                       max_hamming: int = 3, analyzer: str = "simple"):
    """Near-dup candidates by the 4×16-bit chunk trick: any pair within
    hamming distance ≤3 of a 64-bit simhash shares at least one exact 16-bit
    chunk (pigeonhole) -> bucket by (chunk_idx, chunk_value), verify distance
    in-group."""

    def chunks(batch: pa.Table) -> pa.Table:
        tune_worker_gc()
        t = add_simhash(batch, text_col, "simhash", analyzer)
        sh = t["simhash"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        out = {
            id_col: np.repeat(ids, 4),
            "simhash": np.repeat(sh, 4),
            "chunk_idx": np.tile(np.arange(4, dtype=np.int32), n),
        }
        out["chunk_val"] = (
            (out["simhash"] >> (out["chunk_idx"].astype(np.uint64) * np.uint64(16)))
            & np.uint64(0xFFFF)
        )
        return pa.table({k: pa.array(v) for k, v in out.items()})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy()
        out_a, out_b, out_d = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = bin(int(sh[x]) ^ int(sh[y])).count("1")
                if d <= max_hamming:
                    out_a.append(ids[x])
                    out_b.append(ids[y])
                    out_d.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d})

    from solr_ray.ops.grouping import distinct

    return distinct(
        ds.repartition(target_num_rows_per_block=512)
        .map_batches(chunks, batch_format="pyarrow")
        .groupby(["chunk_idx", "chunk_val"])
        .map_groups(pairs, batch_format="pandas"),
        ["id_a", "id_b"],
    )
