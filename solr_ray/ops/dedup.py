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
    """128-bit signature of the given columns' values, fully vectorized:
    the columns are cast to string and NUL-joined with one Arrow kernel
    (pc.binary_join_element_wise), then hashed with two independently-keyed
    vectorized 64-bit SipHash passes (pd.util.hash_array) — no per-row
    Python. 128 bits makes collisions negligible at any corpus size
    (~2⁻⁶⁴ at 10¹⁰ rows), matching the md5-signature contract of
    SignatureUpdateProcessorFactory.java:43 without its per-row cost."""
    import pyarrow.compute as pc

    parts = []
    for c in cols:
        col = batch[c]
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        # pandas' hash_array truncates object strings at an embedded \x00
        # (C-string semantics) — escape NULs in the VALUES injectively
        # (\x01 -> \x01\x01 first so the escape can't be forged) so rows
        # differing only past a NUL byte still hash differently
        col = pc.replace_substring(col, pattern="\x01",
                                   replacement="\x01\x01")
        col = pc.replace_substring(col, pattern="\x00",
                                   replacement="\x01\x02")
        parts.append(pc.fill_null(col, "\x01<null>"))
    # separator must be NUL-free (same hash_array C-string semantics)
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(
        *parts, "\x1f")
    vals = np.asarray(joined.to_pandas(), dtype=object)
    h1 = pd.util.hash_array(vals, hash_key="solr_ray_sig_hi0")
    h2 = pd.util.hash_array(vals, hash_key="solr_ray_sig_lo0")
    sigs = np.char.add(np.char.mod("%016x", h1), np.char.mod("%016x", h2))
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(sigs.tolist(), pa.string()))


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
                         out_col: str = "sig", analyzer: str = "simple",
                         min_token_len: int = 2) -> pa.Table:
    """Batch TextProfileSignature, value-identical to the per-row
    text_profile_signature reference: tokenize/count/quantize/sort run as
    arrow+numpy over the whole batch (ONE tokenize_array, ONE lexsort for
    per-doc (token, count) runs, ONE lexsort for the (-freq, token)
    profile order, arrow binary_join for the profile strings); only the
    final md5 of each ≤profile-sized string stays a per-row call."""
    import pyarrow.compute as pc

    az = process_analyzer(analyzer)
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = az.tokenize_array(col)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    n = len(batch)
    if len(flat) == 0:
        empty_sig = hashlib.md5(b"").hexdigest()
        sigs = [empty_sig] * n
    else:
        doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        # length filter (reference: len(token) >= min_token_len)
        ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = ln >= min_token_len
        doc = doc[keep]
        dflat = flat.filter(pa.array(keep))
        # per-(doc, token) counts: dict-encode, sort the dictionary so the
        # code order IS byte order (profile tie-break), run-length count
        denc = pc.dictionary_encode(dflat)
        vocab = denc.dictionary
        rank_of = pc.sort_indices(pc.sort_indices(vocab)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = rank_of[denc.indices.to_numpy(zero_copy_only=False)]
        sorted_vocab = vocab.take(pc.sort_indices(vocab))
        order = np.lexsort((codes, doc))
        d_s, c_s = doc[order], codes[order]
        new = np.ones(len(d_s), dtype=bool)
        if len(d_s) > 1:
            new[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(new)
        g_doc, g_code = d_s[starts], c_s[starts]
        g_cnt = np.diff(np.append(starts, len(d_s)))
        # per-doc max freq -> quantum (floor 2 if max > 1)
        max_freq = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_freq, g_doc, g_cnt)
        quant = np.where(max_freq > 1,
                         np.maximum(2, np.round(max_freq * QUANT_RATE)
                                    .astype(np.int64)), 1)
        q = (g_cnt // quant[g_doc]) * quant[g_doc]
        keep2 = q >= quant[g_doc]
        g_doc, g_code, q = g_doc[keep2], g_code[keep2], q[keep2]
        # profile order: (doc, -freq, token byte order)
        order2 = np.lexsort((g_code, -q, g_doc))
        g_doc, g_code, q = g_doc[order2], g_code[order2], q[order2]
        terms = sorted_vocab.take(pa.array(g_code))
        entries = pc.binary_join_element_wise(
            terms, pa.array(q.astype(str), pa.string()), " ")
        ecnt = np.bincount(g_doc, minlength=n)
        eoffs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ecnt, out=eoffs[1:])
        profiles = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(eoffs, pa.int32()), entries),
            pa.scalar(" ")).to_pylist()
        sigs = [hashlib.md5((p or "").encode()).hexdigest()
                for p in profiles]
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(sigs, pa.string()))


# ------------------------------------------------------------------- minhash

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of byte k-shingles (deterministic), fully vectorized:
    each k-byte window packs exactly into a uint64 (k <= 8) and a
    splitmix64 mix whitens it — no python string slicing (the old
    char-slice + hash_array path was the minhash signature hot loop:
    ~1 ms/KB; this is ~30x faster). Byte vs char k-grams differ only on
    multi-byte UTF-8 — immaterial for near-dup detection (k > 8 keeps
    the string path)."""
    data = (text or "").encode("utf-8", "surrogatepass")
    if k > 8:
        s = text or ""
        grams = ([s] if len(s) < k
                 else [s[i:i + k] for i in range(len(s) - k + 1)])
        return np.unique(pd.util.hash_array(
            np.array(grams, dtype=object), hash_key="solr_ray_shingl0"))
    if len(data) < k:
        packed = np.array(
            [int.from_bytes(data.ljust(8, b"\0")[:8], "big")
             ^ (len(data) << 56)], dtype=np.uint64)
    else:
        from numpy.lib.stride_tricks import sliding_window_view

        b = np.frombuffer(data, np.uint8)
        win = sliding_window_view(b, k).astype(np.uint64)
        weights = (np.uint64(1) << (np.uint64(8)
                                    * np.arange(k - 1, -1, -1,
                                                dtype=np.uint64)))
        with np.errstate(over="ignore"):
            packed = (win * weights).sum(axis=1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return np.unique(_splitmix64(packed))


# per-permutation hash: h_i(x) = a_i * x + b_i with WRAPPING uint64
# arithmetic (a_i odd, so x -> a_i*x is a bijection mod 2^64 — a valid
# multiplicative permutation family). Round 4 dropped the `mod (2^61-1)`
# reduction: uint64 modulo was the minhash hot spot (65M slow ops per
# 1M shingles x 64 perms); multiply+add is ~10x faster and min-hash
# quality is unchanged (bijective mixing of already-whitened shingle
# hashes). _MERSENNE_P retained for the exposed shingle mask.
_MERSENNE_P = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64) | np.uint64(1)
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
    with np.errstate(over="ignore"):
        vals = np.outer(a, sh) + b[:, None]
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
        texts = batch[text_col].to_pylist()
        n = len(ids)
        if n == 0:
            return pa.table({
                id_col: pa.array([], batch[id_col].type),
                "band": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.uint64()),
            })
        # ONE permute-min over the whole batch: concatenate every doc's
        # shingle hashes, compute the (num_perm, total) universal-hash
        # matrix once, and take per-doc minima with minimum.reduceat at
        # the doc boundaries (identical values to the per-doc loop —
        # minhash_signature stays as the scalar reference)
        parts = [_shingle_hashes(t, shingle_k) & np.uint64((1 << 61) - 1)
                 for t in texts]
        counts = np.array([max(p.size, 1) for p in parts], dtype=np.int64)
        flat = np.concatenate(
            [p if p.size else np.zeros(1, np.uint64) for p in parts])
        empty = np.array([p.size == 0 for p in parts])
        a, b = _perm_params(num_perm)
        with np.errstate(over="ignore"):
            vals = np.outer(a, flat) + b[:, None]
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        sig = np.minimum.reduceat(vals, offs, axis=1)  # (num_perm, n)
        sig[:, empty] = 0  # empty text -> zero signature (scalar parity)
        bb = sig.T.reshape(n * bands, rows_per_band)
        # band-row bucket = multiply-add fold over the band's signature
        # values + splitmix64 whitening — rows_per_band vector ops total
        # (the old per-row tobytes() built n*bands python objects). Equal
        # band signatures still collide identically; cross-signature
        # collisions are 2^-64 noise the Jaccard verify stage absorbs.
        with np.errstate(over="ignore"):
            h = np.zeros(n * bands, np.uint64)
            mult = np.uint64(0x100000001B3)
            for c in range(rows_per_band):
                h = h * mult + bb[:, c].astype(np.uint64)
        buckets = _splitmix64(h)
        return pa.table({
            id_col: pa.array(np.repeat(np.asarray(ids), bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "bucket": pa.array(buckets.astype(np.uint64)),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one python call per COARSE group (band, bucket%256), not per
        # LSH bucket — most buckets are singletons, so the inner loop
        # only touches the rare colliding ones
        out_a, out_b = [], []
        for _, sub in g.groupby(["band", "bucket"], sort=False):
            if sub[id_col].nunique() < 2:
                continue
            ids = sorted(sub[id_col].unique().tolist())
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    out_a.append(ids[x])
                    out_b.append(ids[y])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    from solr_ray.ops.grouping import distinct

    # single-file sources arrive as one block; spread so signature
    # computation (the CPU-heavy stage) parallelizes. Materialize BEFORE
    # the gate probe: otherwise an above-gate corpus would re-execute the
    # whole plan — including this dominant signature stage — when the
    # distributed fallback consumes bucket_rows a second time.
    bucket_rows = (ds.repartition(target_num_rows_per_block=512)
                   .map_batches(sigs, batch_format="pyarrow")
                   .materialize())

    # bucket rows are n_docs x bands: tiny at test scale, huge at corpus
    # scale. Under the gate, pair generation + cross-band dedupe run as
    # ONE driver pass over the collected rows — saving TWO Ray
    # sort-shuffles whose multi-second fixed cost dwarfs this data size
    # (measured: a 4.7 s Sort over 40k rows). Above it, the banded
    # (band, bucket%256) groupby + distributed distinct take over.
    import ray as _ray
    import ray.data

    gate = 5_000_000
    parts, total = [], 0
    for ref in bucket_rows.to_arrow_refs():
        t = _ray.get(ref)
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0:
            continue
        parts.append(t)
        total += t.num_rows
        if total > gate:
            parts = None
            break
    if parts is not None:
        if not parts:
            empty = pa.array([], pa.int64())
            return ray.data.from_arrow(
                pa.table({"id_a": empty, "id_b": empty}))
        tb = pa.concat_tables(parts)
        out = pairs(tb.to_pandas()).drop_duplicates(ignore_index=True)
        id_t = tb.schema.field(id_col).type
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array(out["id_a"].tolist(), id_t),
            "id_b": pa.array(out["id_b"].tolist(), id_t),
        }))

    cand = (
        bucket_rows
        .map_batches(
            lambda t: t.append_column(
                "gb", pa.array((t["bucket"].to_numpy(
                    zero_copy_only=False) % 256).astype(np.int32))),
            batch_format="pyarrow")
        .groupby(["band", "gb"])
        .map_groups(pairs, batch_format="pandas")
    )
    # a pair can match in several bands: dedupe before the (expensive) verify
    return distinct(cand, ["id_a", "id_b"])


def _jaccard_batch(ta: list, tb: list, shingle_k: int) -> np.ndarray:
    out = np.empty(len(ta), dtype=np.float64)
    for i, (x, y) in enumerate(zip(ta, tb)):
        sa = _shingle_hashes(x or "", shingle_k)
        sb = _shingle_hashes(y or "", shingle_k)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        out[i] = inter / union if union else 0.0
    return out


def _join_partitions(num_partitions: int | None) -> int:
    """Hash-join partition count: one per cluster CPU (each partition's
    aggregator gets a CPU slice), capped so tiny clusters don't drown in
    actors. Callers override for the 100-TB path."""
    if num_partitions is not None:
        return num_partitions
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(32, cpus))


def jaccard_verify_pairs_join(
    pairs_ds, corpus_ds, id_col: str, text_col: str = "text",
    shingle_k: int = 5, threshold: float = 0.8,
    num_partitions: int | None = None,
):
    """Stage 3 (scale path): verify candidate pairs by true shingle Jaccard
    with TWO distributed hash joins — pairs ⋈ corpus on id_a, then on id_b —
    so NOTHING ever lands on the driver and no broadcast object scales with
    the candidate count. This is the path for duplicate-heavy corpora
    (a 30-50% dup-rate crawl makes "candidates" a large corpus fraction,
    which would sink the broadcast-dict variant below).

    Cost: the corpus text column is shuffled twice (hash-partitioned on id).
    Per-pair work is identical to the broadcast path, so results match
    bit-for-bit.
    """
    nparts = _join_partitions(num_partitions)
    corp = corpus_ds.select_columns([id_col, text_col])

    j1 = pairs_ds.join(
        corp, "inner", num_partitions=nparts,
        on=("id_a",), right_on=(id_col,), right_suffix="_ca",
    )
    ta_col = text_col if text_col != "id_a" else f"{text_col}_ca"
    j1 = j1.rename_columns({ta_col: "__text_a"})
    if id_col in j1.columns() and id_col not in ("id_a", "id_b"):
        j1 = j1.drop_columns([id_col])
    # barrier between the two joins: only ONE hash-aggregator pool is live
    # at a time (two pools in one streaming plan can starve each other on a
    # small cluster); a hash join is an all-to-all barrier anyway
    j1 = j1.materialize()

    j2 = j1.join(
        corp, "inner", num_partitions=nparts,
        on=("id_b",), right_on=(id_col,), right_suffix="_cb",
    )
    j2 = j2.rename_columns({text_col: "__text_b"})
    if id_col in j2.columns() and id_col not in ("id_a", "id_b"):
        j2 = j2.drop_columns([id_col])

    def verify(batch: pa.Table) -> pa.Table:
        j = _jaccard_batch(batch["__text_a"].to_pylist(),
                           batch["__text_b"].to_pylist(), shingle_k)
        keep = j >= threshold
        t = pa.table({
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "jaccard": pa.array(j, pa.float64()),
        })
        return t.filter(pa.array(keep))

    return j2.map_batches(verify, batch_format="pyarrow")


def jaccard_verify_pairs(
    pairs_ds, corpus_ds, id_col: str, text_col: str = "text",
    shingle_k: int = 5, threshold: float = 0.8, method: str = "broadcast",
):
    """Stage 3: verify candidate pairs by true shingle Jaccard.

    method="broadcast" (default, near-dup-sparse corpora): the corpus is
    first SEMI-JOINED down to ids that appear in a candidate pair (a
    distributed `pc.is_in` filter — only the sparse near-dup subset ever
    leaves the workers), and only that subset is broadcast via ray.put for
    random access during verification. The full corpus is never materialized
    on the driver; driver memory is O(candidate ids + candidate texts).

    method="join" (duplicate-heavy corpora): two distributed hash joins,
    zero driver state — see jaccard_verify_pairs_join.
    """
    if method == "join":
        return jaccard_verify_pairs_join(
            pairs_ds, corpus_ds, id_col, text_col, shingle_k, threshold)
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


def connected_components_distributed(
    pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
    max_rounds: int = 50, num_partitions: int | None = None,
):
    """Distributed connected components over the verified-duplicate edge set
    by min-label propagation: every vertex starts labeled with itself; each
    round, each vertex takes the min of its own label and its neighbors'
    labels (one hash join edges⋈labels + one groupby-min); stop when a
    round changes nothing. Rounds needed = graph diameter — duplicate
    clusters from LSH verification are near-cliques, so 2-4 in practice.

    Driver state is O(1): only the per-round convergence checksum (a
    commutative hash-sum of (vertex,label) pairs) is aggregated down.
    Returns a Dataset with columns (id, cluster) where cluster is the
    minimum member id — identical clustering to the driver-side union-find
    (same canonical representative).
    """
    import pyarrow.compute as pc  # noqa: F401
    import ray.data  # noqa: F401

    nparts = _join_partitions(num_partitions)

    # undirected edge list, both directions: (src, dst)
    def both_dirs(t: pa.Table) -> pa.Table:
        src = pa.concat_arrays([t[id_a].combine_chunks(),
                                t[id_b].combine_chunks()])
        dst = pa.concat_arrays([t[id_b].combine_chunks(),
                                t[id_a].combine_chunks()])
        return pa.table({"src": src, "dst": dst})

    edges = (pairs_ds.select_columns([id_a, id_b])
             .map_batches(both_dirs, batch_format="pyarrow").materialize())

    # initial labels: label(v) = v
    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["src"], "label": t["src"]})

    from solr_ray.ops.grouping import distinct

    def _arrowize(d):
        # normalize block type: union/join require both sides to match
        return d.map_batches(lambda t: t, batch_format="pyarrow")

    labels = _arrowize(distinct(
        edges.map_batches(init_labels, batch_format="pyarrow"), ["id"]
    )).materialize()

    def checksum(ds) -> int:
        def h(t: pa.Table) -> pa.Table:
            s = pd.util.hash_array(
                np.array([f"{i}\x00{l}" for i, l in
                          zip(t["id"].to_pylist(), t["label"].to_pylist())],
                         dtype=object),
                hash_key="solr_ray_cc_sum0")
            return pa.table({"h": pa.array(
                [int(s.sum(dtype=np.uint64))], pa.uint64())})

        part = ds.map_batches(h, batch_format="pyarrow")
        tot = 0
        for b in part.iter_batches(batch_format="pyarrow"):
            for v in b["h"].to_pylist():
                tot = (tot + v) % (1 << 64)
        return tot

    prev = checksum(labels)
    for _ in range(max_rounds):
        # neighbor labels: edges ⋈ labels on src -> (dst, label)
        msgs = edges.join(
            labels, "inner", num_partitions=nparts,
            on=("src",), right_on=("id",),
        ).select_columns(["dst", "label"]).rename_columns({"dst": "id"})
        msgs = _arrowize(msgs)
        # new label = min(own, neighbors')
        import ray.data.aggregate as agg

        labels = _arrowize(
            labels.union(msgs)
            .groupby("id").aggregate(agg.Min("label", alias_name="label"))
        ).materialize()
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels.rename_columns({"label": "cluster"})


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
    """Batch SimHash, value-identical to per-row simhash64 (which stays as
    the scalar reference): ONE tokenize_array + ONE hash_array over the
    batch's flattened tokens, then per-bit majority votes as 64 segment
    sums (cumsum + offset-diff — no per-doc python, no tokens x 64
    matrix in memory)."""
    az = process_analyzer(analyzer)
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = az.tokenize_array(col)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    n = len(batch)
    if len(flat) == 0:
        vals = np.zeros(n, dtype=np.uint64)
    else:
        hashes = pd.util.hash_array(
            np.asarray(flat.to_pandas(), dtype=object),
            hash_key="solr_ray_simhash")
        ntok = np.diff(offs)
        vals = np.zeros(n, dtype=np.uint64)
        cs = np.empty(len(hashes) + 1, dtype=np.int64)
        for j in range(64):
            bit = ((hashes >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            cs[0] = 0
            np.cumsum(bit, out=cs[1:])
            ones = cs[offs[1:]] - cs[offs[:-1]]
            v = 2 * ones - ntok  # sum of (2*bit - 1) per doc
            vals |= (v > 0).astype(np.uint64) << np.uint64(j)
        vals[ntok == 0] = 0
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
