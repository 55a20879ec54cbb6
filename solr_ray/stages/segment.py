"""Per-partition segment build: docs -> sorted, compressed posting lists.

The Ray-native equivalent of Lucene's in-RAM inverted buffer flush
(SolrIndexWriter — reference
solr/core/src/java/org/apache/solr/update/SolrIndexWriter.java:54,148-150,
flush threshold SolrIndexConfig.java:99-153): one bucket-group of documents
becomes one immutable segment directory:

    segments/seg=<id>/postings.parquet   term-sorted posting lists (codec.py)
    segments/seg=<id>/docs.parquet       doc_id, url, dl (+ stored fields)
    segments/seg=<id>/manifest.json      lineage + metrics (state/manifest.py)

The entire build is vectorized: ONE arrow group_by computes (doc,term) tfs,
ONE varint pass encodes every posting list of the segment (per-term slicing is
zero-copy offset arithmetic on the shared buffer), and block impact metadata
comes from ``np.maximum.reduceat`` over the contiguous block tiling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from solr_ray.stages.codec import BLOCK_SIZE


_VARINT_THRESHOLDS = (np.uint64(1) << np.arange(7, 64, 7, dtype=np.uint64))


def _varint_nbytes(v: np.ndarray) -> np.ndarray:
    # one searchsorted pass (vs 9 full-array compares): nb = #thresholds <= v + 1
    return np.searchsorted(_VARINT_THRESHOLDS, v, side="right") + 1


def _varint_encode_flat(v: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """LEB128 bytes for the whole flat array (uint8 ndarray).

    Bandwidth-sensitive (runs once per posting per segment): works in
    uint32 when values allow (halves memory traffic vs uint64), writes
    the always-present first byte unmasked, and only mask-compresses the
    rare continuation bytes.
    """
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    kmax = int(nb.max())
    w = v.astype(np.uint32) if kmax <= 4 else v  # nb<=4 => v < 2^28
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nb[:-1], out=offsets[1:])
    out = np.empty(int(offsets[-1] + nb[-1]), dtype=np.uint8)
    first = (w & np.uint8(0x7F)).astype(np.uint8)
    if kmax > 1:
        first |= (nb > 1).astype(np.uint8) << 7
    out[offsets] = first
    for k in range(1, kmax):
        mask = nb > k
        wm = w[mask]
        chunk = ((wm >> type(wm[0])(7 * k)) & type(wm[0])(0x7F)).astype(np.uint8)
        cont = (nb[mask] > k + 1).astype(np.uint8) << 7
        out[offsets[mask] + k] = chunk | cont
    return out


def _sliced_large_binary(data: np.ndarray, value_nb: np.ndarray, starts: np.ndarray) -> pa.Array:
    """Split one byte stream into a large_binary array at value boundaries.

    starts: value index of each output element's first value (ascending,
    tiling the whole array). Zero-copy: offsets point into the shared buffer.
    """
    byte_cum = np.zeros(value_nb.size + 1, dtype=np.int64)
    np.cumsum(value_nb, out=byte_cum[1:])
    t = starts.size
    offs = np.empty(t + 1, dtype=np.int64)
    offs[:t] = byte_cum[starts]
    offs[t] = byte_cum[-1]
    return pa.Array.from_buffers(
        pa.large_binary(), t, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())]
    )


def encode_doc_blobs(gcodes: np.ndarray, tfs: np.ndarray,
                     nterms: np.ndarray) -> tuple[pa.Array, pa.Array]:
    """Per-doc (ascending global term codes, parallel tfs) -> two
    large_binary columns: codes delta+LEB128 within each doc (first value
    absolute), tfs LEB128. This is the compact bucket-shuffle payload
    (~2.5 B/entry vs ~8 B + dictionary for the list<dict> token columns):
    no arrow dictionaries cross the exchange, so the reduce side does no
    dictionary unification and block concat is a plain byte copy."""
    n = nterms.size
    doc_starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(nterms[:-1], out=doc_starts[1:])
    if gcodes.size:
        deltas = gcodes.astype(np.int64, copy=True)
        deltas[1:] -= gcodes[:-1]
        nz = nterms > 0
        deltas[doc_starts[nz]] = gcodes[doc_starts[nz]]
        du = deltas.astype(np.uint64)
    else:
        du = np.empty(0, dtype=np.uint64)
    nb_c = _varint_nbytes(du)
    enc_c = _varint_encode_flat(du, nb_c)
    tu = tfs.astype(np.uint64)
    nb_t = _varint_nbytes(tu)
    enc_t = _varint_encode_flat(tu, nb_t)
    return (_sliced_large_binary(enc_c, nb_c, doc_starts),
            _sliced_large_binary(enc_t, nb_t, doc_starts))


def _binary_col_bytes(col) -> np.ndarray:
    """Concatenated value bytes of a binary/large_binary column in row order
    (zero-copy view into the arrow buffer)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint8)
    off_t = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_t)[
        arr.offset: arr.offset + len(arr) + 1]
    return np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]: offs[-1]]


def decode_doc_blobs(codes_col, tfs_col, nterms: np.ndarray,
                     total: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_doc_blobs over whole columns: (gcodes, tfs) flat
    int64 arrays, one entry per (doc, term) in row-major order."""
    from solr_ray.stages.codec import varint_decode

    vals = varint_decode(_binary_col_bytes(codes_col), total).astype(np.int64)
    tfs = varint_decode(_binary_col_bytes(tfs_col), total).astype(np.int64)
    if total == 0:
        return vals, tfs
    c = np.cumsum(vals)
    doc_starts = np.zeros(nterms.size, dtype=np.int64)
    if nterms.size > 1:
        np.cumsum(nterms[:-1], out=doc_starts[1:])
    base = np.where(doc_starts > 0, c[doc_starts - 1], 0)
    gcodes = c - np.repeat(base, nterms)
    return gcodes, tfs


def encode_postings_columns(
    terms_sorted: pa.Array,
    doc_ids_f: np.ndarray,
    tfs_f: np.ndarray,
    dls_f: np.ndarray,
    term_starts: np.ndarray,
) -> pa.Table:
    """Flat (term-major, doc_id-ascending-within-term) postings -> table.

    terms_sorted: unique term per run (len T); term_starts: first flat index
    of each term's run (len T, ascending, term_starts[0] == 0).
    """
    n = doc_ids_f.size
    t = term_starts.size
    counts = np.empty(t, dtype=np.int64)
    counts[:-1] = np.diff(term_starts)
    counts[-1] = n - term_starts[-1]

    # --- doc id deltas with reset at term starts
    deltas = doc_ids_f.copy()
    deltas[1:] -= doc_ids_f[:-1]
    deltas[term_starts] = doc_ids_f[term_starts]
    deltas_u = deltas.astype(np.uint64)
    nb_d = _varint_nbytes(deltas_u)
    enc_d = _varint_encode_flat(deltas_u, nb_d)

    tfs_u = tfs_f.astype(np.uint64)
    nb_t = _varint_nbytes(tfs_u)
    enc_t = _varint_encode_flat(tfs_u, nb_t)

    # --- per-term block tiling (contiguous over the flat arrays)
    n_blocks = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
    first_block = np.zeros(t + 1, dtype=np.int64)
    np.cumsum(n_blocks, out=first_block[1:])
    total_b = int(first_block[-1])
    term_of_block = np.repeat(np.arange(t, dtype=np.int64), n_blocks)
    block_in_term = np.arange(total_b, dtype=np.int64) - first_block[term_of_block]
    block_start = term_starts[term_of_block] + BLOCK_SIZE * block_in_term
    run_end = term_starts[term_of_block] + counts[term_of_block]
    block_end = np.minimum(block_start + BLOCK_SIZE, run_end)

    block_max_tf = np.maximum.reduceat(tfs_f, block_start) if total_b else np.empty(0, np.int64)
    block_min_dl = np.minimum.reduceat(dls_f, block_start) if total_b else np.empty(0, np.int64)
    block_last = doc_ids_f[block_end - 1] if total_b else np.empty(0, np.int64)

    # per-block byte offsets (relative to the term's slice) so WAND can decode
    # one 128-posting block without decompressing the whole list
    byte_cum_d = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb_d, out=byte_cum_d[1:])
    byte_cum_t = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb_t, out=byte_cum_t[1:])
    if total_b:
        blk_off_d = byte_cum_d[block_start] - byte_cum_d[term_starts[term_of_block]]
        blk_off_t = byte_cum_t[block_start] - byte_cum_t[term_starts[term_of_block]]
    else:
        blk_off_d = blk_off_t = np.empty(0, np.int64)

    boff = pa.array(first_block, type=pa.int64())
    cf = np.add.reduceat(tfs_f, term_starts) if n else np.empty(0, np.int64)
    return pa.table(
        {
            "term": terms_sorted,
            "df": pa.array(counts, type=pa.int64()),
            "cf": pa.array(cf, type=pa.int64()),
            "doc_ids_delta_varint": _sliced_large_binary(enc_d, nb_d, term_starts),
            "tfs_varint": _sliced_large_binary(enc_t, nb_t, term_starts),
            "block_last_doc": pa.LargeListArray.from_arrays(boff, pa.array(block_last, type=pa.int64())),
            "block_max_tf": pa.LargeListArray.from_arrays(boff, pa.array(block_max_tf.astype(np.int32))),
            "block_min_dl": pa.LargeListArray.from_arrays(
                boff, pa.array(np.minimum(block_min_dl, np.iinfo(np.int32).max).astype(np.int32))
            ),
            "block_off_docs": pa.LargeListArray.from_arrays(boff, pa.array(blk_off_d, type=pa.int64())),
            "block_off_tfs": pa.LargeListArray.from_arrays(boff, pa.array(blk_off_t, type=pa.int64())),
        }
    )


def build_segment_tables(
    group: pa.Table,
    doc_id_offset: int,
    stored_cols: tuple[str, ...] = (),
    store_positions: bool = False,
    vocab: pa.Array | None = None,
) -> tuple[pa.Table, pa.Table]:
    """One bucket group (url, h, dl, tokens [, stored...]) -> (postings, docs).

    Doc order within the segment is url ascending — deterministic,
    independent of how Ray blocked the shuffle, and (because buckets
    partition the url space) equivalent to "doc_id = rank of url within
    bucket" per SURVEY.md §7.0; with one bucket it is the global url rank.
    """
    group = group.combine_chunks()
    order = pc.sort_indices(
        group.select(["url"]),
        sort_keys=[("url", "ascending")],
    )
    group = group.take(order)
    n = group.num_rows
    doc_ids = doc_id_offset + np.arange(n, dtype=np.int64)

    if "codes_blob" in group.column_names:
        # global-code varint-blob payload (pipelines/build_index.py remap):
        # codes ARE ranks in the broadcast sorted vocab — no per-segment
        # dictionary unification, vocab sort or inverse permutation; the
        # rest is the same single-np.sort tf-packed path as tf mode below,
        # producing bit-identical postings.
        if vocab is None:
            raise ValueError("blob payload requires the global vocab array")
        nterms = group["nterms"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = group["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(nterms.sum())
        gcodes, flat_tfs = decode_doc_blobs(
            group["codes_blob"], group["tfs_blob"], nterms, total)
        if total == 0:
            postings = encode_postings_columns(
                pa.array([], type=pa.string()),
                np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), np.empty(0, np.int64),
            )
        else:
            parent = np.repeat(np.arange(n, dtype=np.int64), nterms)
            key = gcodes * np.int64(n) + parent
            tf_max = int(flat_tfs.max(initial=0))
            if tf_max < 65536 and len(vocab) * n < 2**46:
                k2 = key * np.int64(65536) + flat_tfs
                k2.sort()
                ks_u = k2 >> np.int64(16)
                tfs_f = (k2 & np.int64(0xFFFF))
            else:
                o2 = np.argsort(key)
                ks_u = key[o2]
                tfs_f = flat_tfs[o2]
            did_local = ks_u % np.int64(n)
            did_f = did_local + doc_id_offset
            ranks_f = ks_u // np.int64(n)
            dls_f = dl[did_local]
            starts = np.flatnonzero(
                np.diff(ranks_f, prepend=ranks_f[0] - 1))
            uniq_terms = vocab.take(pa.array(ranks_f[starts]))
            postings = encode_postings_columns(
                uniq_terms, did_f, tfs_f, dls_f, starts)
        docs_cols = {
            "doc_id": pa.array(doc_ids),
            "url": group["url"],
            "dl": pa.array(dl),
        }
        for c in stored_cols:
            if c in group.column_names:
                docs_cols[c] = group[c]
        return postings, pa.table(docs_cols)

    toks = group["tokens"].combine_chunks() if isinstance(group["tokens"], pa.ChunkedArray) else group["tokens"]
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_terms = toks.flatten()
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)

    # tf mode: the analyze stage pre-aggregated per-doc term frequencies
    # ("tfs" column parallel to the deduped token codes) — the flat stream
    # is one entry per (doc, term), and dl = sum of tfs, not list length
    tf_mode = "tfs" in group.column_names and not store_positions
    if tf_mode:
        tfs_l = (group["tfs"].combine_chunks()
                 if isinstance(group["tfs"], pa.ChunkedArray)
                 else group["tfs"])
        flat_tfs = tfs_l.flatten().to_numpy(
            zero_copy_only=False).astype(np.int64)
        dl = np.bincount(parent, weights=flat_tfs,
                         minlength=n).astype(np.int64)
    else:
        dl = counts.astype(np.int64)

    if len(flat_terms) == 0:
        postings = encode_postings_columns(
            pa.array([], type=pa.string()),
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
        if store_positions:
            postings = postings.append_column(
                "positions",
                pa.LargeListArray.from_arrays(
                    pa.array(np.zeros(1, dtype=np.int64)),
                    pa.array([], pa.int32())))
            if "payloads" in group.column_names:
                postings = postings.append_column(
                    "payloads",
                    pa.LargeListArray.from_arrays(
                        pa.array(np.zeros(1, dtype=np.int64)),
                        pa.array([], pa.float32())))
    else:
        # dictionary-encode ONCE, then all grouping/sorting runs on int32
        # codes instead of strings (micro-profiled ~1.9x on group_by+sort;
        # macro gain is workload-dependent). The code->rank remap uses
        # UTF-8-byte sort order, identical to sorting term strings. When the
        # analyze stage already shipped dictionary-encoded tokens, the
        # combine_chunks above unified the per-block dictionaries and we use
        # the codes as-is — no re-hash of the token stream.
        if isinstance(flat_terms, pa.DictionaryArray):
            denc = flat_terms
        else:
            denc = flat_terms.dictionary_encode()
        vocab = denc.dictionary
        vorder = pc.sort_indices(vocab)
        inv = np.empty(len(vocab), dtype=np.int64)
        inv[vorder.to_numpy(zero_copy_only=False)] = np.arange(len(vocab))

        # ONE stable argsort of a composite (term-rank, doc) key over the
        # flat token stream replaces the (did, code) hash aggregation AND the
        # grouped-row lexsort: run-length-encoding the sorted keys yields the
        # term-major / doc-ascending flat postings with their tfs directly.
        # Stability keeps equal keys in stream order, so token positions come
        # out (term, doc, pos)-sorted for free. rank*n + doc < vocab*n — far
        # inside int64 at any per-segment size we allow.
        codes_flat = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rank_flat = inv[codes_flat]
        key = rank_flat * np.int64(n) + parent
        if tf_mode:
            # entries are already unique per (doc, term): pack the tf into
            # the key's low 16 bits so ONE np.sort yields postings AND tfs
            # (no permutation array); fall back to argsort for huge tfs
            tf_max = int(flat_tfs.max(initial=0))
            if tf_max < 65536 and len(vocab) * n < 2**46:
                k2 = key * np.int64(65536) + flat_tfs
                k2.sort()
                ks_u = k2 >> np.int64(16)
                tfs_f = (k2 & np.int64(0xFFFF))
            else:
                o2 = np.argsort(key)
                ks_u = key[o2]
                tfs_f = flat_tfs[o2]
        else:
            if len(vocab) * n < 2**31:
                key = key.astype(np.int32)  # halves sort bandwidth
            if store_positions:
                # positions need the permutation, and stability keeps equal
                # keys (same term+doc) in stream order == position order
                order = np.argsort(key, kind="stable")
                ks = key[order].astype(np.int64)
            else:
                # only the sorted keys are needed: tf = run length, and
                # (term-rank, doc) decompose from the key arithmetic
                order = None
                ks = np.sort(key).astype(np.int64)
            run_start = np.flatnonzero(np.diff(ks, prepend=ks[0] - 1))
            ks_u = ks[run_start]
            tfs_f = np.empty(run_start.size, dtype=np.int64)
            tfs_f[:-1] = np.diff(run_start)
            tfs_f[-1] = ks.size - run_start[-1]
        did_local = ks_u % np.int64(n)
        did_f = did_local + doc_id_offset
        ranks_f = ks_u // np.int64(n)
        dls_f = dl[did_local]
        starts = np.flatnonzero(np.diff(ranks_f, prepend=ranks_f[0] - 1))
        vocab_sorted = vocab.take(vorder)
        uniq_terms = vocab_sorted.take(pa.array(ranks_f[starts]))
        postings = encode_postings_columns(uniq_terms, did_f, tfs_f, dls_f, starts)

        if store_positions:
            # token position within the ANALYZED stream (stop-filtered, no
            # gaps — phrase == adjacency in the analyzed token sequence).
            # `order` is (term, doc)-sorted and stable, and the flat stream
            # ascends by position within a doc, so pos_all[order] is already
            # (term, did, pos)-sorted; per-TERM list offsets = cumsum(cf).
            tok_start = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=tok_start[1:])
            pos_all = (np.arange(int(counts.sum()), dtype=np.int64)
                       - np.repeat(tok_start[:-1], counts))
            pos_sorted = pa.array(pos_all[order].astype(np.int32))
            cf = postings["cf"].to_numpy(zero_copy_only=False)
            pos_offs = np.zeros(cf.size + 1, dtype=np.int64)
            np.cumsum(cf, out=pos_offs[1:])
            postings = postings.append_column(
                "positions",
                pa.LargeListArray.from_arrays(pa.array(pos_offs), pos_sorted))
            if "payloads" in group.column_names:
                # per-token payloads (DelimitedPayloadTokenFilter analog):
                # the parallel float32 stream rides the SAME permutation and
                # list offsets as positions — payload[i] belongs to the
                # occurrence at positions[i]
                pl = group["payloads"]
                if isinstance(pl, pa.ChunkedArray):
                    pl = pl.combine_chunks()
                flat_pl = np.asarray(
                    pl.flatten().to_numpy(zero_copy_only=False),
                    dtype=np.float32)
                if flat_pl.size != pos_all.size:
                    raise ValueError(
                        "payloads misaligned with token stream "
                        f"({flat_pl.size} vs {pos_all.size}): payload "
                        "indexing requires an analyzer that keeps every "
                        "token (whitespace)")
                postings = postings.append_column(
                    "payloads",
                    pa.LargeListArray.from_arrays(
                        pa.array(pos_offs),
                        pa.array(flat_pl[order], pa.float32())))

    docs_cols = {
        "doc_id": pa.array(doc_ids),
        "url": group["url"],
        "dl": pa.array(dl),
    }
    for c in stored_cols:
        if c in group.column_names:
            docs_cols[c] = group[c]
    return postings, pa.table(docs_cols)
