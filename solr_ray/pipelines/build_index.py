"""Inverted-index build: pages Dataset -> segment directories + global stats.

The Ray-Data-native counterpart of the reference's ingest path (§3.1 of
SURVEY.md: loader -> update-processor chain -> hash routing
(CompositeIdRouter.java:136-148) -> per-shard IndexWriter flush -> commit):

  pass 1  read -> extract_html -> analyze (dict-encoded token codes; tf
          pre-aggregated per doc when positions are off) -> materialize ->
          per-bucket counts -> doc_id offsets (no second read of the raw
          corpus) -> groupby(bucket) push-based shuffle -> segment build
          (one immutable segment dir per bucket, manifest-checkpointed)
  pass 2  per-segment (term, df, cf) partials -> groupby(term).sum -> stats
  publish corpus.json + index.json manifest (the "commit")

Scale notes (100 TB / 10^12 docs):
- the bucket shuffle is keyed by hash(url) — uniform by construction; term
  skew never touches this exchange. Zipf-head terms only meet a shuffle in
  pass 2, where rows are already per-(segment,term) partials: ≤ num_segments
  rows per term regardless of corpus size (combiner-style pre-aggregation).
- num_buckets controls segment size; pick ~ corpus_docs / 1-4M so one bucket
  group fits a worker's heap. Buckets are contiguous doc_id ranges, so a
  later tiered merge is pure posting-list concatenation.
- resume: re-running skips completed buckets via their manifest lineage
  (input count + config); a fully-complete build returns without reading
  pages at all.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from solr_ray.analysis.chain import analyze_batch, get_analyzer
from solr_ray.stages.docids import add_bucket
from solr_ray.stages.extract import extract_batch
from solr_ray.stages.segment import build_segment_tables
from solr_ray.stages.worker_gc import tune_worker_gc
from solr_ray.state.manifest import is_complete, read_manifest, write_manifest


def _seg_dir(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "segments", f"seg={bucket:05d}")


def _extract_payloads(t: pa.Table, text_col: str, delim: str) -> pa.Table:
    """Split ``term<delim>weight`` tokens into clean text + a parallel
    ``payloads`` list<float32> column (DelimitedPayloadTokenFilter,
    solr/core: FieldType delimited_payloads_float; default weight 1.0 when
    a token carries no delimiter). Fully vectorized: one whitespace split,
    one element-wise append of the default, one delimiter split."""
    import pyarrow.compute as pc

    txt = t[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    toks = pc.utf8_split_whitespace(txt)
    # utf8_split_whitespace emits EMPTY tokens for empty strings and
    # leading/trailing/double spaces — the whitespace analyzer never does,
    # so drop them (rebuilding list offsets) or payloads misalign with the
    # token stream downstream.
    raw_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    raw_flat = toks.values
    keep_mask = pc.not_equal(raw_flat, "")
    keep = keep_mask.to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(keep)])
    offsets = pa.array(cum[raw_off], pa.int32())
    flat = raw_flat.filter(keep_mask)
    # "tok|2.5" -> "tok|2.5|1", "tok" -> "tok|1": parts[1] is always the
    # payload (the user's, or the appended default)
    marked = pc.binary_join_element_wise(flat, pa.scalar("1"),
                                         pa.scalar(delim))
    parts = pc.split_pattern(marked, pattern=delim)
    term = pc.list_element(parts, 0)
    payf = pc.cast(pc.cast(pc.list_element(parts, 1), pa.float64()),
                   pa.float32())
    clean = pc.binary_join(pa.ListArray.from_arrays(offsets, term),
                           pa.scalar(" "))
    cols = {}
    for c in t.column_names:
        cols[c] = clean if c == text_col else t[c]
    cols["payloads"] = pa.ListArray.from_arrays(offsets, payf)
    return pa.table(cols)


# vocab sizes above this skip the global-code blob payload (the sorted-vocab
# union would strain the driver) and fall back to the dict-token shuffle —
# same gating idea as the stats merge threshold below
_VOCAB_MAX_TERMS = 20_000_000


def _collect_global_vocab(tokenized, max_terms: int = _VOCAB_MAX_TERMS):
    """Union of the per-block token dictionaries, sorted by UTF-8 byte order
    (== the term sort order segments use). Nearly free: the analyze stage
    already dict-encoded each block, so this ships ONLY each block's distinct
    terms (zipf vocab ≪ corpus), never the token stream. Returns None when
    the union would exceed max_terms (the 100-TB fallback keeps the
    dict-token payload; a distributed rank-assignment pass would be the next
    step at that scale — documented, not needed for any in-sandbox corpus)."""
    import pyarrow.compute as pc

    def _dicts(t: pa.Table) -> pa.Table:
        col = t["tokens"]
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        parts = []
        for ch in chunks:
            v = ch.values
            if isinstance(v, pa.DictionaryArray):
                parts.append(v.dictionary)
        if not parts:
            return pa.table({"term": pa.array([], pa.string())})
        u = pc.unique(pa.chunked_array(parts)) if len(parts) > 1 \
            else pc.unique(parts[0])
        return pa.table({"term": u})

    parts, total = [], 0
    for b in tokenized.map_batches(
            _dicts, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        parts.append(b)
        total += b.num_rows
        if total > max_terms:
            return None
    if not parts:
        return None
    vocab = pc.unique(pa.concat_tables(parts)["term"].combine_chunks())
    if len(vocab) > max_terms:
        return None
    return vocab.take(pc.sort_indices(vocab))


def _make_blob_remap(vocab_ref, stored_cols: tuple[str, ...]):
    """map_batches fn: dict-token columns -> per-doc global-code varint
    blobs. Runs fused into the bucket shuffle's map side (cheap int ops, no
    extra materialize). Payload per (doc, term) entry drops from ~8 B +
    dictionary overhead to ~2.5 B, and the reduce side stops unifying
    arrow dictionaries across blocks."""
    import ray

    from solr_ray.stages.segment import encode_doc_blobs

    def remap(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vocab = ray.get(vocab_ref)
        if t.num_rows == 0:
            cols = {
                "url": t["url"],
                "bucket": t["bucket"],
                "nterms": pa.array([], pa.int32()),
                "dl": pa.array([], pa.int64()),
                "codes_blob": pa.array([], pa.large_binary()),
                "tfs_blob": pa.array([], pa.large_binary()),
            }
            for c in stored_cols:
                if c in t.column_names:
                    cols[c] = t[c]
            return pa.table(cols)
        t = t.combine_chunks()
        toks = t["tokens"].chunk(0)
        tfs_l = t["tfs"].chunk(0)
        n = t.num_rows
        nterms = np.diff(
            toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        vals = toks.values
        d = vals.dictionary
        trans = pc.index_in(d, value_set=vocab)
        if trans.null_count:
            raise RuntimeError("block dictionary term missing from the "
                               "global vocab (vocab pass out of sync)")
        trans = trans.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = vals.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        g = trans[codes]
        tf = tfs_l.values.to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(n, dtype=np.int64), nterms)
        V = np.int64(len(vocab))
        # per-doc sort by GLOBAL code (tf rides in the low bits when safe);
        # parent occupies the high bits so one flat sort sorts every doc
        tf_max = int(tf.max(initial=0))
        if tf_max < 65536 and n * int(V) < 2**45:
            k2 = (parent * V + g) * np.int64(65536) + tf
            k2.sort()
            tf_s = k2 & np.int64(0xFFFF)
            g_s = (k2 >> np.int64(16)) % V
        else:
            o = np.lexsort((g, parent))
            g_s = g[o]
            tf_s = tf[o]
        dl = np.bincount(parent, weights=tf,
                         minlength=n).astype(np.int64)
        codes_blob, tfs_blob = encode_doc_blobs(g_s, tf_s, nterms)
        out = {
            "url": t["url"],
            "bucket": t["bucket"],
            "nterms": pa.array(nterms.astype(np.int32)),
            "dl": pa.array(dl),
            "codes_blob": codes_blob,
            "tfs_blob": tfs_blob,
        }
        for c in stored_cols:
            if c in t.column_names:
                out[c] = t[c]
        return pa.table(out)

    return remap


class _SegmentWriter:
    """groupby(bucket).map_groups body: build + atomically publish one segment."""

    def __init__(self, out_dir: str, offsets: dict[int, int],
                 lineages: dict[int, str], stored_cols: tuple[str, ...],
                 dir_prefix: str = "seg", store_positions: bool = False,
                 vocab_ref=None):
        self.out_dir = out_dir
        self.offsets = offsets
        self.lineages = lineages
        self.stored_cols = stored_cols
        self.dir_prefix = dir_prefix
        self.store_positions = store_positions
        self.vocab_ref = vocab_ref  # broadcast global vocab (blob payload)

    def __call__(self, group: pa.Table) -> pa.Table:
        tune_worker_gc()
        bucket = int(group["bucket"][0].as_py())
        seg_dir = os.path.join(
            self.out_dir, "segments", f"{self.dir_prefix}={bucket:05d}")
        lineage = self.lineages[bucket]
        t0 = time.time()
        if is_complete(seg_dir, lineage):  # resume: idempotent skip
            m = read_manifest(seg_dir)
            return pa.table({"bucket": [bucket], "n_docs": [m["n_docs"]],
                             "n_terms": [m["n_terms"]], "n_tokens": [m["n_tokens"]],
                             "skipped": [True]})
        vocab = (ray.get(self.vocab_ref)
                 if self.vocab_ref is not None else None)
        postings, docs = build_segment_tables(
            group, self.offsets[bucket], self.stored_cols,
            store_positions=self.store_positions, vocab=vocab,
        )
        os.makedirs(seg_dir, exist_ok=True)
        # small row groups (term-sorted) let the lazy reader load only the
        # row groups containing queried terms (searcher.SegmentIndex lazy=True)
        pq.write_table(postings, os.path.join(seg_dir, "postings.parquet"),
                       row_group_size=8192)
        pq.write_table(docs, os.path.join(seg_dir, "docs.parquet"))
        n_tokens = int(docs["dl"].to_numpy().sum()) if docs.num_rows else 0
        write_manifest(seg_dir, {
            "bucket": bucket,
            "doc_id_offset": self.offsets[bucket],
            "n_docs": docs.num_rows,
            "n_terms": postings.num_rows,
            "n_tokens": n_tokens,
            "lineage": lineage,
            "files": ["postings.parquet", "docs.parquet"],
            "build_sec": round(time.time() - t0, 3),
        })
        return pa.table({"bucket": [bucket], "n_docs": [docs.num_rows],
                         "n_terms": [postings.num_rows], "n_tokens": [n_tokens],
                         "skipped": [False]})


def _write_global_stats(out_dir: str, postings_files: list[str],
                        preread: list[pa.Table] | None = None) -> None:
    """Global (term -> df, cf) from per-segment partials.

    Partials are one row per (term, segment) — tiny relative to the corpus.
    Below ~20M partial rows a single-process Arrow group_by beats a Ray
    shuffle by an order of magnitude; above it (the 100 TB path, where
    vocab × segments explodes) fall back to the distributed groupby.
    `preread`: partial tables already loaded (overlapped with the segment
    phase) — skips the metadata scan and re-read on the small path.
    """
    if not postings_files:
        return
    from concurrent.futures import ThreadPoolExecutor

    stats_dir = os.path.join(out_dir, "stats")
    if preread is not None:
        n_partial_rows = sum(t.num_rows for t in preread)
    else:
        with ThreadPoolExecutor(max_workers=16) as ex:
            n_partial_rows = sum(ex.map(
                lambda f: pq.ParquetFile(f).metadata.num_rows, postings_files
            ))
    os.makedirs(stats_dir, exist_ok=True)
    for old in os.listdir(stats_dir):  # clear prior generation's files
        os.remove(os.path.join(stats_dir, old))
    if n_partial_rows <= 20_000_000:
        if preread is not None:
            part = pa.concat_tables(preread)
        else:
            with ThreadPoolExecutor(max_workers=16) as ex:
                part = pa.concat_tables(ex.map(
                    lambda f: pq.read_table(f, columns=["term", "df", "cf"],
                                            use_threads=False),
                    postings_files,
                ))
        merged = part.group_by("term", use_threads=True).aggregate(
            [("df", "sum"), ("cf", "sum")]
        )
        merged = pa.table({
            "term": merged["term"],
            "df": merged["df_sum"],
            "cf": merged["cf_sum"],
        })
        pq.write_table(merged, os.path.join(stats_dir, "stats.parquet"))
    else:
        stats = (
            ray.data.read_parquet(postings_files,
                                  columns=["term", "df", "cf"])
            .groupby("term")
            .aggregate(ray.data.aggregate.Sum("df", alias_name="df"),
                       ray.data.aggregate.Sum("cf", alias_name="cf"))
        )
        stats.write_parquet(stats_dir)


def build_index(
    pages,
    out_dir: str,
    analyzer: str = "text_en",
    num_buckets: int = 16,
    text_source: str = "html",
    stored_cols: tuple[str, ...] = (),
    resume: bool = True,
    store_positions: bool = False,
    payload_delimiter: str | None = None,
) -> dict:
    """Build an index at out_dir from a pages Dataset or parquet path(s).

    text_source: "html" (extract first — the north-rule path) or "text"
    (column already extracted, e.g. the driver's documents table).
    Returns the index manifest dict.
    """
    get_analyzer(analyzer)  # validate eagerly, not deep inside a Ray task
    if payload_delimiter is not None:
        # DelimitedPayloadTokenFilter analog: "term<delim>weight" tokens.
        # Payloads parallel the position stream 1:1, so the analyzer must
        # keep every whitespace token (no stop/drop filters).
        if not store_positions:
            raise ValueError("payload_delimiter requires store_positions=True")
        if analyzer != "whitespace":
            raise ValueError(
                "payload indexing requires the whitespace analyzer "
                "(token-per-payload alignment)")
    if isinstance(pages, (str, list)):
        pages = ray.data.read_parquet(pages)

    index_json = os.path.join(out_dir, "index.json")
    # Resume fast-path: trust a published index.json whose build params match
    # and whose segment manifests are all intact — returns without touching
    # the input at all. (index.json is written atomically AFTER every segment
    # manifest, so its presence implies a consistent build.)
    if resume and os.path.exists(index_json):
        with open(index_json) as f:
            prior = json.load(f)
        if (
            prior.get("analyzer") == analyzer
            and prior.get("num_buckets") == num_buckets
            and prior.get("text_source") == text_source
            and bool(prior.get("store_positions")) == store_positions
            and prior.get("payload_delimiter") == payload_delimiter
            and tuple(prior.get("stored_cols", ())) == tuple(stored_cols)
            and all(
                is_complete(os.path.join(out_dir, s["dir"]))
                for s in prior.get("segments", [])
            )
        ):
            return prior

    # The bucket groupby is the build's one wide exchange. Ray's default
    # pull-based sort shuffle anti-scales with worker count here (M×R tiny
    # object fetches); push-based merges map outputs en route to reducers
    # (10× faster at 32 CPUs in our profile: 52.9s -> 5.1s on a 1M-doc
    # corpus).
    _ctx = ray.data.DataContext.get_current()
    _prev_shuffle = _ctx.shuffle_strategy
    _prev_reserve = _ctx.op_resource_reservation_enabled
    _ctx.shuffle_strategy = (
        ray.data.context.ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    )
    # task-only pipeline: operator resource reservation (deadlock guard for
    # actor-pool stages) just idles CPUs here (~26/32 busy during analyze)
    _ctx.op_resource_reservation_enabled = False
    try:

        t0 = time.time()
        ds = pages
        if text_source == "html":
            ds = ds.map_batches(
                extract_batch, batch_format="pyarrow", zero_copy_batch=True,
            )
        az_name = analyzer
        # positions-free builds pre-aggregate per-doc tfs at ANALYZE time
        # ("tf" mode): the bucket shuffle then ships one (code, tf) entry per
        # distinct term per doc (~20% fewer entries on web text) and the
        # segment builder skips tf run-length aggregation entirely
        enc_mode = True if store_positions else "tf"
        keep = ["url", "tokens", "tfs", *stored_cols]
        if payload_delimiter is not None:
            keep.append("payloads")
        _delim = payload_delimiter

        def _analyze_and_bucket(t: pa.Table) -> pa.Table:
            # stateless tasks (elastic, no CPU reservation); analyzer state is
            # process-cached (analysis/chain.py:process_analyzer)
            tune_worker_gc()
            if _delim is not None:
                t = _extract_payloads(t, "text", _delim)
            t = analyze_batch(t, "text", az_name, dict_encode=enc_mode)
            t = t.select([c for c in keep if c in t.column_names])
            return add_bucket(t, "url", num_buckets)

        # Single pass over the input: extract+analyze once, hold the (url,
        # tokens, bucket) intermediate in the object store, derive per-bucket
        # counts from it (doc_id offsets), then shuffle. At cluster scale the
        # shuffle would buffer this data in the object store anyway (with
        # spilling), so the materialize adds no asymptotic memory cost — it
        # replaces a second full read+extract of the raw corpus. (Measured: a
        # streaming analyze fused into the shuffle map side is ~30% SLOWER than
        # materialize-then-shuffle — the sort-shuffle pipelines poorly with an
        # expensive fused map — so the barrier stays.)
        tokenized = ds.map_batches(
            _analyze_and_bucket, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        t_analyze = time.time() - t0

        # ONE pass over the materialized tokenized data computes BOTH the
        # per-bucket doc counts (docID offsets) and — for positions-free builds —
        # the union of per-block token dictionaries (the global-code vocab).
        # These were two separate scheduled passes; fusing them halves the
        # fixed driver-side latency between analyze and the shuffle (~1-2 s at
        # 32 CPUs, which is pure serial time in the scaling-efficiency profile).
        want_vocab = not store_positions

        def _count_and_dicts(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc
            b = t["bucket"].to_numpy(zero_copy_only=False)
            binc = np.bincount(b, minlength=num_buckets)
            nz = np.flatnonzero(binc)
            out_bucket = nz.astype(np.int64)
            out_cnt = binc[nz].astype(np.int64)
            terms = pa.array([], pa.string())
            if want_vocab:
                col = t["tokens"]
                chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
                parts = [ch.values.dictionary for ch in chunks
                         if isinstance(ch.values, pa.DictionaryArray)]
                if parts:
                    terms = (_pc.unique(pa.chunked_array(parts))
                             if len(parts) > 1 else _pc.unique(parts[0]))
            n_terms = len(terms)
            return pa.table({
                "bucket": pa.array(np.concatenate(
                    [out_bucket, np.full(n_terms, -1, np.int64)])),
                "cnt": pa.array(np.concatenate(
                    [out_cnt, np.zeros(n_terms, np.int64)])),
                "term": pa.nulls(len(out_bucket), pa.string())
                if n_terms == 0 else pa.concat_arrays(
                    [pa.nulls(len(out_bucket), pa.string()),
                     terms.combine_chunks() if isinstance(terms, pa.ChunkedArray)
                     else terms]),
            })

        import pyarrow.compute as _pcm

        counts: dict[int, int] = {}
        vocab_parts: list[pa.Array] = []
        vocab_total = 0
        vocab_overflow = not want_vocab
        for bt in tokenized.map_batches(
                _count_and_dicts, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            mask = _pcm.greater_equal(bt["bucket"], pa.scalar(0))
            cr = bt.filter(mask)
            for bb, cc in zip(cr["bucket"].to_pylist(), cr["cnt"].to_pylist()):
                counts[int(bb)] = counts.get(int(bb), 0) + int(cc)
            if not vocab_overflow:
                tr = bt.filter(_pcm.invert(mask))["term"].combine_chunks()
                vocab_parts.append(tr)
                vocab_total += len(tr)
                if vocab_total > _VOCAB_MAX_TERMS:
                    vocab_overflow = True
                    vocab_parts = []
        t_count = time.time() - t0 - t_analyze
        offsets: dict[int, int] = {}
        acc = 0
        for b in range(num_buckets):
            offsets[b] = acc
            acc += counts.get(b, 0)
        n_docs = acc

        # global-code varint-blob shuffle payload (positions-free builds with a
        # boundable vocab): block dictionaries -> sorted global vocab (broadcast
        # once via ray.put), token columns remapped to per-doc delta+varint
        # blobs fused into the shuffle's map side. ~3x fewer shuffle bytes and
        # no arrow-dictionary unification on the reduce side. Falls back to the
        # dict-token payload when the union would exceed _VOCAB_MAX_TERMS
        # (the 100-TB regime — same gating idea as the stats-merge threshold).
        vocab = None
        if not vocab_overflow and vocab_parts:
            u = _pcm.unique(pa.chunked_array(vocab_parts))
            if len(u) <= _VOCAB_MAX_TERMS:
                vocab = u.take(_pcm.sort_indices(u))
        payload = "blob" if vocab is not None else "dict"
        vocab_ref = ray.put(vocab) if vocab is not None else None

        sc_tag = ",".join(stored_cols)
        # lineage is payload-independent on purpose: both payloads produce
        # bit-identical segments, so a resume may mix them freely
        pd_tag = f"|pd={payload_delimiter}" if payload_delimiter is not None else ""
        lineages = {
            b: f"v1|az={analyzer}|nb={num_buckets}|src={text_source}|pos={int(store_positions)}|sc={sc_tag}|cnt={counts.get(b, 0)}|off={offsets[b]}{pd_tag}"
            for b in range(num_buckets)
        }

        if vocab is not None:
            ds = tokenized.map_batches(
                _make_blob_remap(vocab_ref, stored_cols),
                batch_format="pyarrow", zero_copy_batch=True,
            )
        else:
            ds = tokenized
        writer = _SegmentWriter(out_dir, offsets, lineages, stored_cols,
                                store_positions=store_positions,
                                vocab_ref=vocab_ref)

        def write_segment_group(group: pa.Table, _w=writer) -> pa.Table:
            return _w(group)

        # Stream segment summaries as groups COMPLETE and kick off each
        # segment's stats-partial read immediately on a thread pool — the stats
        # pass's I/O hides behind the segment-build tail instead of running
        # serially after it.
        from concurrent.futures import ThreadPoolExecutor

        summaries = []
        stats_parts = []
        with ThreadPoolExecutor(max_workers=8) as ex:
            res_ds = (ds.groupby("bucket")
                      .map_groups(write_segment_group, batch_format="pyarrow"))
            for batch in res_ds.iter_batches(batch_size=None,
                                             batch_format="pyarrow"):
                for row in batch.to_pylist():
                    summaries.append(row)
                    if row["n_docs"]:
                        f = os.path.join(_seg_dir(out_dir, int(row["bucket"])),
                                         "postings.parquet")
                        stats_parts.append(ex.submit(
                            pq.read_table, f, columns=["term", "df", "cf"],
                            use_threads=False))
            parts = [fut.result() for fut in stats_parts]
        build_sec = time.time() - t0

        t1 = time.time()
        _write_global_stats(out_dir, [
            os.path.join(_seg_dir(out_dir, b), "postings.parquet")
            for b in range(num_buckets) if counts.get(b, 0)
        ], preread=parts)
        stats_sec = time.time() - t1

        n_tokens = int(sum(s["n_tokens"] for s in summaries))
        manifest = {
            "version": 1,
            "analyzer": analyzer,
            "num_buckets": num_buckets,
            "text_source": text_source,
            "store_positions": store_positions,
            "payload_delimiter": payload_delimiter,
            "stored_cols": list(stored_cols),
            "n_docs": n_docs,
            "n_tokens": n_tokens,
            "avgdl": (n_tokens / n_docs) if n_docs else 0.0,
            "k1": 1.2,
            "b": 0.75,
            "segments": [
                {"dir": f"segments/seg={b:05d}", "bucket": b,
                 "doc_id_offset": offsets[b], "n_docs": counts.get(b, 0)}
                for b in range(num_buckets) if counts.get(b, 0)
            ],
            "metrics": {
                "build_sec": round(build_sec, 3),
                "analyze_sec": round(t_analyze, 3),
                "count_sec": round(t_count, 3),
                "segment_sec": round(build_sec - t_analyze - t_count, 3),
                "stats_sec": round(stats_sec, 3),
                "docs_per_sec": round(n_docs / build_sec, 1) if build_sec > 0 else None,
                "skipped_segments": int(sum(1 for s in summaries if s.get("skipped"))),
                "shuffle_payload": payload,
            },
        }
        os.makedirs(out_dir, exist_ok=True)  # may not exist yet for 0 segments
        tmp = index_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, index_json)  # atomic publish = the "commit"
        return manifest
    finally:
        # push-based sort is a BUILD-local choice: restore the caller's
        # strategy so later small groupbys in the same process don't pay
        # the push-based partitioning tax (measured: a 100k-row
        # hourly-bucket aggregate was 34s of task CPU under push-based
        # vs subsecond default). try/finally so a mid-build exception
        # can't leak the strategy into the rest of the process.
        _ctx.shuffle_strategy = _prev_shuffle
        _ctx.op_resource_reservation_enabled = _prev_reserve


def append_to_index(
    pages,
    index_dir: str,
    num_buckets: int | None = None,
) -> dict:
    """Incremental build: index new pages as ADDITIONAL segments appended
    after the existing doc_id space, refresh global stats, republish
    index.json (SURVEY.md §2.9: incremental index build = append new
    partitions + merge; the reference's add-then-commit visibility).

    New urls must be disjoint from already-indexed urls (the caller dedups —
    e.g. anti_join on url against the indexed set, or a crawl-frontier
    guarantee). Analyzer / text_source come from the existing manifest so
    the appended segments are scoring-compatible. Run stages.merge.
    merge_index afterwards to fold appended segments into the tiers.
    """
    index_json = os.path.join(index_dir, "index.json")
    with open(index_json) as f:
        manifest = json.load(f)
    analyzer = manifest["analyzer"]
    text_source = manifest.get("text_source", "html")
    stored_cols = tuple(manifest.get("stored_cols", ()))
    base = int(manifest["n_docs"])
    gen = int(manifest.get("append_gen", 0)) + 1
    nb = num_buckets or int(manifest["num_buckets"])
    prefix = f"app{gen}"

    get_analyzer(analyzer)
    if isinstance(pages, (str, list)):
        pages = ray.data.read_parquet(pages)

    _ctx = ray.data.DataContext.get_current()
    _prev_shuffle = _ctx.shuffle_strategy
    _prev_reserve = _ctx.op_resource_reservation_enabled
    _ctx.shuffle_strategy = (
        ray.data.context.ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    )
    # task-only pipeline: operator resource reservation (deadlock guard for
    # actor-pool stages) just idles CPUs here (~26/32 busy during analyze)
    _ctx.op_resource_reservation_enabled = False
    try:

        t0 = time.time()
        ds = pages
        if text_source == "html":
            ds = ds.map_batches(
                extract_batch, batch_format="pyarrow", zero_copy_batch=True,
            )
        az_name = analyzer
        store_positions = bool(manifest.get("store_positions"))
        enc_mode = True if store_positions else "tf"
        keep = ["url", "tokens", "tfs", *stored_cols]

        def _analyze_and_bucket(t: pa.Table) -> pa.Table:
            tune_worker_gc()
            t = analyze_batch(t, "text", az_name, dict_encode=enc_mode)
            t = t.select([c for c in keep if c in t.column_names])
            return add_bucket(t, "url", nb)

        tokenized = ds.map_batches(
            _analyze_and_bucket, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        def _count_existing(t: pa.Table) -> pa.Table:
            b = t["bucket"].to_numpy(zero_copy_only=False)
            binc = np.bincount(b, minlength=nb)
            nz = np.flatnonzero(binc)
            return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                             "cnt": pa.array(binc[nz].astype(np.int64))})

        counts: dict[int, int] = {}
        for row in tokenized.select_columns(["bucket"]).map_batches(
                _count_existing, batch_format="pyarrow").take_all():
            counts[int(row["bucket"])] = counts.get(int(row["bucket"]), 0) + int(row["cnt"])
        offsets: dict[int, int] = {}
        acc = base
        for b in range(nb):
            offsets[b] = acc
            acc += counts.get(b, 0)
        n_new = acc - base
        sc_tag = ",".join(stored_cols)
        lineages = {
            b: f"v1|{prefix}|az={analyzer}|nb={nb}|src={text_source}|sc={sc_tag}|cnt={counts.get(b, 0)}|off={offsets[b]}"
            for b in range(nb)
        }
        writer = _SegmentWriter(index_dir, offsets, lineages, stored_cols,
                                dir_prefix=prefix,
                                store_positions=store_positions)

        def write_segment_group(group: pa.Table, _w=writer) -> pa.Table:
            return _w(group)

        summaries = (
            tokenized.groupby("bucket")
            .map_groups(write_segment_group, batch_format="pyarrow")
            .take_all()
        )
        build_sec = time.time() - t0

        new_segments = [
            {"dir": f"segments/{prefix}={b:05d}", "bucket": b,
             "doc_id_offset": offsets[b], "n_docs": counts.get(b, 0)}
            for b in range(nb) if counts.get(b, 0)
        ]
        manifest["segments"] = manifest["segments"] + new_segments
        all_postings = [
            os.path.join(index_dir, s["dir"], "postings.parquet")
            for s in manifest["segments"]
        ]
        t1 = time.time()
        _write_global_stats(index_dir, all_postings)
        stats_sec = time.time() - t1

        n_tokens_new = int(sum(s["n_tokens"] for s in summaries))
        manifest["n_docs"] = base + n_new
        manifest["n_tokens"] = int(manifest["n_tokens"]) + n_tokens_new
        manifest["avgdl"] = (manifest["n_tokens"] / manifest["n_docs"]
                             if manifest["n_docs"] else 0.0)
        manifest["append_gen"] = gen
        manifest.setdefault("metrics", {})[f"append_{gen}"] = {
            "n_new_docs": n_new,
            "build_sec": round(build_sec, 3),
            "stats_sec": round(stats_sec, 3),
        }
        tmp = index_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, index_json)
        return manifest
    finally:
        # push-based sort is a BUILD-local choice: restore the caller's
        # strategy so later small groupbys in the same process don't pay
        # the push-based partitioning tax (measured: a 100k-row
        # hourly-bucket aggregate was 34s of task CPU under push-based
        # vs subsecond default). try/finally so a mid-build exception
        # can't leak the strategy into the rest of the process.
        _ctx.shuffle_strategy = _prev_shuffle
        _ctx.op_resource_reservation_enabled = _prev_reserve
