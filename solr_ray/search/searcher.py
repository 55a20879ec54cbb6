"""Index reading + BM25 top-k query serving as a Ray Data batch stage.

The stateful-searcher equivalent of SolrIndexSearcher (reference
solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:153,709):
an actor loads the (compressed) segments once in ``__init__`` and serves
batches of queries in ``__call__``. Distributed layout mirrors §3.2's
scatter/gather: segments are sharded across an actor pool, every query runs
against every shard, and per-shard top-k results merge with
``groupby(qid) -> heap merge`` (the mergeIds equivalent,
QueryComponent.java:879-915). Scores use GLOBAL (df, N, avgdl)
(ExactStatsCache semantics) so per-shard scores are directly comparable and
the merged ranking is partition-count-invariant.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from solr_ray.analysis.chain import get_analyzer
from solr_ray.search.bm25 import idf as bm25_idf
from solr_ray.search.bm25 import tf_norm
from solr_ray.search.wand import PostingCursor, bmt_topk, bmw_topk, taat_topk
from solr_ray.stages.codec import varint_decode, delta_decode


_HEAVY_COLS = [
    "doc_ids_delta_varint", "tfs_varint", "block_last_doc", "block_max_tf",
    "block_min_dl", "block_off_docs", "block_off_tfs",
]


def _segment_phrase_match(seg, toks: list[str], slop: int = 0):
    """(doc_ids, phrase_tfs) of docs in `seg` containing the ordered phrase
    `toks` (slop=0: consecutive; slop>0: ordered minimal chains with extra
    displacement <= slop)."""
    per_term = []
    for t in toks:
        p = seg.term_positions(t)
        if p is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        per_term.append(p)
    if slop == 0:
        # fully vectorized: encode every (doc, pos) occurrence of term i as
        # doc*M + pos; an exact phrase start k survives iff k+i is present
        # in term i's key set for all i. No per-doc python loop.
        mult = np.int64(int(seg.dl.max(initial=0)) + len(toks) + 2)
        keys = []
        for ids, tfs, pos in per_term:
            did_flat = np.repeat(ids, tfs)
            keys.append(did_flat * mult + pos.astype(np.int64))
        live = keys[0]
        for i, k in enumerate(keys[1:], 1):
            if live.size == 0:
                break
            live = live[np.isin(live + i, k)]
        if live.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        docs = live // mult
        uniq, counts = np.unique(docs, return_counts=True)
        return uniq.astype(np.int64), counts.astype(np.int64)
    # slop>0, fully vectorized across ALL docs at once: encode every
    # (doc, pos) occurrence as doc*M + pos (keys ascend by (doc, pos) since
    # posting doc_ids ascend and positions ascend within a doc). The ordered
    # minimal chain "p_i = smallest position of term i strictly after
    # p_{i-1}" is then ONE searchsorted per term over the flat key arrays —
    # the global successor is in the same doc or the start dies.
    mult = np.int64(int(seg.dl.max(initial=0)) + len(toks) + 2)
    keys = []
    for ids, tfs, pos in per_term:
        did_flat = np.repeat(ids, tfs)
        keys.append(did_flat * mult + pos.astype(np.int64))
    start = keys[0]
    cur = start
    for k in keys[1:]:
        if start.size == 0:
            break
        j = np.searchsorted(k, cur, side="right")
        ok = j < k.size
        nxt = k[np.minimum(j, k.size - 1)]
        ok &= (nxt // mult) == (cur // mult)
        start, cur = start[ok], nxt[ok]
    if start.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # same doc => key difference == position difference
    span_extra = (cur - start) - np.int64(len(toks) - 1)
    good = span_extra <= slop
    if not good.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = start[good] // mult
    uniq, counts = np.unique(docs, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int64)


class SegmentIndex:
    """One immutable segment.

    eager (default): the whole postings table is held varint-compressed in
    memory (≈2 B/posting) — the low-latency serving mode.

    lazy=True: only the (term, df) dictionary is resident; posting payloads
    are fetched per-term by parquet ROW-GROUP (postings are term-sorted and
    written with 8192-row groups), with a small LRU of decoded row groups.
    This is the 100 TB path — per-actor memory stays O(vocab + touched row
    groups) instead of O(segment postings).
    """

    def __init__(self, seg_dir: str, lazy: bool = False,
                 rg_cache_size: int = 64):
        ppath = os.path.join(seg_dir, "postings.parquet")
        self.seg_dir = seg_dir
        self.lazy = lazy
        if lazy:
            self._pf = pq.ParquetFile(ppath)
            names = self._pf.schema_arrow.names
            self.has_positions = "positions" in names
            self.has_payloads = "payloads" in names
            self._heavy = _HEAVY_COLS + (
                ["positions"] if self.has_positions else []) + (
                ["payloads"] if self.has_payloads else [])
            light = self._pf.read(columns=["term", "df"])
            self.terms = light["term"].to_pylist()
            self.df = light["df"].to_numpy(zero_copy_only=False)
            md = self._pf.metadata
            bounds = np.cumsum(
                [md.row_group(i).num_rows for i in range(md.num_row_groups)]
            )
            self._rg_bounds = bounds  # exclusive upper row bound per group
            self._rg_cache: dict[int, pa.Table] = {}
            self._rg_cache_size = rg_cache_size
        else:
            t = pq.read_table(ppath)
            self.has_positions = "positions" in t.column_names
            self.has_payloads = "payloads" in t.column_names
            self._heavy = _HEAVY_COLS + (
                ["positions"] if self.has_positions else []) + (
                ["payloads"] if self.has_payloads else [])
            self.terms = t["term"].to_pylist()
            self.df = t["df"].to_numpy(zero_copy_only=False)
            self._cols = {c: t[c] for c in self._heavy}
        self.lookup = {term: i for i, term in enumerate(self.terms)}
        d = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        self.doc_ids = d["doc_id"].to_numpy(zero_copy_only=False)
        self.doc_base = int(self.doc_ids[0]) if len(self.doc_ids) else 0
        self.urls = d["url"]
        self.dl = d["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        # decoded-posting LRU: query terms are zipfian, so hot terms'
        # (ids, tfs) decode once and serve thousands of queries. Budgeted by
        # posting count (16 B/posting decoded): 4M postings ≈ 64 MB/segment.
        self._dec_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._dec_budget = 4_000_000
        self._dec_used = 0

    def _row(self, i: int) -> dict:
        """Heavy posting columns for term-row i (row-group fetch when lazy)."""
        if not self.lazy:
            return {c: self._cols[c][i] for c in self._heavy}
        rg = int(np.searchsorted(self._rg_bounds, i, side="right"))
        tbl = self._rg_cache.get(rg)
        if tbl is None:
            tbl = self._pf.read_row_group(rg, columns=self._heavy)
            if len(self._rg_cache) >= self._rg_cache_size:
                self._rg_cache.pop(next(iter(self._rg_cache)))
            self._rg_cache[rg] = tbl
        start = 0 if rg == 0 else int(self._rg_bounds[rg - 1])
        local = i - start
        return {c: tbl[c][local] for c in self._heavy}

    def full_posting(self, term: str):
        i = self.lookup.get(term)
        if i is None:
            return None
        hit = self._dec_cache.get(term)
        if hit is not None:
            self._dec_cache[term] = self._dec_cache.pop(term)  # LRU touch
            return hit
        row = self._row(i)
        ids = delta_decode(
            varint_decode(row["doc_ids_delta_varint"].as_py(), int(self.df[i]))
        )
        tfs = varint_decode(
            row["tfs_varint"].as_py(), int(self.df[i])
        ).astype(np.int64)
        n = ids.size
        if n <= self._dec_budget:
            while self._dec_used + n > self._dec_budget and self._dec_cache:
                old_ids, _t = self._dec_cache.pop(next(iter(self._dec_cache)))
                self._dec_used -= old_ids.size
            self._dec_cache[term] = (ids, tfs)
            self._dec_used += n
        return ids, tfs

    def cursor(self, term: str, term_idf: float, avgdl: float, ord: int = 0):
        i = self.lookup.get(term)
        if i is None:
            return None
        row = self._row(i)
        bmax = np.asarray(row["block_max_tf"].as_py(), dtype=np.float64)
        bmin = np.asarray(row["block_min_dl"].as_py(), dtype=np.float64)
        ub = term_idf * tf_norm(bmax, bmin, avgdl)
        return PostingCursor(
            row["doc_ids_delta_varint"].as_py(), row["tfs_varint"].as_py(),
            row["block_last_doc"].as_py(), row["block_off_docs"].as_py(),
            row["block_off_tfs"].as_py(), int(self.df[i]), term_idf, ub, ord,
        )

    def term_positions(self, term: str):
        """(doc_ids, tfs, flat_positions int32) — flat positions slice per
        doc by cumsum(tfs). Requires store_positions=True at build."""
        i = self.lookup.get(term)
        if i is None:
            return None
        if not self.has_positions:
            raise ValueError(
                "index was built without store_positions=True; "
                "phrase queries need positions")
        row = self._row(i)
        ids = delta_decode(
            varint_decode(row["doc_ids_delta_varint"].as_py(), int(self.df[i]))
        )
        tfs = varint_decode(
            row["tfs_varint"].as_py(), int(self.df[i])
        ).astype(np.int64)
        pos = np.asarray(row["positions"].values, dtype=np.int32)
        return ids, tfs, pos

    def term_payloads(self, term: str):
        """(doc_ids, tfs, flat_positions, flat_payloads float32) — the
        payload stream parallels positions occurrence-for-occurrence.
        Requires a payload_delimiter build."""
        got = self.term_positions(term)
        if got is None:
            return None
        if not getattr(self, "has_payloads", False):
            raise ValueError(
                "index was built without payload_delimiter; "
                "payload queries need stored payloads")
        ids, tfs, pos = got
        i = self.lookup[term]
        payl = np.asarray(self._row(i)["payloads"].values, dtype=np.float32)
        return ids, tfs, pos, payl

    def url_of(self, doc_id: int) -> str:
        return self.urls[int(doc_id) - self.doc_base].as_py()

    def stored_column(self, name: str) -> np.ndarray:
        """Stored-field column aligned to local doc order (cached)."""
        cache = getattr(self, "_stored_cache", None)
        if cache is None:
            cache = self._stored_cache = {}
        if name not in cache:
            d = pq.read_table(os.path.join(self.seg_dir, "docs.parquet"),
                              columns=[name])
            cache[name] = d[name].to_numpy(zero_copy_only=False)
        return cache[name]


class IndexReader:
    """Whole-index (or segment-subset) reader with global stats."""

    def __init__(self, index_dir: str, segment_ids: list[int] | None = None,
                 lazy: bool = False):
        """segment_ids selects a subset of segments by MANIFEST LIST INDEX
        (position in index.json's "segments" array) — the only id that is
        globally unique; 'bucket' values repeat after append_to_index /
        merge_index, which made bucket-based sharding double-load segments."""
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "index.json")) as f:
            self.manifest = json.load(f)
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"])
        self.k1 = float(self.manifest.get("k1", 1.2))
        self.b = float(self.manifest.get("b", 0.75))
        self.analyzer = get_analyzer(self.manifest["analyzer"])
        segs = self.manifest["segments"]
        if segment_ids is not None:
            wanted = set(segment_ids)
            segs = [s for i, s in enumerate(segs) if i in wanted]
        self.segments = [
            SegmentIndex(os.path.join(index_dir, s["dir"]), lazy=lazy)
            for s in segs
        ]
        # delete tombstones (state/tombstones.py): logical deletes applied
        # at search time, like Lucene live-docs
        from solr_ray.state.tombstones import read_tombstones

        self.tombstones = read_tombstones(index_dir)
        # timeAllowed flag (updated ONLY by search(); other query paths
        # don't take a budget and leave it untouched)
        self.partial_results = False
        # global df: exact-stats table (term -> df across ALL segments)
        self.global_df: dict[str, int] = {}
        stats_dir = os.path.join(index_dir, "stats")
        if os.path.isdir(stats_dir):
            st = pq.read_table(stats_dir, columns=["term", "df"])
            self.global_df = dict(
                zip(st["term"].to_pylist(), st["df"].to_numpy(zero_copy_only=False))
            )

    def query_terms(self, text: str) -> list[str]:
        """Analyzed, deduped, lexicographically sorted query terms — the
        deterministic accumulation order shared with the oracle."""
        return sorted(set(self.analyzer.tokenize_text(text)))

    def search(self, text: str, k: int = 10, mode: str = "taat",
               time_allowed_ms: float | None = None):
        """One query across this reader's segments -> (doc_ids, scores).

        time_allowed_ms mirrors Solr's timeAllowed partial-results contract
        (SolrIndexSearcher + ExitableDirectoryReader semantics): the budget
        is checked between SEGMENTS; once exceeded, remaining segments are
        skipped and the (exact-so-far) partial top-k is returned.
        `self.partial_results` reports whether the last search timed out."""
        import time as _time

        deadline = (_time.monotonic() + time_allowed_ms / 1e3
                    if time_allowed_ms is not None else None)
        self.partial_results = False
        terms = [t for t in self.query_terms(text) if self.global_df.get(t)]
        if not terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        idfs = {
            t: float(bm25_idf(self.global_df[t], self.n_docs)) for t in terms
        }
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        tomb = self.tombstones
        for seg in self.segments:
            if deadline is not None and _time.monotonic() > deadline:
                self.partial_results = True
                break
            # deleted docs may occupy top slots: ask each segment for
            # k + (its tombstone count) and filter — exact top-k of live docs
            n_dead = 0
            if tomb.size:
                lo, hi = seg.doc_base, seg.doc_base + seg.dl.size
                n_dead = int(np.searchsorted(tomb, hi)
                             - np.searchsorted(tomb, lo))
            k_seg = k + n_dead
            if mode in ("bmw", "bmt"):
                cursors = [
                    c for ordi, t in enumerate(terms)
                    if (c := seg.cursor(t, idfs[t], self.avgdl, ordi)) is not None
                ]
                if not cursors:
                    continue
                fn = bmw_topk if mode == "bmw" else bmt_topk
                ids, sc = fn(cursors, seg.dl, seg.doc_base, self.avgdl,
                             k_seg, self.k1, self.b)
            else:
                postings = []
                for t in terms:
                    p = seg.full_posting(t)
                    if p is not None:
                        postings.append((p[0], p[1], idfs[t]))
                if not postings:
                    continue
                ids, sc = taat_topk(postings, seg.dl, seg.doc_base,
                                    self.avgdl, k_seg, self.k1, self.b)
            if n_dead and ids.size:
                live = ~np.isin(ids, tomb)
                ids, sc = ids[live], sc[live]
            all_ids.append(ids)
            all_scores.append(sc)
        if not all_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(all_ids)
        sc = np.concatenate(all_scores)
        order = np.lexsort((ids, -sc))[:k]
        return ids[order], sc[order]

    def url_of(self, doc_id: int) -> str:
        for seg in self.segments:
            if seg.doc_base <= doc_id < seg.doc_base + seg.dl.size:
                return seg.url_of(doc_id)
        raise KeyError(doc_id)

    def phrase_search(self, text: str, k: int = 10, slop: int = 0):
        """Phrase top-k over the analyzed token stream (stop-filtered, like
        a Lucene PhraseQuery after the analysis chain). slop=0: terms at
        CONSECUTIVE positions. slop>0: ordered in-document chains whose
        total extra displacement (span - (n-1)) is <= slop. Scoring is
        BM25 with tf = phrase frequency and idf = sum of the constituent
        terms' idfs (PhraseQuery semantics). Requires an index built with
        store_positions=True."""
        toks = self.analyzer.tokenize_text(text)  # ORDER preserved
        toks = [t for t in toks if self.global_df.get(t)]
        if not toks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if len(toks) == 1:
            return self.search(toks[0], k)
        phrase_idf = float(sum(
            bm25_idf(self.global_df[t], self.n_docs) for t in toks))
        tomb = self.tombstones
        all_ids, all_scores = [], []
        for seg in self.segments:
            ids_np, tfs_np = _segment_phrase_match(seg, toks, slop)
            if ids_np.size == 0:
                continue
            tfs_np = tfs_np.astype(np.float64)
            if tomb.size:
                livem = ~np.isin(ids_np, tomb)
                ids_np, tfs_np = ids_np[livem], tfs_np[livem]
            d = self.dl_of(seg, ids_np)
            sc = phrase_idf * (tfs_np / (
                tfs_np + self.k1 * (1.0 - self.b
                                    + self.b * d / self.avgdl)))
            all_ids.append(ids_np)
            all_scores.append(sc)
        if not all_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(all_ids)
        sc = np.concatenate(all_scores)
        order = np.lexsort((ids, -sc))[:k]
        return ids[order], sc[order]

    @staticmethod
    def dl_of(seg, ids: np.ndarray) -> np.ndarray:
        return seg.dl[ids - seg.doc_base].astype(np.float64)

    def matching_doc_ids(self, text: str) -> np.ndarray:
        """ALL live docs matching any query term (the full result set a
        facet counts over — Solr facets count matches, not just top-k)."""
        terms = [t for t in self.query_terms(text) if self.global_df.get(t)]
        if not terms:
            return np.empty(0, np.int64)
        parts = []
        for seg in self.segments:
            seg_parts = [p[0] for t in terms
                         if (p := seg.full_posting(t)) is not None]
            if seg_parts:
                parts.append(np.unique(np.concatenate(seg_parts)))
        if not parts:
            return np.empty(0, np.int64)
        ids = np.concatenate(parts)  # segments are disjoint id ranges
        if self.tombstones.size:
            ids = ids[~np.isin(ids, self.tombstones)]
        return ids

    def facet_search(self, text: str, field: str, limit: int = 10,
                     mincount: int = 1):
        """Term facet over the query's FULL match set using a stored field
        (FacetComponent on a query; SURVEY §2.5). Returns
        [(value, count)] ordered count desc then value asc."""
        from collections import Counter

        counts: Counter = Counter()
        tomb = self.tombstones
        terms = [t for t in self.query_terms(text) if self.global_df.get(t)]
        for seg in self.segments:
            seg_parts = [p[0] for t in terms
                         if (p := seg.full_posting(t)) is not None]
            if not seg_parts:
                continue
            ids = np.unique(np.concatenate(seg_parts))
            if tomb.size:
                ids = ids[~np.isin(ids, tomb)]
            vals = seg.stored_column(field)[ids - seg.doc_base]
            for v, c in zip(*np.unique(vals, return_counts=True)):
                counts[v] += int(c)
        out = [(v, c) for v, c in counts.items() if c >= mincount]
        out.sort(key=lambda vc: (-vc[1], vc[0]))
        return out[:limit]

    # ---- index-backed value sources (ValueSourceParser parity:
    # docfreq/idf/termfreq/totaltermfreq/sumtotaltermfreq/maxdoc/numdocs;
    # the per-doc ones return dense arrays aligned to global docIDs) ----

    def docfreq(self, term: str) -> int:
        """docfreq(term): exact global document frequency."""
        return int(self.global_df.get(term, 0))

    def idf_value(self, term: str) -> float:
        """idf(term): the collection Similarity's idf (BM25 — the default
        Similarity) over the exact global stats."""
        df = self.global_df.get(term, 0)
        return float(bm25_idf(df, self.n_docs)) if df else 0.0

    def maxdoc(self) -> int:
        return self.n_docs

    def numdocs(self) -> int:
        """numdocs(): live documents (maxdoc minus tombstoned deletes)."""
        return self.n_docs - int(self.tombstones.size)

    def termfreq(self, term: str) -> np.ndarray:
        """termfreq(term): dense per-doc tf array indexed by global docID
        (0 where the term is absent or the doc is deleted)."""
        out = np.zeros(self.n_docs, dtype=np.int64)
        for seg in self.segments:
            p = seg.full_posting(term)
            if p is not None:
                out[p[0]] = p[1]
        if self.tombstones.size:
            out[self.tombstones] = 0
        return out

    def totaltermfreq(self, term: str) -> int:
        """totaltermfreq(term): collection-wide occurrence count (cf)."""
        return int(sum(
            p[1].sum() for seg in self.segments
            if (p := seg.full_posting(term)) is not None))

    def sumtotaltermfreq(self) -> int:
        """sumtotaltermfreq(): total tokens in the collection (Σ dl)."""
        return int(self.manifest["n_tokens"])


def fetch_stored(index_dir: str, doc_ids, cols: list[str] | None = None):
    """GET_FIELDS phase (SURVEY §3.2 step GET_FIELDS / SolrDocumentFetcher):
    materialize stored fields for winning doc ids only. Reads just the
    segments whose doc_id ranges intersect the requested ids, columns
    pruned. Returns pa.Table(doc_id, url[, stored cols...])."""
    with open(os.path.join(index_dir, "index.json")) as f:
        manifest = json.load(f)
    want = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    out = []
    for s in manifest["segments"]:
        lo = int(s["doc_id_offset"])
        hi = lo + int(s["n_docs"])
        sel = want[(want >= lo) & (want < hi)]
        if sel.size == 0:
            continue
        d = pq.read_table(os.path.join(index_dir, s["dir"], "docs.parquet"),
                          columns=None if cols is None
                          else ["doc_id", "url", *cols])
        ids = d["doc_id"].to_numpy(zero_copy_only=False)
        rows = np.searchsorted(ids, sel)  # doc_ids are sorted within segment
        out.append(d.take(pa.array(rows)))
    if not out:
        schema = pa.schema([("doc_id", pa.int64()), ("url", pa.string())])
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "url": pa.array([], pa.string())}).cast(schema)
    return pa.concat_tables(out)


RESULT_SCHEMA = pa.schema(
    [
        ("qid", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("score", pa.float64()),
    ]
)


class SearchActor:
    """map_batches callable: batch of queries(qid, text) -> top-k result rows.

    Index loading happens once per actor (__init__), per-batch work is pure
    scoring — the actor-pool pattern for stateful stages.
    """

    def __init__(self, index_dir: str, k: int = 10, mode: str = "taat",
                 segment_ids: list[int] | None = None, lazy: bool = False):
        from solr_ray.stages.worker_gc import tune_worker_gc

        tune_worker_gc()
        self.reader = IndexReader(index_dir, segment_ids, lazy=lazy)
        self.k = k
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, urls, scores = [], [], [], [], []
        for qid, text in zip(batch["qid"].to_pylist(), batch["text"].to_pylist()):
            ids, sc = self.reader.search(text, self.k, self.mode)
            for r, (d, s) in enumerate(zip(ids.tolist(), sc.tolist()), 1):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                urls.append(self.reader.url_of(d))
                scores.append(s)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def search_dataset(
    queries_ds,
    index_dir: str,
    k: int = 10,
    mode: str = "taat",
    concurrency: int | None = None,
    num_shards: int = 1,
    batch_size: int = 64,
    lazy: bool = False,
):
    """Queries Dataset -> results Dataset (qid, rank, doc_id, url, score).

    num_shards=1: every actor holds the whole index (query-parallel).
    num_shards>1: segments are sharded across num_shards actor groups; each
    group scores every query over its shard; a groupby(qid) merge re-ranks —
    the distributed scatter/gather of §3.2. Results are identical because
    scores use global stats.
    """
    concurrency = concurrency or 4
    # a query set built with from_arrow/from_items arrives as ONE block,
    # which would pin every batch to a single actor — spread it first.
    # materialize() so the repartition finishes BEFORE the actor pool
    # reserves CPUs (an actor pool sized near num_cpus would starve the
    # upstream repartition tasks and deadlock the pipeline).
    queries_ds = queries_ds.repartition(
        target_num_rows_per_block=batch_size).materialize()
    if num_shards <= 1:
        return queries_ds.map_batches(
            SearchActor, fn_constructor_args=(index_dir, k, mode, None, lazy),
            batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size,
        )

    with open(os.path.join(index_dir, "index.json")) as f:
        manifest = json.load(f)
    # shard on manifest list index — globally unique even after
    # append_to_index / merge_index reuse bucket numbers
    seg_idx = list(range(len(manifest["segments"])))
    shards = [seg_idx[i::num_shards] for i in range(num_shards)]
    shards = [s for s in shards if s]
    parts = [
        queries_ds.map_batches(
            SearchActor, fn_constructor_args=(index_dir, k, mode, shard, lazy),
            batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size,
        )
        for shard in shards
    ]
    union = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def merge_topk(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sc = g["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:k]
        out = g.take(order)
        return out.set_column(
            out.schema.get_field_index("rank"),
            "rank",
            pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
        )

    return union.groupby("qid").map_groups(merge_topk, batch_format="pyarrow")
