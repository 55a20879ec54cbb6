"""edismax/dismax core: multi-field disjunction-max scoring with
minimum-should-match, phrase boost and tie-breaker.

Reference semantics: ExtendedDismaxQParser
(solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java:67) —
the user query is split into clauses; each clause becomes a
DisjunctionMaxQuery over the qf fields (per-clause score =
max over fields + tie * sum-of-others); clause scores sum; mm
(minimum-should-match) sets how many clauses must match
(SolrPluginUtils.setMinShouldMatch); pf adds a phrase query over the full
clause sequence as an optional boost (DisMaxQParser.addShouldPhrases).

Ray-native layout: ONE single-field index per qf field (build_index over
the same url set with the same num_buckets), so internal docIDs align
across fields — the per-field inverted-index view Lucene keeps inside one
segment. Scoring unions the per-field candidate sets and combines with
vectorized numpy; op order mirrors the SQL oracle exactly
(boost * (idf * (tf / denom))), accumulation in clause order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solr_ray.search.bm25 import idf as bm25_idf
from solr_ray.search.searcher import IndexReader, _segment_phrase_match


def parse_mm(mm, n_clauses: int) -> int:
    """Solr minimum-should-match core forms: int ("2"), negative int
    ("-1" = all but one), percentage ("75%" floor, "-25%" = all but 25%).
    Returns the required clause-match count (0 = optional / any)."""
    if mm in (None, 0, "0", ""):
        return 0
    if isinstance(mm, str):
        mm = mm.strip()
        if mm.endswith("%"):
            pct = float(mm[:-1])
            if pct < 0:
                return n_clauses - int(abs(pct) / 100.0 * n_clauses)
            return int(pct / 100.0 * n_clauses)
        mm = int(mm)
    if mm < 0:
        return max(0, n_clauses + mm)
    return min(mm, n_clauses)


class EdismaxIndex:
    """Multi-field dismax searcher over per-field indexes (aligned docIDs)."""

    def __init__(self, index_dirs: dict[str, str], lazy: bool = False):
        self.readers = {
            f: IndexReader(d, lazy=lazy) for f, d in index_dirs.items()
        }
        sizes = {f: r.n_docs for f, r in self.readers.items()}
        if len(set(sizes.values())) != 1:
            raise ValueError(f"per-field doc spaces differ: {sizes}")
        self.n_docs = next(iter(sizes.values()))

    def _term_scores(self, field: str, term: str):
        """(doc_ids, bm25 scores) of one term over one field's segments,
        or None if the term is absent from the field."""
        r = self.readers[field]
        df = r.global_df.get(term)
        if not df:
            return None
        t_idf = float(bm25_idf(df, r.n_docs))
        ids_all, sc_all = [], []
        for seg in r.segments:
            p = seg.full_posting(term)
            if p is None:
                continue
            ids, tfs = p
            d = r.dl_of(seg, ids)
            sc = t_idf * (tfs / (tfs + r.k1 * (1.0 - r.b + r.b * d / r.avgdl)))
            ids_all.append(ids)
            sc_all.append(sc)
        if not ids_all:
            return None
        return np.concatenate(ids_all), np.concatenate(sc_all)

    def search(self, q: str, qf: dict[str, float], k: int = 10,
               mm: int | str = 0, pf: dict[str, float] | None = None,
               tie: float = 0.0):
        """Top-k (doc_ids, scores) for user query `q`.

        Clause model (core subset of edismax): whitespace-split clauses,
        each analyzed by the target field's analyzer (first emitted token;
        stopword-killed clauses drop out of the clause count, like analyzed
        SHOULD clauses that produce no query).
        """
        fields = sorted(qf)
        raw_clauses = q.split()
        # per-field analyzed form of each clause; a clause survives if ANY
        # field's analyzer emits a token for it
        per_field_terms: list[dict[str, str]] = []
        for cl in raw_clauses:
            fterms = {}
            for f in fields:
                toks = self.readers[f].analyzer.tokenize_text(cl)
                if toks:
                    fterms[f] = toks[0]
            if fterms:
                per_field_terms.append(fterms)
        n_clauses = len(per_field_terms)
        if n_clauses == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)

        # gather postings once; build the union candidate id space
        postings: list[dict[str, tuple[np.ndarray, np.ndarray]]] = []
        parts = []
        for fterms in per_field_terms:
            got = {}
            for f, t in fterms.items():
                res = self._term_scores(f, t)
                if res is not None:
                    got[f] = res
                    parts.append(res[0])
            postings.append(got)
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.unique(np.concatenate(parts))

        total = np.zeros(cand.size, dtype=np.float64)
        nmatch = np.zeros(cand.size, dtype=np.int64)
        for got in postings:
            S = np.zeros((len(fields), cand.size), dtype=np.float64)
            # mm counts a clause as matched from POSTING PRESENCE, not the
            # boosted score sign — a clause matching only in a qf-boost-0.0
            # field still satisfies minimum-should-match (DisMax semantics)
            matched = np.zeros(cand.size, dtype=bool)
            for fi, f in enumerate(fields):
                if f not in got:
                    continue
                ids, sc = got[f]
                pos = np.searchsorted(cand, ids)
                S[fi, pos] = qf[f] * sc
                matched[pos] = True
            smax = S.max(axis=0)
            ssum = S.sum(axis=0)
            total += smax + tie * (ssum - smax)
            nmatch += matched

        if pf:
            for f in sorted(pf):
                r = self.readers[f]
                toks = [t for t in r.analyzer.tokenize_text(q)
                        if r.global_df.get(t)]
                if len(toks) < 2:
                    continue
                phrase_idf = float(sum(
                    bm25_idf(r.global_df[t], r.n_docs) for t in toks))
                for seg in r.segments:
                    ids_np, tfs_np = _segment_phrase_match(seg, toks, 0)
                    if ids_np.size == 0:
                        continue
                    d = r.dl_of(seg, ids_np)
                    tf = tfs_np.astype(np.float64)
                    sc = phrase_idf * (tf / (
                        tf + r.k1 * (1.0 - r.b + r.b * d / r.avgdl)))
                    pos = np.searchsorted(cand, ids_np)
                    ok = (pos < cand.size) & (cand[np.minimum(
                        pos, cand.size - 1)] == ids_np)
                    total[pos[ok]] += pf[f] * sc[ok]

        need = parse_mm(mm, n_clauses)
        keep = np.flatnonzero(nmatch >= max(need, 1))
        ids, sc = cand[keep], total[keep]
        order = np.lexsort((ids, -sc))[:k]
        return ids[order], sc[order]


class EdismaxActor:
    """map_batches callable: batch of (qid, text) -> top-k result rows.
    Per-field indexes load once per actor (__init__)."""

    def __init__(self, index_dirs: dict[str, str], qf: dict[str, float],
                 k: int = 10, mm: int | str = 0,
                 pf: dict[str, float] | None = None, tie: float = 0.0,
                 lazy: bool = False):
        from solr_ray.stages.worker_gc import tune_worker_gc

        tune_worker_gc()
        self.index = EdismaxIndex(index_dirs, lazy=lazy)
        self.any_reader = next(iter(self.index.readers.values()))
        self.qf, self.k, self.mm, self.pf, self.tie = qf, k, mm, pf, tie

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, urls, scores = [], [], [], [], []
        for qid, text in zip(batch["qid"].to_pylist(),
                             batch["text"].to_pylist()):
            ids, sc = self.index.search(text, self.qf, self.k, self.mm,
                                        self.pf, self.tie)
            for r, (d, s) in enumerate(zip(ids.tolist(), sc.tolist()), 1):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                urls.append(self.any_reader.url_of(d))
                scores.append(s)
        return pa.table({
            "qid": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "score": pa.array(scores, pa.float64()),
        })


def edismax_search(queries_ds, index_dirs: dict[str, str],
                   qf: dict[str, float], k: int = 10, mm: int | str = 0,
                   pf: dict[str, float] | None = None, tie: float = 0.0,
                   concurrency: int | None = None, batch_size: int = 64,
                   lazy: bool = False):
    """Queries Dataset -> results Dataset (qid, rank, doc_id, url, score)."""
    concurrency = concurrency or 4
    queries_ds = queries_ds.repartition(
        target_num_rows_per_block=batch_size).materialize()
    return queries_ds.map_batches(
        EdismaxActor,
        fn_constructor_args=(index_dirs, qf, k, mm, pf, tie, lazy),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size,
    )
