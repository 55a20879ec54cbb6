"""Single-process pure-Python reference oracle.

Plays the role of the reference's control instance in its
control-vs-distributed equivalence tests
(BaseDistributedSearchTestCase.java:98,179,292 — index the same docs into one
control core and a sharded cluster, assert identical responses): the oracle
indexes the corpus with plain dicts/numpy (no Ray), defines truth for
extracted text, token streams, doc_id assignment, df/avgdl and BM25 scores,
and pytest asserts the Ray pipeline is rank- AND score-identical at several
parallelism levels (SURVEY.md §5).

Shares the analysis / extraction / hashing / scoring CODE with the pipeline
(same modules), but none of the execution path: no Arrow batches, no codec,
no shuffle — a genuinely independent single-process evaluation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solr_ray.analysis.chain import get_analyzer
from solr_ray.search.bm25 import B, K1, idf as bm25_idf
from solr_ray.stages.docids import stable_hash64
from solr_ray.stages.extract import extract_text


class OracleIndex:
    def __init__(self, pages: pa.Table, analyzer: str = "text_en",
                 num_buckets: int = 16, text_source: str = "html"):
        az = get_analyzer(analyzer)
        urls = pages["url"].to_pylist()
        if text_source == "html":
            texts = [extract_text(h) for h in pages["html"].to_pylist()]
        else:
            texts = pages["text"].to_pylist()

        h = stable_hash64(np.array(urls, dtype=object))
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        order = np.lexsort((np.array(urls, dtype=object), bucket))
        self.urls = [urls[i] for i in order]
        self.analyzer = az

        tokens = [az.tokenize_text(texts[i]) for i in order]
        self.dl = np.array([len(t) for t in tokens], dtype=np.int64)
        self.n_docs = len(self.urls)
        self.avgdl = float(self.dl.sum() / self.n_docs) if self.n_docs else 0.0

        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, toks in enumerate(tokens):
            seen: dict[str, int] = {}
            for t in toks:
                seen[t] = seen.get(t, 0) + 1
            for t, tf in seen.items():
                self.postings.setdefault(t, {})[doc_id] = tf
        self.df = {t: len(p) for t, p in self.postings.items()}

    def search(self, text: str, k: int = 10):
        """(doc_ids, scores, urls) — ties by ascending doc_id."""
        terms = sorted(set(self.analyzer.tokenize_text(text)))
        terms = [t for t in terms if t in self.postings]
        acc = np.zeros(self.n_docs, dtype=np.float64)
        for t in terms:
            p = self.postings[t]
            ids = np.fromiter(p.keys(), dtype=np.int64, count=len(p))
            tfs = np.fromiter(p.values(), dtype=np.float64, count=len(p))
            ids.sort(kind="stable")
            tfs = np.array([p[i] for i in ids], dtype=np.float64)
            term_idf = float(bm25_idf(self.df[t], self.n_docs))
            d = self.dl[ids].astype(np.float64)
            acc[ids] += term_idf * (tfs / (tfs + K1 * (1.0 - B + B * d / self.avgdl)))
        cand = np.flatnonzero(acc > 0.0)
        order = np.lexsort((cand, -acc[cand]))[:k]
        ids = cand[order]
        return ids, acc[ids], [self.urls[i] for i in ids]

    def results_table(self, queries: pa.Table, k: int = 10) -> pa.Table:
        rows = {"qid": [], "rank": [], "doc_id": [], "url": [], "score": []}
        for qid, text in zip(queries["qid"].to_pylist(), queries["text"].to_pylist()):
            ids, sc, urls = self.search(text, k)
            for r, (d, s, u) in enumerate(zip(ids.tolist(), sc.tolist(), urls), 1):
                rows["qid"].append(qid)
                rows["rank"].append(r)
                rows["doc_id"].append(d)
                rows["url"].append(u)
                rows["score"].append(s)
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "rank": pa.array(rows["rank"], pa.int32()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "url": pa.array(rows["url"], pa.string()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )
