"""Snippet highlighting + more-like-this.

Reference components:
- HighlightComponent / unified highlighter (solr/core/src/java/org/apache/
  solr/handler/component/HighlightComponent.java; highlight/ package):
  pick the best passage(s) containing query terms, wrap matches in
  <em>..</em>. Here: a vectorized batch stage — for each (doc text, query)
  choose the fixed-width window with the most distinct analyzed query-term
  hits (ties -> earliest), then tag whole-token matches inside it.
- MoreLikeThisHandler (solr/core/src/java/org/apache/solr/handler/
  MoreLikeThisHandler.java): select the source doc's top "interesting terms"
  by TF-IDF against the index, build a disjunction query from them, search.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solr_ray.analysis.chain import process_analyzer
from solr_ray.search.bm25 import idf as bm25_idf


def best_snippet(text: str, query_terms: set[str], analyzer,
                 window: int = 30) -> str:
    """Best window of `window` tokens by distinct query-term hits; matched
    source tokens wrapped in <em>. Empty string when nothing matches."""
    if not text:
        return ""
    raw = text.split()
    # analyze each whitespace word the way the chain would (first token of
    # the word's analysis output represents the word for matching purposes)
    norm = []
    for w in raw:
        toks = analyzer.tokenize_text(w)
        norm.append(toks[0] if toks else None)
    hits = np.array([n in query_terms if n else False for n in norm])
    if not hits.any():
        return ""
    if len(raw) <= window:
        lo = 0
    else:
        # distinct-term count per window via sliding evaluation on hit
        # positions only (sparse)
        best_lo, best_score = 0, -1
        hit_pos = np.flatnonzero(hits)
        for p in hit_pos:
            lo = max(0, min(int(p), len(raw) - window))
            seen = {norm[i] for i in range(lo, lo + window) if hits[i]}
            if len(seen) > best_score:
                best_lo, best_score = lo, len(seen)
        lo = best_lo
    out = []
    for i in range(lo, min(len(raw), lo + window)):
        out.append(f"<em>{raw[i]}</em>" if hits[i] else raw[i])
    return " ".join(out)


def highlight_batch(batch: pa.Table, query: str, text_col: str = "text",
                    analyzer: str = "text_en", window: int = 30,
                    out_col: str = "snippet") -> pa.Table:
    az = process_analyzer(analyzer)
    qterms = set(az.tokenize_text(query))
    snips = [best_snippet(t, qterms, az, window)
             for t in batch[text_col].to_pylist()]
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(snips, pa.string()))


def highlight_results(results_ds, docs_lookup, query: str,
                      analyzer: str = "text_en", window: int = 30):
    """Attach snippets to a (doc_id, ...) results Dataset. docs_lookup:
    pandas DataFrame (doc_id, text) — broadcast once (results are top-k,
    the lookup ships small)."""
    import ray

    ref = ray.put(docs_lookup.set_index("doc_id")["text"])

    def add(batch: pa.Table) -> pa.Table:
        texts = ray.get(ref)
        t = pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array(
                [texts.get(d, "") for d in batch["doc_id"].to_pylist()],
                pa.string()),
        })
        snips = highlight_batch(t, query, "text", analyzer, window)["snippet"]
        return batch.append_column("snippet", snips)

    return results_ds.map_batches(add, batch_format="pyarrow")


def interesting_terms(reader, doc_text: str, max_terms: int = 10,
                      min_df: int = 2) -> list[str]:
    """MLT term selection: the doc's terms ranked by tf*idf under the
    reader's GLOBAL stats; ties by term asc (deterministic)."""
    toks = reader.analyzer.tokenize_text(doc_text or "")
    if not toks:
        return []
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    scored = []
    for t, f in tf.items():
        df = reader.global_df.get(t, 0)
        if df < min_df:
            continue
        scored.append((-f * float(bm25_idf(df, reader.n_docs)), t))
    scored.sort()
    return [t for _, t in scored[:max_terms]]


def more_like_this_text(reader, doc_text: str, k: int = 10,
                        max_terms: int = 10, exclude_doc: int | None = None):
    terms = interesting_terms(reader, doc_text, max_terms)
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    ids, scores = reader.search(" ".join(terms), k + 1)
    if exclude_doc is not None:
        keep = ids != exclude_doc
        ids, scores = ids[keep], scores[keep]
    return ids[:k], scores[:k]
