"""/select-style unified request API: q + fq + paging + fl + facets.

The composition surface of the reference's SearchHandler + QueryComponent +
FacetComponent (+ SolrDocumentFetcher for fl): one request evaluates a BM25
query, restricts it by filter queries over stored fields, pages through the
ranking, materializes requested stored fields for the page only (the
GET_FIELDS pattern), and counts facets over the FULL filtered match set.

Filter queries (`fq`) use the structured specs of ops/queryfilter compiled
against each segment's stored-field columns, so filtered ranking is EXACT:
the per-segment accumulator is masked before top-k selection, not
post-filtered.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from solr_ray.ops.queryfilter import compile_filter
from solr_ray.search.bm25 import idf as bm25_idf
from solr_ray.search.wand import _order_topk


def _segment_fq_mask(seg, fq_specs) -> np.ndarray | None:
    """AND of fq specs evaluated over the segment's stored columns."""
    if not fq_specs:
        return None
    import pyarrow.parquet as pq
    import os

    cols_needed = set()

    def walk(s):
        if "field" in s:
            cols_needed.add(s["field"])
        for sub in s.get("clauses", []):
            walk(sub)

    for s in fq_specs:
        walk(s)
    d = pq.read_table(os.path.join(seg.seg_dir, "docs.parquet"),
                      columns=sorted(cols_needed))
    mask = None
    for s in fq_specs:
        m = compile_filter(s)(d)
        m = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
        mask = m if mask is None else (mask & m)
    return mask


def select(
    reader,
    q: str,
    fq: list[dict] | None = None,
    start: int = 0,
    rows: int = 10,
    fl: tuple[str, ...] = (),
    facet_fields: tuple[str, ...] = (),
    facet_limit: int = 10,
) -> dict:
    """Evaluate a select request against an IndexReader.

    Returns {"numFound": int, "start": int, "docs": [{doc_id, url, score,
    <fl...>}], "facets": {field: [(value, count)]}}.
    """
    terms = [t for t in reader.query_terms(q) if reader.global_df.get(t)]
    resp: dict = {"numFound": 0, "start": start, "docs": [], "facets": {}}
    if not terms:
        return resp
    idfs = {t: float(bm25_idf(reader.global_df[t], reader.n_docs))
            for t in terms}
    k = start + rows
    tomb = reader.tombstones
    all_ids, all_scores = [], []
    facet_counts: dict[str, Counter] = {f: Counter() for f in facet_fields}
    num_found = 0
    for seg in reader.segments:
        acc = np.zeros(seg.dl.size, dtype=np.float64)
        hit_any = False
        for t in terms:
            p = seg.full_posting(t)
            if p is None:
                continue
            hit_any = True
            ids, tfs = p
            loc = ids - seg.doc_base
            d = seg.dl[loc].astype(np.float64)
            acc[loc] += idfs[t] * (
                tfs / (tfs + reader.k1 * (1.0 - reader.b
                                          + reader.b * d / reader.avgdl)))
        if not hit_any:
            continue
        mask = _segment_fq_mask(seg, fq)
        if mask is not None:
            acc[~mask] = 0.0
        if tomb.size:
            lo, hi = seg.doc_base, seg.doc_base + seg.dl.size
            dead = tomb[(tomb >= lo) & (tomb < hi)] - seg.doc_base
            if dead.size:
                acc[dead] = 0.0
        cand = np.flatnonzero(acc > 0.0)
        num_found += int(cand.size)
        for f in facet_fields:
            vals = seg.stored_column(f)[cand]
            for v, c in zip(*np.unique(vals, return_counts=True)):
                facet_counts[f][v] += int(c)
        ids, sc = _order_topk(cand + seg.doc_base, acc[cand], k)
        all_ids.append(ids)
        all_scores.append(sc)
    resp["numFound"] = num_found
    if not all_ids:
        return resp
    ids = np.concatenate(all_ids)
    sc = np.concatenate(all_scores)
    order = np.lexsort((ids, -sc))[start:start + rows]
    page_ids, page_sc = ids[order], sc[order]
    stored = {}
    if fl:
        from solr_ray.search.searcher import fetch_stored

        t = fetch_stored(reader.index_dir, page_ids.tolist(), cols=list(fl))
        stored = {
            int(d): {c: t[c][i].as_py() for c in fl}
            for i, d in enumerate(t["doc_id"].to_pylist())
        }
    for d, s in zip(page_ids.tolist(), page_sc.tolist()):
        doc = {"doc_id": int(d), "url": reader.url_of(int(d)),
               "score": float(s)}
        doc.update(stored.get(int(d), {}))
        resp["docs"].append(doc)
    for f in facet_fields:
        top = sorted(facet_counts[f].items(), key=lambda vc: (-vc[1], vc[0]))
        resp["facets"][f] = top[:facet_limit]
    return resp
