"""Query-side synonym expansion (SynonymGraphFilter's query role).

Reference: the `text_general` QUERY analyzer chain adds SynonymGraphFilter
(managed-schema.xml:297-313 — index side stays synonym-free, expansion
happens at query time). Lucene rewrites a synonym group into a
SynonymQuery whose scoring treats the group as ONE pseudo-term:

    df  = max docFreq over the group's terms (public SynonymQuery javadoc)
    tf  = sum of the group terms' tfs per doc
    score = idf(df_max) * tf_norm(tf_sum, dl)

Synonym maps use the flat Solr format semantics: a group of mutually
equivalent terms ({"couch": ["sofa"], "sofa": ["couch"]} after loading
"couch,sofa"). `load_synonyms` parses the public synonyms.txt format's
equivalence lines ("a, b, c") and one-way rules ("a => b").
"""

from __future__ import annotations

import numpy as np

from solr_ray.search.bm25 import idf as bm25_idf


def load_synonyms(lines) -> dict[str, list[str]]:
    """synonyms.txt format -> term -> [expansion terms] (self excluded)."""
    out: dict[str, list[str]] = {}
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            targets = [t.strip() for t in rhs.split(",") if t.strip()]
            for src in (t.strip() for t in lhs.split(",")):
                if src:
                    out.setdefault(src, [])
                    for t in targets:
                        if t != src and t not in out[src]:
                            out[src].append(t)
        else:
            group = [t.strip() for t in line.split(",") if t.strip()]
            for src in group:
                out.setdefault(src, [])
                for t in group:
                    if t != src and t not in out[src]:
                        out[src].append(t)
    return out


def synonym_search(reader, text: str, synonyms: dict[str, list[str]],
                   k: int = 10):
    """BM25 top-k where each analyzed query term expands to its synonym
    group scored as a Lucene SynonymQuery (df = group max, tf = group sum).
    Deterministic accumulation: groups in sorted order of their seed term.
    """
    seeds = sorted(set(reader.analyzer.tokenize_text(text)))
    groups = []
    for s in seeds:
        group = [s] + [t for t in synonyms.get(s, [])]
        group = [t for t in dict.fromkeys(group) if reader.global_df.get(t)]
        if group:
            groups.append(group)
    if not groups:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    tomb = reader.tombstones
    all_ids, all_scores = [], []
    for seg in reader.segments:
        acc = np.zeros(seg.dl.size, dtype=np.float64)
        hit = False
        for group in groups:
            df_max = max(reader.global_df[t] for t in group)
            g_idf = float(bm25_idf(df_max, reader.n_docs))
            tf_sum = np.zeros(seg.dl.size, dtype=np.float64)
            any_t = False
            for t in group:
                p = seg.full_posting(t)
                if p is None:
                    continue
                any_t = True
                ids, tfs = p
                tf_sum[ids - seg.doc_base] += tfs
            if not any_t:
                continue
            hit = True
            nz = np.flatnonzero(tf_sum)
            d = seg.dl[nz].astype(np.float64)
            tfv = tf_sum[nz]
            acc[nz] += g_idf * (
                tfv / (tfv + reader.k1 * (1.0 - reader.b
                                          + reader.b * d / reader.avgdl)))
        if not hit:
            continue
        if tomb.size:
            lo, hi = seg.doc_base, seg.doc_base + seg.dl.size
            dead = tomb[(tomb >= lo) & (tomb < hi)] - seg.doc_base
            if dead.size:
                acc[dead] = 0.0
        cand = np.flatnonzero(acc > 0.0)
        if cand.size:
            all_ids.append(cand + seg.doc_base)
            all_scores.append(acc[cand])
    if not all_ids:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    from solr_ray.search.wand import _order_topk

    ids = np.concatenate(all_ids)
    sc = np.concatenate(all_scores)
    return _order_topk(ids, sc, k)
