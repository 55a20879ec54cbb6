"""User query syntax: the lucene/dismax surface — `+must -not "phrase"~N
should` — parsed and executed as a BooleanQuery over the BM25 core.

Reference parsers (SURVEY §2.4): `lucene` (LuceneQParser), `dismax` /
`edismax` (ExtendedDismaxQParser.java:67) and `bool` compose per-clause
occur flags (MUST / MUST_NOT / SHOULD) over term and phrase queries. Here:

- `word`          SHOULD term (scores, optional)
- `+word`         MUST term (restricts and scores)
- `-word`         MUST_NOT term (excludes, never scores)
- `"a b"`         SHOULD phrase; `+"a b"` MUST phrase; `-"a b"` exclusion
- `"a b"~2`       phrase with slop 2
- a query of only MUST_NOT clauses matches nothing (Lucene semantics;
  Solr's top-level `*:* -x` rewrite is the caller's job)

Scoring = sum of matching SHOULD/MUST clause scores (BooleanQuery): term
clauses use BM25 per term, phrase clauses use phrase-frequency BM25 with
summed term idfs. Accumulation order is deterministic: sorted unique score
terms first, then phrases in query order — bit-reproducible like the rest
of the engine.
"""

from __future__ import annotations

import re

import numpy as np

from solr_ray.search.bm25 import idf as bm25_idf
from solr_ray.search.searcher import _segment_phrase_match

_CLAUSE = re.compile(r"""
    (?P<occur>[+-]?)
    (?: "(?P<phrase>[^"]*)" (?:~(?P<slop>\d+))?
      | (?P<term>\S+)
    )
""", re.VERBOSE)


def parse_user_query(text: str) -> dict:
    """-> {"must": [tok], "must_not": [tok], "should": [tok],
           "phrases": [(occur, [tok...], slop)]} (tokens pre-analysis)."""
    out = {"must": [], "must_not": [], "should": [], "phrases": []}
    for m in _CLAUSE.finditer(text or ""):
        occur = {"": "should", "+": "must", "-": "must_not"}[m.group("occur")]
        if m.group("phrase") is not None:
            out["phrases"].append(
                (occur, m.group("phrase"), int(m.group("slop") or 0)))
        else:
            out[occur].append(m.group("term"))
    return out


def boolean_search(reader, text: str, k: int = 10):
    """Execute the parsed boolean query against an IndexReader."""
    parsed = parse_user_query(text)
    az = reader.analyzer

    def analyze_terms(words):
        toks = []
        for w in words:
            toks.extend(az.tokenize_text(w))
        return toks

    must = [t for t in analyze_terms(parsed["must"])
            if reader.global_df.get(t)]
    # a MUST term absent from the corpus can never be satisfied
    if len(must) < len([t for t in analyze_terms(parsed["must"])]):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    must_not = [t for t in analyze_terms(parsed["must_not"])
                if reader.global_df.get(t)]
    should = [t for t in analyze_terms(parsed["should"])
              if reader.global_df.get(t)]
    phrases = []
    for occur, ptext, slop in parsed["phrases"]:
        toks = az.tokenize_text(ptext)
        toks = [t for t in toks if reader.global_df.get(t)]
        if not toks:
            if occur == "must":
                return np.empty(0, np.int64), np.empty(0, np.float64)
            continue
        phrases.append((occur, toks, slop))

    score_terms = sorted(set(must) | set(should))
    has_positive = bool(score_terms or
                        any(o != "must_not" for o, _, _ in phrases))
    if not has_positive:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    idfs = {t: float(bm25_idf(reader.global_df[t], reader.n_docs))
            for t in score_terms}
    tomb = reader.tombstones
    all_ids, all_scores = [], []
    for seg in reader.segments:
        acc = np.zeros(seg.dl.size, dtype=np.float64)
        dlf = seg.dl.astype(np.float64)
        present: dict[str, np.ndarray] = {}
        for t in score_terms:
            p = seg.full_posting(t)
            if p is None:
                present[t] = np.empty(0, np.int64)
                continue
            ids, tfs = p
            present[t] = ids
            loc = ids - seg.doc_base
            d = dlf[loc]
            acc[loc] += idfs[t] * (
                tfs / (tfs + reader.k1 * (1.0 - reader.b
                                          + reader.b * d / reader.avgdl)))
        # phrase clauses: scores for should/must, plus constraints
        allowed = np.ones(seg.dl.size, dtype=bool)
        for occur, toks, slop in phrases:
            pids, ptfs = _segment_phrase_match(seg, toks, slop)
            if occur in ("should", "must"):
                pidf = float(sum(bm25_idf(reader.global_df[t],
                                          reader.n_docs) for t in toks))
                if pids.size:
                    loc = pids - seg.doc_base
                    d = dlf[loc]
                    tfsf = ptfs.astype(np.float64)
                    acc[loc] += pidf * (
                        tfsf / (tfsf + reader.k1 * (
                            1.0 - reader.b
                            + reader.b * d / reader.avgdl)))
            if occur == "must":
                m = np.zeros(seg.dl.size, dtype=bool)
                if pids.size:
                    m[pids - seg.doc_base] = True
                allowed &= m
            elif occur == "must_not":
                if pids.size:
                    allowed[pids - seg.doc_base] = False
        for t in must:
            m = np.zeros(seg.dl.size, dtype=bool)
            ids = present.get(t)
            if ids is None:
                p = seg.full_posting(t)
                ids = p[0] if p is not None else np.empty(0, np.int64)
            if ids.size:
                m[ids - seg.doc_base] = True
            allowed &= m
        for t in must_not:
            p = seg.full_posting(t)
            if p is not None and p[0].size:
                allowed[p[0] - seg.doc_base] = False
        acc[~allowed] = 0.0
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
