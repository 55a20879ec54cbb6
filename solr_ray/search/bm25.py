"""BM25 scoring (Lucene 9 variant), k1=1.2, b=0.75.

Parameters and formula per the reference's default similarity
(BM25SimilarityFactory.java:41-50 defaults k1=1.2 b=0.75;
SchemaSimilarityFactory.java:106 makes BM25 the schema default). Lucene 9's
BM25Similarity (public Lucene docs) computes

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score    = idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))

(the classic (k1+1) numerator factor is dropped — rank-equivalent). We use
GLOBAL (df, N, avgdl) across all index partitions — the ExactStatsCache
semantics (ExactStatsCache.java:61) — so scores are partition-invariant
(SURVEY.md §2.5 term-statistics note). Lucene's 1-byte norm quantization of
dl is intentionally NOT applied (exact dl), a documented divergence
(SURVEY.md §7.7 item 2); the in-repo oracle defines score truth.
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(df, n_docs: float):
    """Vectorized or scalar idf.

    The scalar path uses math.log (glibc libm) rather than np.log: numpy's
    SIMD log diverges from libm by 1 ulp on ~30% of inputs, which flips
    near-tie rankings against SQL oracles (DuckDB's LN is libm log). The
    vectorized path (np.log) only feeds WAND block upper bounds, where a
    1-ulp difference cannot change correctness margins materially.
    """
    if np.ndim(df) == 0:
        dff = float(df)
        return math.log(1.0 + (n_docs - dff + 0.5) / (dff + 0.5))
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf, dl, avgdl: float, k1: float = K1, b: float = B):
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def score(tf, dl, df, n_docs: float, avgdl: float, k1: float = K1, b: float = B):
    return idf(df, n_docs) * tf_norm(tf, dl, avgdl, k1, b)


def block_upper_bound(
    block_max_tf, block_min_dl, term_idf: float, avgdl: float,
    k1: float = K1, b: float = B,
):
    """Valid per-block score bound: BM25 is monotone ↑ in tf and ↓ in dl,
    so bm25(max_tf, min_dl) >= every score in the block (block-max WAND)."""
    return term_idf * tf_norm(block_max_tf, block_min_dl, avgdl, k1, b)
