"""Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", arXiv:1902.04023 — public algorithm).

Reference semantics: Solr's `percentile` aggregate is an AVLTreeDigest with
digest merge across shards (PercentileAgg.java:19,139-145). This is the
same contract re-expressed for Ray Data: a partial digest per block, a
register-style merge (concat + recompress) that is associative, and a tiny
final interpolation — so it composes as a driver fold over block partials
AND as a custom `AggregateFn` inside `groupby().aggregate()` buckets.

Compression is the merging-digest variant, fully vectorized: sort by mean,
assign each centroid to a k-scale cell (k1 scale function
k(q) = δ/2π · asin(2q−1)), and fuse cells with one np.add.reduceat pass —
no per-centroid Python loop. Each fused cell spans < 1 k-unit, which is the
t-digest size invariant; centroid count stays O(δ) regardless of input
size, so a digest is a few KB at δ=200 — safe to hold per group and to
ship through the object store.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    """means/weights kept sorted by mean; min/max tracked for tail accuracy."""

    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 vmin: float = np.inf, vmax: float = -np.inf):
        self.delta = int(delta)
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = (weights if weights is not None
                        else np.empty(0, np.float64))
        self.vmin = float(vmin)
        self.vmax = float(vmax)

    # ---------------------------------------------------------- build/merge

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Fuse sorted (mean, weight) centroids into k-scale cells."""
        total = weights.sum()
        if total <= 0:
            self.means = np.empty(0, np.float64)
            self.weights = np.empty(0, np.float64)
            return
        cum = np.cumsum(weights)
        q = (cum - weights * 0.5) / total  # centroid midpoint quantiles
        k = (self.delta / (2 * np.pi)) * np.arcsin(
            np.clip(2.0 * q - 1.0, -1.0, 1.0))
        cell = np.floor(k)
        starts = np.flatnonzero(np.diff(cell, prepend=np.nan) != 0)
        w = np.add.reduceat(weights, starts)
        m = np.add.reduceat(means * weights, starts) / w
        self.means, self.weights = m, w

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        v = np.sort(v)
        self.vmin = min(self.vmin, float(v[0]))
        self.vmax = max(self.vmax, float(v[-1]))
        m = np.concatenate([self.means, v])
        w = np.concatenate([self.weights, np.ones(v.size)])
        order = np.argsort(m, kind="stable")
        self._compress(m[order], w[order])
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        out = TDigest(self.delta, vmin=min(self.vmin, other.vmin),
                      vmax=max(self.vmax, other.vmax))
        if m.size:
            order = np.argsort(m, kind="stable")
            out._compress(m[order], w[order])
        return out

    # ------------------------------------------------------------- queries

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        w = self.weights
        if w.size == 0:
            return float("nan")
        total = w.sum()
        if w.size == 1:
            return float(self.means[0])
        target = q * total
        mid = np.cumsum(w) - w * 0.5
        if target <= mid[0]:
            f = target / mid[0] if mid[0] > 0 else 1.0
            return float(self.vmin + f * (self.means[0] - self.vmin))
        if target >= mid[-1]:
            span = total - mid[-1]
            f = (target - mid[-1]) / span if span > 0 else 0.0
            return float(self.means[-1] + f * (self.vmax - self.means[-1]))
        i = int(np.searchsorted(mid, target, side="right")) - 1
        f = (target - mid[i]) / (mid[i + 1] - mid[i])
        return float(self.means[i] + f * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs: list[float]) -> dict[float, float]:
        return {q: self.quantile(q) for q in qs}

    # --------------------------------------------------------------- codec

    def to_bytes(self) -> bytes:
        head = np.array([self.delta, self.means.size], np.int64).tobytes()
        tail = np.array([self.vmin, self.vmax], np.float64).tobytes()
        return head + tail + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, size = np.frombuffer(b[:16], np.int64)
        vmin, vmax = np.frombuffer(b[16:32], np.float64)
        means = np.frombuffer(b[32:32 + 8 * size], np.float64).copy()
        weights = np.frombuffer(b[32 + 8 * size:32 + 16 * size],
                                np.float64).copy()
        return cls(int(delta), means, weights, float(vmin), float(vmax))


def tdigest_quantiles(ds, col: str, qs: list[float],
                      delta: int = 200) -> dict[float, float]:
    """Global approximate quantiles: one partial digest per block (a few KB
    each), associative driver fold — never materializes values. The scale
    path for unbounded-cardinality float columns (exact_quantiles gates onto
    this when its value histogram would exceed the 5M driver cap)."""
    import pyarrow as pa

    def sketch(t: pa.Table) -> pa.Table:
        d = TDigest(delta)
        d.add(t[col].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"digest": pa.array([d.to_bytes()], pa.binary())})

    merged = TDigest(delta)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged = merged.merge(TDigest.from_bytes(row["digest"]))
    return merged.quantiles(qs)


def percentile_agg(col: str, q: float, delta: int = 200,
                   alias_name: str | None = None):
    """`percentile(col, q)` as a Ray AggregateFn usable inside
    groupby().aggregate() — the mergeable partial+final shape of the
    reference's PercentileAgg digest merge, one digest per group."""
    from ray.data.aggregate import AggregateFn

    def _block_col(block, name):
        if hasattr(block, "column"):  # pyarrow.Table
            return block.column(name).to_numpy(zero_copy_only=False)
        return block[name].to_numpy()  # pandas

    return AggregateFn(
        init=lambda k: TDigest(delta).to_bytes(),
        accumulate_block=lambda acc, block: (
            TDigest.from_bytes(acc).add(
                _block_col(block, col).astype(np.float64)).to_bytes()),
        merge=lambda a, b: TDigest.from_bytes(a).merge(
            TDigest.from_bytes(b)).to_bytes(),
        finalize=lambda acc: TDigest.from_bytes(acc).quantile(q),
        name=alias_name or f"percentile({col},{q})",
    )
