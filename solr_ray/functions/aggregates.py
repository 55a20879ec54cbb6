"""Aggregates: exact numeric (Ray built-ins), HyperLogLog approx-distinct,
exact and approximate quantiles — all with mergeable partial/final shape.

Reference mapping (SURVEY.md §2.5):
- count/sum/avg/min/max/sumsq/variance/stddev: agg_* value sources
  (ValueSourceParser.java:1207-1383) -> ray.data.aggregate built-ins.
- hll (Solr ships its own HLL impl for `cardinality`/`hll`): fresh dense
  HyperLogLog here (Flajolet et al. 2007, public algorithm), partial sketch
  per batch -> register-max merge -> tiny final estimate.
- percentile (t-digest AVLTreeDigest, PercentileAgg.java:19,139-145): exact
  quantiles via distributed value-count histogram (exact for discrete-ish
  columns and oracle-matchable in SQL), plus a mergeable sampled
  approximation for unbounded-cardinality columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from solr_ray.stages.docids import stable_hash64


# ------------------------------------------------------------------ HLL

class HyperLogLog:
    """Dense HLL with 2^p registers."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashed(self, h: np.ndarray) -> None:
        """h: uint64 hashes (vectorized)."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rem = h << np.uint64(self.p)  # remaining bits at the top
        # rank = leading zeros of rem + 1 (within 64-p bits)
        lz = np.full(h.size, 64 - self.p, dtype=np.uint8)
        nonzero = rem != 0
        if nonzero.any():
            # 63 - floor(log2(rem)) = leading zeros of a uint64
            bits = np.floor(np.log2(rem[nonzero].astype(np.float64))).astype(np.int64)
            lz[nonzero] = (63 - bits).astype(np.uint8)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """HLL cardinality of a column: one sketch per batch, register-max merge."""

    def sketch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        vals = t[col].to_numpy(zero_copy_only=False)
        h.add_hashed(stable_hash64(vals.astype(object)))
        return pa.table({"registers": pa.array([h.registers.tobytes()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged = merged.merge(
            HyperLogLog(p, np.frombuffer(row["registers"], dtype=np.uint8).copy())
        )
    return merged.estimate()


# ------------------------------------------------------------- quantiles

def exact_quantiles(ds, col: str, qs: list[float],
                    driver_max_rows: int = 5_000_000) -> dict[float, float]:
    """Exact quantiles via a distributed value-count histogram: per-batch
    value counts (combiner) -> groupby(value).sum -> driver cumsum. Exact and
    SQL-oracle-matchable (quantile_disc): q-th value = first value whose
    cumulative count >= ceil(q * N) (lower interpolation).

    Driver gate (repo-standard 5M): for a continuous float column the
    distinct count approaches the row count, so the histogram is probed
    AFTER the distributed reduce and, above the gate, falls back to the
    mergeable t-digest (the reference's own percentile semantics,
    PercentileAgg.java:19,139-145) instead of materializing it."""
    from ray.data.aggregate import Sum

    def counts(t: pa.Table) -> pa.Table:
        c = t.select([col]).group_by(col, use_threads=False).aggregate([([], "count_all")])
        return pa.table({"value": c[col], "cnt": c["count_all"]})

    hist_ds = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    if hist_ds.count() > driver_max_rows:
        from solr_ray.functions.tdigest import tdigest_quantiles

        return tdigest_quantiles(ds, col, qs)
    hist = hist_ds.to_pandas().sort_values("value")
    total = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    vals = hist["value"].to_numpy()
    out = {}
    for q in qs:
        target = max(1, int(np.ceil(q * total)))
        out[q] = float(vals[int(np.searchsorted(cum, target))])
    return out


def approx_quantiles(ds, col: str, qs: list[float], sample_per_batch: int = 1000,
                     seed: int = 13) -> dict[float, float]:
    """Mergeable sampled quantiles (reservoir-ish per batch, deterministic)."""

    def sample(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if v.size > sample_per_batch:
            rng = np.random.default_rng(seed + v.size)
            v = rng.choice(v, sample_per_batch, replace=False)
        return pa.table({"v": pa.array(v)})

    allv = np.concatenate(
        [b["v"].to_numpy() for b in
         ds.map_batches(sample, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
        or [np.empty(0)]
    )
    allv.sort()
    return {q: float(np.quantile(allv, q)) if allv.size else float("nan") for q in qs}


def stats_summary(ds, col: str) -> dict:
    """StatsComponent-style global field stats in ONE pass of partials."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table({
            "n": pa.array([v.size], pa.int64()),
            "sum": pa.array([v.sum() if v.size else 0.0]),
            "sumsq": pa.array([(v * v).sum() if v.size else 0.0]),
            "min": pa.array([v.min() if v.size else np.inf]),
            "max": pa.array([v.max() if v.size else -np.inf]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s = float(parts["sum"].sum())
    ss = float(parts["sumsq"].sum())
    mean = s / n if n else float("nan")
    var = ss / n - mean * mean if n else float("nan")
    return {
        "count": n, "sum": s, "mean": mean,
        "min": float(parts["min"].min()), "max": float(parts["max"].max()),
        "sumsq": ss, "variance": var, "stddev": float(np.sqrt(max(var, 0.0))),
    }
