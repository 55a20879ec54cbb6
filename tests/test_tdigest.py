"""t-digest: accuracy, mergeability, bounded size, groupby aggregate, and
the exact_quantiles driver gate."""

import numpy as np
import pyarrow as pa
import pytest

from solr_ray.functions.tdigest import TDigest, percentile_agg, tdigest_quantiles
from solr_ray.functions.aggregates import exact_quantiles


def _rank_error(values: np.ndarray, q: float, est: float) -> float:
    return abs((values <= est).mean() - q)


@pytest.mark.parametrize("dist", ["normal", "uniform", "lognormal"])
def test_accuracy_single_digest(dist):
    rng = np.random.default_rng(7)
    v = getattr(rng, dist)(size=200_000)
    d = TDigest(200)
    for chunk in np.array_split(v, 40):  # incremental adds
        d.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert _rank_error(v, q, d.quantile(q)) < 0.01, (dist, q)


def test_merge_matches_single():
    rng = np.random.default_rng(11)
    v = rng.normal(size=100_000)
    parts = [TDigest(200).add(c) for c in np.array_split(v, 16)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    single = TDigest(200).add(v)
    for q in (0.05, 0.5, 0.95):
        assert abs(merged.quantile(q) - single.quantile(q)) < 0.02
        assert _rank_error(v, q, merged.quantile(q)) < 0.01
    assert abs(merged.n - v.size) < 1e-6


def test_bounded_size_and_codec():
    rng = np.random.default_rng(3)
    d = TDigest(200)
    for _ in range(50):
        d.add(rng.uniform(size=50_000))
    # size invariant: centroid count stays O(delta) at any input size
    assert d.means.size <= 2 * 200
    rt = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(rt.means, d.means)
    assert np.array_equal(rt.weights, d.weights)
    assert rt.quantile(0.5) == d.quantile(0.5)


def test_exact_extremes_and_empty():
    d = TDigest(100)
    assert np.isnan(d.quantile(0.5))
    d.add(np.array([5.0]))
    assert d.quantile(0.0) == 5.0 and d.quantile(1.0) == 5.0
    d2 = TDigest(100).add(np.arange(1000, dtype=np.float64))
    assert d2.quantile(0.0) == 0.0
    assert d2.quantile(1.0) == 999.0


def test_dataset_tdigest_and_gate(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    v = rng.normal(loc=10.0, scale=3.0, size=60_000)
    ds = ray.data.from_arrow(pa.table({"x": v})).repartition(8)

    approx = tdigest_quantiles(ds, "x", [0.1, 0.5, 0.9])
    for q, est in approx.items():
        assert _rank_error(v, q, est) < 0.01, q

    # high-cardinality float column + tiny gate => t-digest fallback path;
    # the driver never materializes the 60k-distinct histogram
    gated = exact_quantiles(ds, "x", [0.5], driver_max_rows=1000)
    assert _rank_error(v, 0.5, gated[0.5]) < 0.01

    # under the gate the histogram path is exact (quantile_disc semantics)
    small = ray.data.from_arrow(
        pa.table({"x": np.repeat(np.arange(100.0), 50)})).repartition(4)
    ex = exact_quantiles(small, "x", [0.5])
    assert ex[0.5] == 49.0  # ceil(0.5*5000)=2500th value (1-based) -> value 49


def test_percentile_agg_groupby(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    ks = np.repeat(np.arange(8), 20_000)
    v = rng.uniform(size=ks.size) + ks * 10.0  # per-key shifted uniform
    ds = ray.data.from_arrow(pa.table({"k": ks, "x": v})).repartition(8)
    out = (ds.groupby("k")
           .aggregate(percentile_agg("x", 0.5, alias_name="p50"))
           .to_pandas().sort_values("k"))
    assert len(out) == 8
    for _, row in out.iterrows():
        expect = row["k"] * 10.0 + 0.5
        assert abs(row["p50"] - expect) < 0.05, row
