"""Math/statistics evaluator tests (Lang.java math DSL surface)."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from solr_ray.functions import mathx as mx


def test_moving_avg_median_diff():
    a = [1, 2, 3, 4, 5, 6]
    assert mx.moving_avg(a, 3).tolist() == [2.0, 3.0, 4.0, 5.0]
    assert mx.moving_median([5, 1, 9, 3, 7], 3).tolist() == [5.0, 3.0, 7.0]
    assert mx.diff(a).tolist() == [1, 1, 1, 1, 1]
    assert mx.diff(a, 2).tolist() == [2, 2, 2, 2]
    assert mx.moving_avg(a, 10).size == 0


def test_zscores_unitize():
    a = np.array([2.0, 4.0, 6.0])
    z = mx.zscores(a)
    assert abs(z.mean()) < 1e-12 and abs(z.std(ddof=1) - 1) < 1e-12
    u = mx.unitize([3.0, 4.0])
    assert np.allclose(u, [0.6, 0.8])
    assert mx.zscores([5.0, 5.0]).tolist() == [0.0, 0.0]


def test_ebe_and_scalar_ops():
    assert mx.ebe_add([1, 2], [3, 4]).tolist() == [4, 6]
    assert mx.ebe_subtract([5, 5], [2, 1]).tolist() == [3, 4]
    assert mx.ebe_multiply([2, 3], [4, 5]).tolist() == [8, 15]
    assert mx.ebe_divide([8, 9], [2, 3]).tolist() == [4, 3]
    assert mx.scalar_add(10, [1, 2]).tolist() == [11, 12]
    assert mx.scalar_multiply(3, [1, 2]).tolist() == [3, 6]


def test_means_and_mode():
    assert abs(mx.geometric_mean([1, 4, 16]) - 4.0) < 1e-12
    assert abs(mx.harmonic_mean([1, 2, 4]) - 3 / (1 + 0.5 + 0.25)) < 1e-12
    assert mx.mode([3, 1, 3, 2, 2, 3]) == 3
    assert mx.mode([2, 1, 1, 2]) == 1  # tie -> smallest


def test_describe_and_percentile():
    d = mx.describe([1.0, 2.0, 3.0, 4.0])
    assert d["n"] == 4 and d["min"] == 1 and d["max"] == 4
    assert d["mean"] == 2.5 and d["sum"] == 10 and d["sumsq"] == 30
    assert abs(d["var"] - np.var([1, 2, 3, 4], ddof=1)) < 1e-12
    assert mx.percentile_array([1, 2, 3, 4], 50) == 2.5


def test_corr_cov_regress_predict():
    x = [1.0, 2.0, 3.0, 4.0, 5.0]
    y = [2.1, 3.9, 6.2, 8.0, 9.9]
    r = mx.corr(x, y)
    assert abs(r - np.corrcoef(x, y)[0, 1]) < 1e-12
    assert abs(mx.cov(x, y) - np.cov(x, y, ddof=1)[0, 1]) < 1e-12
    m = mx.regress(x, y)
    sl, ic = np.polyfit(x, y, 1)
    assert abs(m["slope"] - sl) < 1e-9 and abs(m["intercept"] - ic) < 1e-9
    assert abs(m["RSquare"] - r * r) < 1e-12
    assert abs(mx.predict(m, 6.0) - (m["slope"] * 6 + m["intercept"])) < 1e-12
    got = mx.predict(m, [0.0, 6.0])
    assert np.allclose(got, [m["intercept"], m["slope"] * 6 + m["intercept"]])


def test_perfect_line_regress():
    x = [1.0, 2.0, 3.0]
    y = [3.0, 5.0, 7.0]
    m = mx.regress(x, y)
    assert abs(m["slope"] - 2) < 1e-12 and abs(m["intercept"] - 1) < 1e-12
    assert abs(m["RSquare"] - 1) < 1e-12


def test_hist_array():
    h = mx.hist([0.0, 0.1, 0.9, 1.0, 2.0], 2)
    assert [b["count"] for b in h] == [3, 2]
    assert h[0]["lo"] == 0.0 and h[-1]["hi"] == 2.0


def test_distances():
    assert mx.euclidean([0, 0], [3, 4]) == 5.0
    assert mx.manhattan([1, 2], [4, 6]) == 7.0
    assert abs(mx.canberra([1, 3], [3, 3]) - 0.5) < 1e-12
    assert abs(mx.cosine_distance([1, 0], [0, 1]) - 1.0) < 1e-12
    assert mx.cosine_distance([2, 0], [4, 0]) < 1e-12


def test_normal_cdf():
    assert abs(mx.normal_cdf(0.0) - 0.5) < 1e-12
    assert abs(mx.normal_cdf(1.96) - 0.9750021048517795) < 1e-9
    got = mx.normal_cdf([0.0, 1.0], mu=1.0, sigma=2.0)
    assert abs(got[0] - mx.normal_cdf(-0.5)) < 1e-12


def test_matrix_ops():
    m = mx.matrix([1.0, 2.0], [3.0, 4.0])
    assert mx.transpose(m).tolist() == [[1, 3], [2, 4]]
    assert mx.sum_rows(m).tolist() == [3, 7]
    assert mx.sum_columns(m).tolist() == [4, 6]
    assert mx.grand_sum(m) == 10.0
    obs = np.array([[1.0, 2.0], [2.0, 4.0], [3.0, 6.0]])
    cm = mx.cov_matrix(obs)
    assert np.allclose(cm, np.cov(obs, rowvar=False, ddof=1))
    assert np.allclose(mx.corr_matrix(obs)[0, 1], 1.0)


def test_dataset_regress_and_hist():
    rng = np.random.default_rng(7)
    x = rng.integers(1, 50, size=5000).astype(np.float64)
    y = (3.0 * x + 10.0 + rng.integers(-500, 500, size=5000) / 100.0)
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y})).repartition(6)
    m = mx.dataset_regress(ds, "x", "y", x_scale=1, y_scale=100)
    # quantized grid: y in cents -> slope/intercept are 100x
    assert m["n"] == 5000
    assert abs(m["slope"] / 100.0 - 3.0) < 0.05
    assert abs(m["intercept"] / 100.0 - 10.0) < 1.5
    assert m["r2"] > 0.99
    # cross-check against exact in-memory computation
    xq = np.rint(x).astype(np.int64)
    yq = np.rint(y * 100).astype(np.int64)
    n = len(xq)
    cov_num = n * int((xq * yq).sum()) - int(xq.sum()) * int(yq.sum())
    var_x = n * int((xq * xq).sum()) - int(xq.sum()) ** 2
    assert m["slope"] == float(cov_num) / float(var_x)

    h = mx.dataset_hist(ds, "x", bins=7, lo=1, hi=49, scale=1)
    cnt = h["cnt"].to_numpy()
    assert cnt.sum() == 5000
    want = np.bincount(np.clip(((xq - 1) * 7) // 49, 0, 6), minlength=7)
    assert cnt.tolist() == want.tolist()


def test_registered_list_evaluators_in_select():
    """Array evaluators apply per row to list<double> columns through the
    streaming select() evaluator registry."""
    from solr_ray.expr import eval_expr as evaluate

    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "series": pa.array([[1.0, 2.0, 3.0, 4.0], [10.0, 20.0, 30.0]],
                           pa.list_(pa.float64())),
    })
    tables = {"t": ray.data.from_arrow(t)}
    out = evaluate('select(search(t), id, "movingAvg(series, 2) as ma")',
                   tables).to_pandas().sort_values("id")
    assert list(out["ma"].iloc[0]) == [1.5, 2.5, 3.5]
    assert list(out["ma"].iloc[1]) == [15.0, 25.0]
    out2 = evaluate(
        'select(search(t), id, "harmonicMean(series) as hm")',
        tables).to_pandas().sort_values("id")
    assert abs(out2["hm"].iloc[0]
               - 4 / (1 + 0.5 + 1 / 3 + 0.25)) < 1e-12


def test_spearman_kendall():
    x = [1.0, 2.0, 3.0, 4.0, 5.0]
    y = [2.0, 1.0, 4.0, 3.0, 5.0]
    # monotone transform invariance: spearman(x, x^3) == 1
    assert abs(mx.spearman(x, [v ** 3 for v in x]) - 1.0) < 1e-12
    assert abs(mx.spearman(x, list(reversed(x))) + 1.0) < 1e-12
    # hand-computed tau for the permutation y: 8 concordant, 2 discordant
    assert abs(mx.kendall(x, y) - 0.6) < 1e-12
    assert abs(mx.kendall(x, x) - 1.0) < 1e-12


def test_kmeans_two_blobs():
    rng = np.random.default_rng(11)
    a = rng.normal(0, 0.1, (30, 2))
    b = rng.normal(5, 0.1, (30, 2)) 
    X = np.vstack([a, b])
    out = mx.kmeans(X, 2, seed=3)
    assign = out["assignments"]
    # each blob lands in one cluster
    assert len(set(assign[:30])) == 1 and len(set(assign[30:])) == 1
    assert assign[0] != assign[30]
    cents = sorted(out["centroids"][:, 0].tolist())
    assert abs(cents[0] - 0) < 0.2 and abs(cents[1] - 5) < 0.2
    # deterministic for a fixed seed
    out2 = mx.kmeans(X, 2, seed=3)
    assert (out2["assignments"] == assign).all()


def test_knn_rows_and_regress():
    X = [[0.0, 0.0], [1.0, 0.0], [5.0, 5.0], [0.1, 0.0]]
    y = [10.0, 20.0, 99.0, 12.0]
    idx, d = mx.knn_rows(X, [0.0, 0.0], 2)
    assert idx.tolist() == [0, 3]
    assert d[0] == 0.0
    assert mx.knn_regress(X, y, [0.0, 0.0], 2) == 11.0
    idx_c, _ = mx.knn_rows(X, [1.0, 0.0], 1, distance="cosine")
    assert idx_c[0] in (1, 3)  # colinear with the query
    with pytest.raises(ValueError):
        mx.knn_rows(X, [0, 0], 1, distance="chebyshev")


def test_let_bindings_and_evaluators():
    from solr_ray.expr import eval_expr

    t = ray.data.from_arrow(pa.table({
        "x": [1.0, 2.0, 3.0, 4.0, 5.0],
        "y": [3.0, 5.0, 7.0, 9.0, 11.0],
    }))
    out = eval_expr(
        'let(d=search(t), a=col(d, x), b=col(d, y), m=regress(a, b), '
        'tuple(slope=quantize(predict(m, 1.0), 1000000), '
        'c=corr(a, b)))', {"t": t}).to_pandas()
    assert abs(out["slope"].iloc[0] - 3.0) < 1e-6  # perfect line y=2x+1
    assert abs(out["c"].iloc[0] - 1.0) < 1e-12

    z = eval_expr(
        'let(d=search(t), a=col(d, x), '
        'zip(x=a, d2=scalarMultiply(2, a)))', {"t": t}).to_pandas()
    assert z["d2"].tolist() == [2.0, 4.0, 6.0, 8.0, 10.0]


def test_let_errors():
    from solr_ray.expr import eval_expr

    t = ray.data.from_arrow(pa.table({"x": [1.0]}))
    with pytest.raises(ValueError, match="unbound"):
        eval_expr('let(a=col(d, x), tuple(v=a))', {"t": t})
    with pytest.raises(ValueError, match="return expression"):
        eval_expr('let(a=search(t))', {"t": t})
    with pytest.raises(ValueError, match="one length"):
        eval_expr('let(d=search(t), a=col(d, x), '
                  'zip(x=a, b=array(1, 2, 3)))', {"t": t})


def test_special_functions_critical_values():
    # classic two-sided 5% critical values from published tables
    assert abs(mx.t_sf2(2.228, 10) - 0.05) < 1e-3
    assert abs(mx.f_sf(4.965, 1, 10) - 0.05) < 1e-3
    assert abs(mx.chi2_sf(3.841, 1) - 0.05) < 1e-3
    assert abs(mx.chi2_sf(18.307, 10) - 0.05) < 1e-3
    assert abs(mx.betainc(2, 2, 0.5) - 0.5) < 1e-12
    assert abs(mx.gammainc_lower(1, 1) - (1 - math.exp(-1))) < 1e-12
    # large-df t converges to the normal tail
    assert abs(mx.t_sf2(1.96, 1_000_000) - 0.05) < 1e-4


def test_hypothesis_tests():
    rng = np.random.default_rng(5)
    a = rng.normal(0.0, 1.0, 200)
    b = rng.normal(1.0, 1.0, 200)  # well-separated
    r = mx.ttest(a, b)
    assert r["p"] < 1e-6 and r["t"] < 0
    same = mx.ttest(a, rng.normal(0.0, 1.0, 200))
    assert same["p"] > 0.01
    pr = mx.paired_ttest(a, a + 0.5)
    assert pr["p"] < 1e-6 and abs(pr["df"] - 199) < 1e-12
    mw = mx.mann_whitney(a, b)
    assert mw["p"] < 1e-6
    an = mx.anova(a, b, rng.normal(0.5, 1.0, 200))
    assert an["p"] < 1e-6 and an["df1"] == 2
    cs = mx.chi_square([18, 22, 20, 40], [25, 25, 25, 25])
    assert cs["df"] == 3 and 0 < cs["p"] < 0.05


def test_ttest_identical_groups_high_p():
    a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    r = mx.ttest(a, list(a))
    assert abs(r["t"]) < 1e-12 and r["p"] > 0.999


# ------------------------------------------- signal / simulation tier (r4)

def test_fft_ifft_roundtrip_and_values():
    from solr_ray.functions.mathx import fft, ifft

    a = np.array([1.0, 2.0, 0.5, -1.0, 3.0, 0.0, -2.0, 1.5])
    m = fft(a)
    assert m.shape == (2, 8)
    z = np.fft.fft(a)
    assert np.allclose(m[0], z.real) and np.allclose(m[1], z.imag)
    assert np.allclose(ifft(m), a)


def test_convolve_matches_numpy():
    from solr_ray.functions.mathx import convolve

    a, b = [1, 2, 3], [0.5, 1]
    assert np.allclose(convolve(a, b), np.convolve(a, b))


def test_dbscan_planted_clusters():
    from solr_ray.functions.mathx import dbscan

    rng = np.random.default_rng(0)
    c1 = rng.normal(0, 0.1, (20, 2))
    c2 = rng.normal(5, 0.1, (20, 2))
    noise = np.array([[2.5, 2.5]])
    m = np.vstack([c1, c2, noise])
    labels = dbscan(m, eps=0.5, min_pts=4)
    assert len(set(labels[:20])) == 1 and labels[0] != -1
    assert len(set(labels[20:40])) == 1 and labels[20] != labels[0]
    assert labels[40] == -1  # isolated point is noise


def test_sample_seeded_deterministic():
    from solr_ray.functions.mathx import (normal_distribution, sample,
                                          uniform_distribution)

    d = normal_distribution(10, 2)
    a, b = sample(d, 1000, seed=7), sample(d, 1000, seed=7)
    assert np.array_equal(a, b)
    assert abs(a.mean() - 10) < 0.3 and abs(a.std() - 2) < 0.3
    u = sample(uniform_distribution(0, 1), 500, seed=3)
    assert ((u >= 0) & (u < 1)).all()


def test_markov_chain_stationary():
    from solr_ray.functions.mathx import markov_chain, sample

    # 2-state chain with stationary distribution (2/3, 1/3)
    chain = markov_chain([[0.8, 0.2], [0.4, 0.6]], state=0)
    walk = sample(chain, 30_000, seed=11)
    frac1 = float(np.mean(walk == 1.0))
    assert abs(frac1 - 1.0 / 3.0) < 0.02
    assert np.array_equal(walk, sample(chain, 30_000, seed=11))


def test_let_exposes_signal_evaluators(ray_session):
    import ray.data

    from solr_ray.expr import eval_expr

    t = pa.table({"v": pa.array(np.arange(8, dtype=np.float64))})
    out = eval_expr(
        'let(d=search(t), a=col(d, v), f=fft(a), back=ifft(f), '
        'tuple(orig=a, back=back))',
        {"t": ray.data.from_arrow(t)})
    row = out.to_pandas().iloc[0]
    assert np.allclose(row["orig"], row["back"])


def test_monte_carlo_special_form(ray_session):
    """monteCarlo(expr, trials) lazily re-evaluates the body with _trial
    bound per iteration — deterministic (seeded via _trial) and
    statistically sound."""
    import ray.data

    from solr_ray.expr import eval_expr

    t = ray.data.from_arrow(pa.table({"x": [1.0]}))
    q = ('let(d=search(t), mc=monteCarlo('
         'mean(sample(normalDistribution(5, 1), 100, _trial)), 200), '
         'tuple(est=mean(mc)))')
    a = eval_expr(q, {"t": t}).to_pandas()["est"].iloc[0]
    b = eval_expr(q, {"t": t}).to_pandas()["est"].iloc[0]
    assert a == b
    assert abs(a - 5.0) < 0.1


def test_curve_fitting_tier():
    """polyfit/lerp/derivative/integrate/loess/expMovingAvg/oscillate/
    minMaxScale/norms — vs closed forms."""
    from solr_ray.functions.mathx import (derivative, exp_moving_avg,
                                          integrate, l1norm, l2norm, lerp,
                                          linfnorm, loess, min_max_scale,
                                          oscillate, polyfit)

    x = np.arange(50, dtype=np.float64)
    y = 2.0 * x * x - 3.0 * x + 7.0
    # an exact quadratic is reproduced exactly by a degree-2 fit
    assert np.allclose(polyfit(y, degree=2), y)
    # derivative of the quadratic: 4x - 3 (exact for central differences
    # on a quadratic; edges are one-sided, still exact for degree 2? no —
    # forward/backward difference of a quadratic has O(h) error; check
    # interior only)
    d = derivative(y)
    assert np.allclose(d[1:-1], 4.0 * x[1:-1] - 3.0)
    # integral of y over [0, 49] via trapezoid vs exact antiderivative
    # (trapezoid overestimates convex curves by h^2/12 * f''; tolerance)
    exact = (2 / 3) * 49**3 - (3 / 2) * 49**2 + 7 * 49
    assert abs(integrate(y) - exact) / exact < 1e-3
    assert integrate(np.ones(11), lo=2.0, hi=7.5) == 5.5
    # lerp hits the samples exactly and interpolates midpoints
    assert np.allclose(lerp(x, y), y)
    assert lerp(np.array([0.0, 2.0]), np.array([0.0, 4.0]),
                np.array([1.0]))[0] == 2.0
    # EMA: constant series stays constant; alpha math on a step
    assert np.allclose(exp_moving_avg(np.full(10, 5.0), 4), 5.0)
    e = exp_moving_avg(np.array([0.0, 1.0]), 3)
    assert abs(e[1] - 0.5) < 1e-12  # alpha = 2/(3+1) = 0.5
    # loess on a clean line reproduces the line
    line = 3.0 * x + 1.0
    assert np.allclose(loess(line, bandwidth=0.3), line, atol=1e-8)
    # oscillate
    o = oscillate(2.0, 0.5, 1.0, size=16)
    assert np.allclose(o, 2.0 * np.sin(0.5 * np.arange(16) + 1.0))
    # minMaxScale + norms
    s = min_max_scale(np.array([5.0, 10.0, 15.0]))
    assert np.allclose(s, [0.0, 0.5, 1.0])
    assert l1norm([3, -4]) == 7.0 and l2norm([3, 4]) == 5.0
    assert linfnorm([-9, 2]) == 9.0


def test_curve_tier_in_let_dsl(ray_session):
    """The new evaluators bind through let()/col() like the rest of the
    Lang DSL."""
    import ray.data

    from solr_ray.expr import eval_expr

    t = pa.table({"v": np.arange(20, dtype=np.float64)})
    out = eval_expr(
        'let(d=search(s), a=col(d, v), f=polyfit(a, 1), '
        'e=expMovingAvg(a, 5), n=l2norm(a), tuple(n=n))',
        {"s": ray.data.from_arrow(t)})
    row = out.to_pandas().iloc[0]
    assert abs(row["n"] - np.linalg.norm(np.arange(20))) < 1e-9
