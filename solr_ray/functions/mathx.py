"""Streaming math/statistics evaluators (the Lang.java math DSL).

Reference surface: the statistics block of the streaming-expression
evaluator registry (solr/solrj-streaming/src/java/org/apache/solr/client/
solrj/io/Lang.java:419-668): describe / corr / cov / regress / predict /
hist / percentile / movingAvg / movingMedian / diff / zscores /
standardize / unitize / ebeAdd..ebeDivide / scalarAdd / scalarMultiply /
geometricMean / harmonicMean / mode / distance (euclidean, manhattan,
canberra, cosine) / matrix ops (transpose, sumRows, sumColumns, grandSum,
covariance and correlation matrices) / normalCdf.

Two tiers, both vectorized numpy:

- **Array evaluators** operate on in-memory numeric arrays — the exact
  Lang.java model, where `let(a=col(search(...)), b=movingAvg(a, 3))`
  binds small driver-side series (a few thousand points: a time series, a
  facet result). They are also registered into the scalar-function
  registry so streaming `select()` can apply them to ``list<double>``
  columns per row.

- **Dataset evaluators** are the 100-TB shapes: one pass of per-batch
  combiner partials (n, Σx, Σy, Σxy, Σx², Σy²) → a tiny driver merge →
  closed-form corr/cov/regression; histogram via fixed integer bin keys
  through the same partial-count pattern. Inputs are integer-quantized
  (CLAUDE.md invariant) so partial sums are EXACT integers — Ray and any
  SQL engine then agree bit-for-bit on the final float expressions.

Hypothesis tests ship with exact tails: the regularized incomplete beta
(Lentz continued fraction) and incomplete gamma (series/CF) give
Student-t, F and chi-squared p-values in pure python/numpy — ttest
(Welch), pairedTtest, mannWhitney (normal approx + tie correction),
anova, chiSquare, matching Apache Commons Math semantics. Not modeled
(honest scope): random sampling evaluators (non-deterministic),
markovChain/monteCarlo simulation. normalCdf is exact via math.erf.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


# ----------------------------------------------------------- array tier

def moving_avg(a, window: int):
    """Trailing-window means over full windows: len(out) = n - window + 1."""
    a = np.asarray(a, dtype=np.float64)
    if window < 1 or a.size < window:
        return np.empty(0, np.float64)
    c = np.concatenate(([0.0], np.cumsum(a)))
    return (c[window:] - c[:-window]) / float(window)


def moving_median(a, window: int):
    a = np.asarray(a, dtype=np.float64)
    if window < 1 or a.size < window:
        return np.empty(0, np.float64)
    win = np.lib.stride_tricks.sliding_window_view(a, window)
    return np.median(win, axis=1)


def diff(a, lag: int = 1):
    """Serial difference a[i] - a[i-lag]."""
    a = np.asarray(a, dtype=np.float64)
    if a.size <= lag:
        return np.empty(0, np.float64)
    return a[lag:] - a[:-lag]


def zscores(a):
    a = np.asarray(a, dtype=np.float64)
    sd = a.std(ddof=1)
    return (a - a.mean()) / sd if sd > 0 else np.zeros_like(a)


def standardize(a):
    return zscores(a)


def unitize(a):
    a = np.asarray(a, dtype=np.float64)
    n = np.linalg.norm(a)
    return a / n if n > 0 else a


def ebe_add(a, b):
    return np.asarray(a, np.float64) + np.asarray(b, np.float64)


def ebe_subtract(a, b):
    return np.asarray(a, np.float64) - np.asarray(b, np.float64)


def ebe_multiply(a, b):
    return np.asarray(a, np.float64) * np.asarray(b, np.float64)


def ebe_divide(a, b):
    return np.asarray(a, np.float64) / np.asarray(b, np.float64)


def scalar_add(k, a):
    return np.asarray(a, np.float64) + float(k)


def scalar_multiply(k, a):
    return np.asarray(a, np.float64) * float(k)


def geometric_mean(a):
    a = np.asarray(a, dtype=np.float64)
    return float(np.exp(np.mean(np.log(a))))


def harmonic_mean(a):
    a = np.asarray(a, dtype=np.float64)
    return float(a.size / np.sum(1.0 / a))


def mode(a):
    """Most frequent value; ties -> smallest (deterministic)."""
    vals, cnt = np.unique(np.asarray(a), return_counts=True)
    return vals[np.argmax(cnt)].item()


def percentile_array(a, p):
    """Lang percentile: linear interpolation, p in (0, 100]."""
    return float(np.percentile(np.asarray(a, np.float64), p))


def describe(a):
    a = np.asarray(a, dtype=np.float64)
    return {
        "n": int(a.size),
        "min": float(a.min()),
        "max": float(a.max()),
        "mean": float(a.mean()),
        "sum": float(a.sum()),
        "sumsq": float(np.sum(a * a)),
        "stddev": float(a.std(ddof=1)) if a.size > 1 else 0.0,
        "var": float(a.var(ddof=1)) if a.size > 1 else 0.0,
        "geometric_mean": geometric_mean(a) if (a > 0).all() else float("nan"),
    }


def corr(a, b):
    """Pearson correlation of two arrays."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    am, bm = a - a.mean(), b - b.mean()
    den = math.sqrt(float(am @ am) * float(bm @ bm))
    return float(am @ bm) / den if den > 0 else float("nan")


def cov(a, b):
    """Sample covariance (n-1 denominator, Lang cov semantics)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float((a - a.mean()) @ (b - b.mean())) / (a.size - 1)


def regress(x, y):
    """OLS simple regression: dict with slope/intercept/R/RSquare, and
    enough to predict (Lang regress -> predict pairing)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xm, ym = x - x.mean(), y - y.mean()
    sxx = float(xm @ xm)
    slope = float(xm @ ym) / sxx if sxx > 0 else float("nan")
    intercept = float(y.mean() - slope * x.mean())
    r = corr(x, y)
    return {"slope": slope, "intercept": intercept,
            "R": r, "RSquare": r * r, "n": int(x.size)}


def predict(model: dict, x):
    """Apply a regress() model to a point or array."""
    x = np.asarray(x, np.float64)
    out = model["slope"] * x + model["intercept"]
    return float(out) if out.ndim == 0 else out


def hist(a, bins: int):
    """Equal-width histogram -> list of {lo, hi, count} (Lang hist)."""
    a = np.asarray(a, np.float64)
    counts, edges = np.histogram(a, bins=bins)
    return [{"lo": float(edges[i]), "hi": float(edges[i + 1]),
             "count": int(c)} for i, c in enumerate(counts)]


def euclidean(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float(np.sqrt(d @ d))


def manhattan(a, b):
    return float(np.abs(np.asarray(a, np.float64)
                        - np.asarray(b, np.float64)).sum())


def canberra(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    den = np.abs(a) + np.abs(b)
    num = np.abs(a - b)
    return float(np.where(den > 0, num / np.where(den > 0, den, 1.0),
                          0.0).sum())


def cosine_distance(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    den = np.linalg.norm(a) * np.linalg.norm(b)
    return 1.0 - (float(a @ b) / den if den > 0 else 0.0)


def normal_cdf(x, mu: float = 0.0, sigma: float = 1.0):
    """Exact normal CDF via erf (Lang normalDistribution +
    cumulativeProbability)."""
    x = np.asarray(x, np.float64)
    out = 0.5 * (1.0 + np.vectorize(math.erf)(
        (x - mu) / (sigma * math.sqrt(2.0))))
    return float(out) if out.ndim == 0 else out


# matrix evaluators -----------------------------------------------------

def matrix(*rows):
    return np.asarray(rows, dtype=np.float64)


def transpose(m):
    return np.asarray(m, np.float64).T


def sum_rows(m):
    return np.asarray(m, np.float64).sum(axis=1)


def sum_columns(m):
    return np.asarray(m, np.float64).sum(axis=0)


def grand_sum(m):
    return float(np.asarray(m, np.float64).sum())


def cov_matrix(m):
    """Sample covariance matrix over COLUMNS of m (observations = rows)."""
    return np.cov(np.asarray(m, np.float64), rowvar=False, ddof=1)


def corr_matrix(m):
    return np.corrcoef(np.asarray(m, np.float64), rowvar=False)


# ---- special functions (public algorithms: regularized incomplete
# beta via Lentz continued fraction, incomplete gamma via series/CF —
# the standard Numerical-Recipes-class formulations) ----

def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
             + a * math.log(x) + b * math.log(1.0 - x))
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def gammainc_lower(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc needs x >= 0, a > 0")
    if x == 0:
        return 0.0
    if x < a + 1.0:
        # series
        ap, s, d = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            d *= x / ap
            s += d
            if abs(d) < abs(s) * 3e-14:
                break
        return s * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q, P = 1 - Q
    FPMIN = 1e-300
    b = x + 1.0 - a
    c = 1.0 / FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < FPMIN:
            d = FPMIN
        c = b + an / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < 3e-14:
            break
    q = math.exp(-x + a * math.log(x) - math.lgamma(a)) * h
    return 1.0 - q


def t_sf2(t: float, df: float) -> float:
    """Two-sided p-value of Student's t."""
    return betainc(df / 2.0, 0.5, df / (df + t * t))


def f_sf(f: float, d1: float, d2: float) -> float:
    """Upper tail of the F distribution."""
    if f <= 0:
        return 1.0
    return betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


def chi2_sf(x: float, k: float) -> float:
    """Upper tail of chi-squared with k dof."""
    return 1.0 - gammainc_lower(k / 2.0, x / 2.0)


# ---- hypothesis tests (Lang ttest / pairedTtest / mannWhitney /
# anova / chiSquare — Apache Commons Math semantics) ----

def ttest(a, b):
    """Welch's two-sample t-test (Commons Math TTest.tTest default):
    dict with t, df (Welch-Satterthwaite), p (two-sided)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = a.size, b.size
    se2 = va / na + vb / nb
    t = float((a.mean() - b.mean()) / math.sqrt(se2))
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return {"t": t, "df": float(df), "p": t_sf2(t, df)}


def paired_ttest(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    n = d.size
    t = float(d.mean() / (d.std(ddof=1) / math.sqrt(n)))
    return {"t": t, "df": float(n - 1), "p": t_sf2(t, n - 1)}


def mann_whitney(a, b):
    """Mann-Whitney U with normal approximation + tie correction:
    dict with u, z, p (two-sided)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    na, nb = a.size, b.size
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(allv.size, np.float64)
    ranks[order] = np.arange(1, allv.size + 1)
    vals, inv, cnt = np.unique(allv, return_inverse=True,
                               return_counts=True)
    sums = np.bincount(inv, weights=ranks)
    ranks = (sums / cnt)[inv]
    ra = ranks[:na].sum()
    u1 = ra - na * (na + 1) / 2.0
    u = min(u1, na * nb - u1)
    n = na + nb
    tie = float(((cnt ** 3 - cnt).sum())) / (n * (n - 1)) if n > 1 else 0.0
    sigma = math.sqrt(na * nb / 12.0 * ((n + 1) - tie))
    mu = na * nb / 2.0
    z = (u - mu) / sigma if sigma > 0 else 0.0
    p = 2.0 * (1.0 - float(normal_cdf(abs(z))))
    return {"u": float(u), "z": float(z), "p": min(p, 1.0)}


def anova(*groups):
    """One-way ANOVA: dict with f, df1, df2, p."""
    gs = [np.asarray(g, np.float64) for g in groups]
    k = len(gs)
    n = sum(g.size for g in gs)
    grand = np.concatenate(gs).mean()
    ssb = sum(g.size * (g.mean() - grand) ** 2 for g in gs)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in gs)
    df1, df2 = k - 1, n - k
    f = (ssb / df1) / (ssw / df2)
    return {"f": float(f), "df1": float(df1), "df2": float(df2),
            "p": f_sf(f, df1, df2)}


def chi_square(observed, expected):
    """Pearson chi-squared goodness-of-fit: dict with chi2, df, p."""
    o = np.asarray(observed, np.float64)
    e = np.asarray(expected, np.float64)
    stat = float(((o - e) ** 2 / e).sum())
    df = o.size - 1
    return {"chi2": stat, "df": float(df), "p": chi2_sf(stat, df)}


def spearman(a, b):
    """Spearman rank correlation: Pearson over average ranks (Lang
    corr(type=spearmans))."""

    def ranks(x):
        x = np.asarray(x, np.float64)
        order = np.argsort(x, kind="stable")
        r = np.empty(x.size, np.float64)
        r[order] = np.arange(1, x.size + 1)
        # average ties
        vals, inv, cnt = np.unique(x, return_inverse=True,
                                   return_counts=True)
        sums = np.bincount(inv, weights=r)
        return (sums / cnt)[inv]

    return corr(ranks(a), ranks(b))


def kendall(a, b):
    """Kendall tau-b (Lang corr(type=kendalls)); O(n^2) pair sweep —
    array-tier sizes only."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    da = a[:, None] - a[None, :]
    db = b[:, None] - b[None, :]
    iu = np.triu_indices(a.size, 1)
    sa, sb = np.sign(da[iu]), np.sign(db[iu])
    conc = float(np.sum(sa * sb))
    ta = float(np.sum(sa == 0))
    tb = float(np.sum(sb == 0))
    n0 = float(sa.size)
    den = math.sqrt((n0 - ta) * (n0 - tb))
    return conc / den if den > 0 else float("nan")


def kmeans(m, k: int, iters: int = 25, seed: int = 0):
    """Lloyd k-means over rows of m (Lang kmeans): deterministic
    k-means++ init from the given seed. Returns dict with centroids
    (k×d), assignments (n,), and within-cluster SSE."""
    X = np.asarray(m, np.float64)
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    cents = np.empty((k, X.shape[1]))
    cents[0] = X[rng.integers(n)]
    d2 = np.sum((X - cents[0]) ** 2, axis=1)
    for i in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents[i] = X[rng.choice(n, p=p)]
        d2 = np.minimum(d2, np.sum((X - cents[i]) ** 2, axis=1))
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        dist = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        new_assign = dist.argmin(axis=1)
        if (new_assign == assign).all() and _ > 0:
            break
        assign = new_assign
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = X[mask].mean(axis=0)
    sse = float(((X - cents[assign]) ** 2).sum())
    return {"centroids": cents, "assignments": assign, "sse": sse}


def knn_rows(m, q, k: int, distance: str = "euclidean"):
    """Indices of the k nearest rows of m to vector q (Lang knn)."""
    X = np.asarray(m, np.float64)
    qv = np.asarray(q, np.float64)
    if distance == "euclidean":
        d = np.sqrt(((X - qv) ** 2).sum(axis=1))
    elif distance == "manhattan":
        d = np.abs(X - qv).sum(axis=1)
    elif distance == "cosine":
        nx = np.linalg.norm(X, axis=1) * np.linalg.norm(qv)
        d = 1.0 - np.where(nx > 0, X @ qv / np.where(nx > 0, nx, 1.0), 0.0)
    else:
        raise ValueError(f"unknown distance {distance!r}")
    order = np.lexsort((np.arange(X.shape[0]), d))
    return order[:k], d[order[:k]]


def knn_regress(m, y, q, k: int, distance: str = "euclidean"):
    """Predict y at q as the mean of the k nearest rows' y values
    (Lang knnRegress)."""
    idx, _d = knn_rows(m, q, k, distance)
    return float(np.mean(np.asarray(y, np.float64)[idx]))


# --------------------------------------------------------- dataset tier

def _quant(col: pa.ChunkedArray | pa.Array, scale: int) -> np.ndarray:
    v = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
    return np.rint(v * scale).astype(np.int64)


def bivariate_sums(ds, x: str, y: str, x_scale: int = 1, y_scale: int = 1):
    """EXACT integer moment sums over a Dataset: one map_batches pass of
    per-batch partials, one tiny driver reduce. Inputs are quantized by
    the given scales (e.g. 100 for cents) so every partial is an exact
    int; python-int accumulation on the driver never overflows. This is
    the combiner-then-merge shape that scales as a pure scan."""

    dec = pa.decimal128(38, 0)

    def part(t: pa.Table) -> pa.Table:
        xa = _quant(t[x], x_scale)
        ya = _quant(t[y], y_scale)
        # elementwise int64 products are safe (|q| < 2^31); the SUM can
        # exceed int64 on a large batch, so accumulate python bigints
        # (dtype=object) and ship decimal128 partials
        return pa.table({
            "n": pa.array([len(xa)], pa.int64()),
            "sx": pa.array([int(xa.sum(dtype=object))], dec),
            "sy": pa.array([int(ya.sum(dtype=object))], dec),
            "sxx": pa.array([int((xa * xa).sum(dtype=object))], dec),
            "syy": pa.array([int((ya * ya).sum(dtype=object))], dec),
            "sxy": pa.array([int((xa * ya).sum(dtype=object))], dec),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_arrow_refs()
    import ray

    tot = {k: 0 for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    for ref in parts:
        t = ray.get(ref)
        for k in tot:
            for v in t[k].to_pylist():
                tot[k] += int(v)
    return tot


def dataset_regress(ds, x: str, y: str, x_scale: int = 1, y_scale: int = 1):
    """Distributed OLS + Pearson from exact integer sums. The float
    expressions are written once here and mirrored verbatim in the SQL
    oracle (same parenthesization -> bit-identical doubles).

    Returns one-row dict: n, corr_xy, cov_xy, slope, intercept, r2 in the
    QUANTIZED units (scale-invariant stats are unaffected; slope is in
    y-units-per-x-unit of the quantized grid)."""
    s = bivariate_sums(ds, x, y, x_scale, y_scale)
    n, sx, sy = s["n"], s["sx"], s["sy"]
    sxx, syy, sxy = s["sxx"], s["syy"], s["sxy"]
    cov_num = n * sxy - sx * sy          # exact ints (python bigint)
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    corr_xy = float(cov_num) / math.sqrt(float(var_x) * float(var_y))
    cov_xy = float(cov_num) / (float(n) * float(n - 1))
    slope = float(cov_num) / float(var_x)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return {"n": n, "corr_xy": corr_xy, "cov_xy": cov_xy, "slope": slope,
            "intercept": intercept, "r2": corr_xy * corr_xy}


def dataset_hist(ds, col: str, bins: int, lo: int, hi: int,
                 scale: int = 1):
    """Distributed equal-width histogram on the integer grid: bin keys are
    computed per batch ((q - lo) * bins) // (hi - lo + 1) — pure integer
    math, so any engine agrees exactly. Per-batch bincount partials merge
    into one `bins`-long vector; out-of-range values are clipped into the
    edge bins (Lang hist keeps all mass)."""
    span = hi - lo + 1

    def part(t: pa.Table) -> pa.Table:
        q = _quant(t[col], scale)
        b = ((q - lo) * bins) // span
        b = np.clip(b, 0, bins - 1)
        cnt = np.bincount(b, minlength=bins)
        return pa.table({"bin": np.arange(bins, dtype=np.int64),
                         "cnt": cnt.astype(np.int64)})

    import ray

    tot = np.zeros(bins, dtype=np.int64)
    for ref in ds.map_batches(part, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        tot[np.asarray(t["bin"])] += np.asarray(t["cnt"])
    return pa.table({
        "bin": pa.array(np.arange(bins, dtype=np.int64)),
        "cnt": pa.array(tot),
    })


# ------------------------------------------------- signal / simulation tier
# Lang.java's remaining evaluator families (fft, convolution, dbscan, the
# distribution/sampling block, markovChain). Sampling is SEEDED numpy
# Generator draws, so every "random" evaluator is deterministic and
# testable — the reference's unseeded Commons-Math RNG is the one
# deliberate divergence (an unseeded evaluator can't be oracled).

def fft(a):
    """FFTEvaluator: returns a 2-row matrix [real, imag] of the DFT."""
    z = np.fft.fft(np.asarray(a, dtype=np.float64))
    return np.vstack([z.real, z.imag])


def ifft(m):
    """IFFTEvaluator: inverse DFT of a [real, imag] 2-row matrix ->
    real array."""
    m = np.asarray(m, dtype=np.float64)
    return np.fft.ifft(m[0] + 1j * m[1]).real


def convolve(a, b):
    """ConvolutionEvaluator: full discrete convolution."""
    return np.convolve(np.asarray(a, dtype=np.float64),
                       np.asarray(b, dtype=np.float64))


def dbscan(m, eps: float, min_pts: int, distance: str = "euclidean"):
    """DBSCANEvaluator: density clustering over matrix rows. Returns one
    cluster label per row (-1 = noise), clusters numbered in discovery
    order — deterministic for a given row order. O(n^2) pairwise
    distances: the let()-tier contract is a small in-memory matrix (use
    ops/similarity for corpus-scale neighbor search)."""
    x = np.asarray(m, dtype=np.float64)
    n = len(x)
    if distance == "euclidean":
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
        neigh = d2 <= eps * eps
    elif distance == "manhattan":
        d = np.abs(x[:, None, :] - x[None, :, :]).sum(axis=2)
        neigh = d <= eps
    else:
        raise ValueError(f"unsupported distance {distance!r}")
    counts = neigh.sum(axis=1)
    core = counts >= min_pts
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        seeds = [i]
        labels[i] = cluster
        while seeds:
            j = seeds.pop()
            if not core[j]:
                continue
            for k in np.flatnonzero(neigh[j]):
                if labels[k] == -1:
                    labels[k] = cluster
                    if core[k]:
                        seeds.append(int(k))
        cluster += 1
    return labels


def normal_distribution(mu: float, sigma: float) -> dict:
    return {"dist": "normal", "mu": float(mu), "sigma": float(sigma)}


def uniform_distribution(lo: float, hi: float) -> dict:
    return {"dist": "uniform", "lo": float(lo), "hi": float(hi)}


def empirical_distribution(a) -> dict:
    return {"dist": "empirical",
            "values": np.asarray(a, dtype=np.float64)}


def sample(dist: dict, n: int, seed: int = 0):
    """SampleEvaluator with a SEED (determinism > fidelity to the
    reference's unseeded RNG; Monte-Carlo estimates compose from this +
    the vector algebra, e.g. mean(ebeMultiply(sample(...), ...)))."""
    rng = np.random.default_rng(int(seed))
    n = int(n)
    if dist["dist"] == "normal":
        return rng.normal(dist["mu"], dist["sigma"], n)
    if dist["dist"] == "uniform":
        return rng.uniform(dist["lo"], dist["hi"], n)
    if dist["dist"] == "empirical":
        return rng.choice(dist["values"], size=n, replace=True)
    if dist["dist"] == "markov":
        return _markov_walk(dist, n, rng).astype(np.float64)
    raise ValueError(f"unknown distribution {dist['dist']!r}")


def markov_chain(transitions, state: int = 0) -> dict:
    """MarkovChainEvaluator: a transition-matrix walk; sample(chain, n,
    seed) yields the visited state sequence (as floats, per the Lang
    number contract)."""
    t = np.asarray(transitions, dtype=np.float64)
    if t.ndim != 2 or t.shape[0] != t.shape[1]:
        raise ValueError("markovChain needs a square transition matrix")
    rows = t.sum(axis=1, keepdims=True)
    if np.any(rows <= 0):
        raise ValueError("every state needs an outgoing probability")
    return {"dist": "markov", "t": t / rows, "state": int(state)}


def _markov_walk(dist: dict, n: int, rng) -> np.ndarray:
    t, s = dist["t"], dist["state"]
    k = t.shape[0]
    cum = np.cumsum(t, axis=1)
    draws = rng.random(n)
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = int(np.searchsorted(cum[s], draws[i]))
        s = min(s, k - 1)
        out[i] = s
    return out


def register_evaluators():
    """Expose the array tier to streaming select() for list<double>
    columns (per-row application, the Lang evaluator contract)."""
    from solr_ray.functions.scalar import register_function

    def rowwise(fn, n_extra=0):
        def applied(col, *extra):
            vals = col.to_pylist() if hasattr(col, "to_pylist") else col
            return pa.array([None if v is None
                             else np.asarray(fn(v, *extra)).tolist()
                             for v in vals])
        return applied

    def rowwise_scalar(fn):
        def applied(col, *extra):
            vals = col.to_pylist() if hasattr(col, "to_pylist") else col
            return pa.array([None if v is None else float(fn(v, *extra))
                             for v in vals], pa.float64())
        return applied

    register_function("movingAvg", rowwise(moving_avg))
    register_function("movingMedian", rowwise(moving_median))
    register_function("seriesDiff", rowwise(diff))
    register_function("zscores", rowwise(zscores))
    register_function("unitize", rowwise(unitize))
    register_function("geometricMean", rowwise_scalar(geometric_mean))
    register_function("harmonicMean", rowwise_scalar(harmonic_mean))
    register_function("percentileArray", rowwise_scalar(percentile_array))
    register_function("expMovingAvg", rowwise(exp_moving_avg, 1))
    register_function("minMaxScale", rowwise(min_max_scale))
    register_function("l1norm", rowwise_scalar(l1norm))
    register_function("l2norm", rowwise_scalar(l2norm))


# ---------------------------------------------------------------------
# curve fitting / interpolation / signal tier (Lang.java registrations:
# polyfit, derivative, integrate, loess, lerp, expMovingAvg, oscillate,
# minMaxScale, l1norm/l2norm/linfnorm - public formulas, fresh numpy
# implementations)

def polyfit(y, x=None, degree: int = 3) -> np.ndarray:
    """polyfit(y[, x], degree): least-squares polynomial FITTED VALUES at
    the sample points (Solr returns the fitted curve, not coefficients).
    Two-arg call polyfit(y, degree) — a scalar second argument is the
    degree (the Lang calling convention)."""
    if x is not None and np.ndim(x) == 0:
        x, degree = None, int(x)
    y = np.asarray(y, dtype=np.float64)
    xv = (np.arange(y.size, dtype=np.float64) if x is None
          else np.asarray(x, dtype=np.float64))
    coef = np.polynomial.polynomial.polyfit(xv, y, int(degree))
    return np.polynomial.polynomial.polyval(xv, coef)


def lerp(x, y, at=None) -> np.ndarray:
    """Linear interpolation of (x, y) evaluated at `at` (default: x)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    at = x if at is None else np.asarray(at, dtype=np.float64)
    return np.interp(at, x, y)


def derivative(y, x=None) -> np.ndarray:
    """derivative(y[, x]): dy/dx at the sample points via central
    differences (forward/backward at the edges) - the piecewise-linear
    interpolation derivative the reference's derivative() evaluates."""
    y = np.asarray(y, dtype=np.float64)
    xv = (np.arange(y.size, dtype=np.float64) if x is None
          else np.asarray(x, dtype=np.float64))
    return np.gradient(y, xv)


def integrate(y, x=None, lo: float | None = None,
              hi: float | None = None) -> float:
    """integrate(y[, x][, lo, hi]): trapezoidal integral of the sampled
    curve over [lo, hi] (default: the full sample range)."""
    y = np.asarray(y, dtype=np.float64)
    xv = (np.arange(y.size, dtype=np.float64) if x is None
          else np.asarray(x, dtype=np.float64))
    if lo is not None or hi is not None:
        lo = xv[0] if lo is None else float(lo)
        hi = xv[-1] if hi is None else float(hi)
        grid = np.unique(np.concatenate(
            [[lo, hi], xv[(xv > lo) & (xv < hi)]]))
        y = np.interp(grid, xv, y)
        xv = grid
    return float(np.trapz(y, xv))


def exp_moving_avg(values, window: int) -> np.ndarray:
    """expMovingAvg(values, window): EMA with alpha = 2/(window+1),
    seeded by the first sample."""
    v = np.asarray(values, dtype=np.float64)
    if v.size == 0:
        return v
    alpha = 2.0 / (int(window) + 1.0)
    out = np.empty_like(v)
    out[0] = v[0]
    for i in range(1, v.size):  # recursive by definition; series are
        out[i] = alpha * v[i] + (1 - alpha) * out[i - 1]  # driver-sized
    return out


def loess(y, x=None, bandwidth: float = 0.25) -> np.ndarray:
    """loess(y[, x], bandwidth): locally weighted linear regression
    (Cleveland 1979 tricube weights), smoothed values at the sample
    points."""
    y = np.asarray(y, dtype=np.float64)
    xv = (np.arange(y.size, dtype=np.float64) if x is None
          else np.asarray(x, dtype=np.float64))
    n = y.size
    k = max(2, int(np.ceil(bandwidth * n)))
    out = np.empty(n)
    for i in range(n):
        d = np.abs(xv - xv[i])
        idx = np.argpartition(d, min(k - 1, n - 1))[:k]
        dmax = d[idx].max()
        w = (1 - (d[idx] / (dmax if dmax > 0 else 1.0)) ** 3) ** 3
        xw, yw = xv[idx], y[idx]
        sw = w.sum()
        mx_, my_ = (w * xw).sum() / sw, (w * yw).sum() / sw
        vxx = (w * (xw - mx_) ** 2).sum()
        b = ((w * (xw - mx_) * (yw - my_)).sum() / vxx) if vxx > 0 else 0.0
        out[i] = my_ + b * (xv[i] - mx_)
    return out


def oscillate(amplitude: float, angular_freq: float,
              phase: float, size: int = 128) -> np.ndarray:
    """oscillate(amp, omega, phase): amp * sin(omega*i + phase) over
    i = 0..size-1 (the reference's sine-wave generator)."""
    i = np.arange(int(size), dtype=np.float64)
    return float(amplitude) * np.sin(float(angular_freq) * i
                                     + float(phase))


def min_max_scale(values, lo: float = 0.0, hi: float = 1.0) -> np.ndarray:
    v = np.asarray(values, dtype=np.float64)
    vmin, vmax = v.min(), v.max()
    if vmax == vmin:
        return np.full_like(v, float(lo))
    return (v - vmin) / (vmax - vmin) * (float(hi) - float(lo)) + float(lo)


def l1norm(values) -> float:
    return float(np.abs(np.asarray(values, dtype=np.float64)).sum())


def l2norm(values) -> float:
    return float(np.linalg.norm(np.asarray(values, dtype=np.float64)))


def linfnorm(values) -> float:
    v = np.asarray(values, dtype=np.float64)
    return float(np.abs(v).max()) if v.size else 0.0


register_evaluators()
