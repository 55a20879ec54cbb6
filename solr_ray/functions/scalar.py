"""Scalar function registry: Solr function-query / streaming-evaluator names
mapped to vectorized pyarrow.compute kernels.

Reference: 105 function-query parsers (ValueSourceParser.java, grep
`addParser(`) and ~200 streaming evaluators (Lang.java:419-668). The registry
is the Ray-native plugin surface (SURVEY.md §2.10): name -> callable over
Arrow arrays/scalars; FUNCTIONS is extensible via register_function.

Use apply_expr(batch, out_col, name, *args) inside map_batches; args are
column names (strings) or literal constants.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _col(batch: pa.Table, arg):
    if isinstance(arg, str) and arg in batch.column_names:
        return batch[arg]
    return arg  # literal


def _pnorm_dist(p: float, cols) -> np.ndarray:
    """dist(p, x1..xn, y1..yn) value source: p-norm distance between the
    points whose coordinates are the first and second halves of cols
    (DistanceUtils semantics; p=inf -> Chebyshev via a large p is NOT
    modeled — use max/abs compositions)."""
    k = len(cols) // 2
    a = np.stack([np.asarray(c, dtype=np.float64) for c in cols[:k]])
    b = np.stack([np.asarray(c, dtype=np.float64) for c in cols[k:]])
    d = np.abs(a - b)
    if p == 1.0:
        return d.sum(axis=0)
    if p == 2.0:
        return np.sqrt((d * d).sum(axis=0))
    return (d ** p).sum(axis=0) ** (1.0 / p)


def _sqe_dist(cols) -> np.ndarray:
    """sqedist: squared euclidean (no sqrt-then-square rounding)."""
    k = len(cols) // 2
    a = np.stack([np.asarray(c, dtype=np.float64) for c in cols[:k]])
    b = np.stack([np.asarray(c, dtype=np.float64) for c in cols[k:]])
    d = a - b
    return (d * d).sum(axis=0)


def _hsin_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """hsin/geodist value source: great-circle km (haversine, IUGG mean
    radius — the same kernel as ops/spatial.haversine_km, accepting
    columns on either side)."""
    r1a = np.radians(np.asarray(lat1, dtype=np.float64))
    r1o = np.radians(np.asarray(lon1, dtype=np.float64))
    r2a = np.radians(np.asarray(lat2, dtype=np.float64))
    r2o = np.radians(np.asarray(lon2, dtype=np.float64))
    sdlat = np.sin((r2a - r1a) / 2.0)
    sdlon = np.sin((r2o - r1o) / 2.0)
    a = sdlat * sdlat + np.cos(r1a) * np.cos(r2a) * (sdlon * sdlon)
    return 2.0 * 6371.0087714 * np.arcsin(np.sqrt(a))


def _np(fn):
    """Wrap a numpy ufunc as an arrow-array function."""

    def wrapped(*args):
        conv = [
            a.to_numpy(zero_copy_only=False) if isinstance(a, (pa.Array, pa.ChunkedArray)) else a
            for a in args
        ]
        return pa.array(fn(*conv))

    return wrapped


FUNCTIONS: dict = {
    # arithmetic (ValueSourceParser: sum/add, sub, product/mul, div, mod, abs, ...)
    "add": lambda a, b: pc.add(a, b), "sum": lambda *a: _reduce(pc.add, a),
    "sub": lambda a, b: pc.subtract(a, b), "mul": lambda a, b: pc.multiply(a, b),
    "product": lambda *a: _reduce(pc.multiply, a),
    "div": lambda a, b: pc.divide(a, b), "mod": _np(np.mod),
    "abs": lambda a: pc.abs(a), "neg": lambda a: pc.negate(a),
    "ceil": lambda a: pc.ceil(a), "floor": lambda a: pc.floor(a),
    "rint": lambda a: pc.round(a), "round": lambda a: pc.round(a),
    "sqrt": lambda a: pc.sqrt(a), "cbrt": _np(np.cbrt),
    "log": _np(np.log10), "ln": lambda a: pc.ln(a), "exp": lambda a: pc.exp(a),
    "pow": lambda a, b: pc.power(a, b), "hypot": _np(np.hypot),
    "sin": lambda a: pc.sin(a), "cos": lambda a: pc.cos(a), "tan": lambda a: pc.tan(a),
    "asin": lambda a: pc.asin(a), "acos": lambda a: pc.acos(a), "atan": lambda a: pc.atan(a),
    "atan2": lambda a, b: pc.atan2(a, b),
    "sinh": _np(np.sinh), "cosh": _np(np.cosh), "tanh": _np(np.tanh),
    # angle + distance value sources (ValueSourceParser rad/deg/dist/
    # sqedist/hsin/geodist)
    "rad": _np(np.radians), "deg": _np(np.degrees),
    "sqedist": _np(lambda *cols: _sqe_dist(cols)),
    "dist": _np(lambda p, *cols: _pnorm_dist(float(np.asarray(p).flat[0]),
                                             cols)),
    "hsin": _np(lambda lat1, lon1, lat2, lon2: _hsin_km(
        lat1, lon1, lat2, lon2)),
    "geodist": _np(lambda lat1, lon1, lat2, lon2: _hsin_km(
        lat1, lon1, lat2, lon2)),
    "max": lambda a, b: pc.max_element_wise(a, b),
    "min": lambda a, b: pc.min_element_wise(a, b),
    "pi": lambda: math.pi, "e": lambda: math.e,
    "linear": lambda x, m, c: pc.add(pc.multiply(x, m), c),
    "recip": lambda x, m, a, b: pc.divide(a, pc.add(pc.multiply(m, x), b)),
    "scale": None,  # needs global min/max -> see scale_column
    # boolean / conditional (and,or,not,xor,if,exists,gt,lt,gte,lte,eq,def)
    "and": lambda a, b: pc.and_(a, b), "or": lambda a, b: pc.or_(a, b),
    "not": lambda a: pc.invert(a), "xor": lambda a, b: pc.xor(a, b),
    "if": lambda c, t, f: pc.if_else(c, t, f),
    "gt": lambda a, b: pc.greater(a, b), "lt": lambda a, b: pc.less(a, b),
    "gte": lambda a, b: pc.greater_equal(a, b), "lte": lambda a, b: pc.less_equal(a, b),
    "eq": lambda a, b: pc.equal(a, b),
    "exists": lambda a: pc.is_valid(a),
    "def": lambda a, d: pc.coalesce(a, d), "coalesce": lambda *a: pc.coalesce(*a),
    "isnan": lambda a: pc.is_nan(a),
    # string (concat, lower, upper, trim, split, matches, strdist-ish)
    "concat": lambda *a: _concat(*a), "lower": lambda a: pc.utf8_lower(a),
    "upper": lambda a: pc.utf8_upper(a), "trim": lambda a: pc.utf8_trim_whitespace(a),
    "length": lambda a: pc.utf8_length(a),
    "split": lambda a, sep: pc.split_pattern(a, pattern=sep),
    "matches": lambda a, pat: pc.match_substring_regex(a, pattern=pat),
    "substring": lambda a, st, ln: pc.utf8_slice_codeunits(a, start=st, stop=st + ln),
    "replace": lambda a, p, r: pc.replace_substring(a, pattern=p, replacement=r),
    # date (ms, year..second, epoch — Lang.java:625-637)
    "year": lambda a: pc.year(a), "month": lambda a: pc.month(a),
    "day": lambda a: pc.day(a), "hour": lambda a: pc.hour(a),
    "minute": lambda a: pc.minute(a), "second": lambda a: pc.second(a),
    "week": lambda a: pc.iso_week(a), "quarter": lambda a: pc.quarter(a),
    "epoch": lambda a: pc.cast(pc.cast(a, pa.int64()), pa.int64()),
    "ms": lambda a: pc.divide(pc.cast(a, pa.int64()), 1000),
    # vector math (dotProduct, cosineSimilarity — Lang.java array ops)
    "dotProduct": lambda a, b: _vec_dot(a, b),
    "cosineSimilarity": lambda a, b: _vec_cosine(a, b),
    # map/precision (ValueSourceParser map, RangeMapFloatFunction;
    # Lang precision)
    "map": lambda x, lo, hi, tgt, dflt=None: pc.if_else(
        pc.and_(pc.greater_equal(x, lo), pc.less_equal(x, hi)), tgt,
        x if dflt is None else dflt),
    "precision": lambda x, d: pc.round(x, ndigits=int(_scalar(d))),
    # string evaluators (Lang.java left/right/trimLeft/trimRight/indexOf/
    # startsWith/endsWith/contains)
    "left": lambda a, n: pc.utf8_slice_codeunits(
        a, start=0, stop=int(_scalar(n))),
    "right": lambda a, n: _right(a, int(_scalar(n))),
    "trimLeft": lambda a: pc.utf8_ltrim_whitespace(a),
    "trimRight": lambda a: pc.utf8_rtrim_whitespace(a),
    "indexOf": lambda a, s: pc.find_substring(a, pattern=_scalar(s)),
    "startsWith": lambda a, s: pc.starts_with(a, pattern=_scalar(s)),
    "endsWith": lambda a, s: pc.ends_with(a, pattern=_scalar(s)),
    "contains": lambda a, s: pc.match_substring(a, pattern=_scalar(s)),
    "strdist": lambda a, b, kind="levenshtein": _strdist(a, b, kind),
    "murmur3": lambda a: _murmur3(a),
    # array evaluators (Lang.java array/sequence/valueAt/rev/sort/distinct/
    # arrayLength + arrayMax/Min/Sum/Mean over list<...> columns)
    "arrayLength": lambda a: pc.list_value_length(a),
    "valueAt": lambda a, i: _value_at(a, int(_scalar(i))),
    "rev": lambda a: _list_map(a, lambda v: v[::-1]),
    "arraySort": lambda a: _list_map(a, sorted),
    "distinct": lambda a: _list_map(a, lambda v: list(dict.fromkeys(v))),
    "arrayMax": lambda a: _list_agg(a, np.maximum.reduceat),
    "arrayMin": lambda a: _list_agg(a, np.minimum.reduceat),
    "arraySum": lambda a: _list_agg(a, np.add.reduceat),
    "arrayMean": lambda a: _list_mean(a),
    "sequence": lambda n, start, step: pa.array(
        [list(range(int(_scalar(start)),
                    int(_scalar(start)) + int(_scalar(n)) * int(_scalar(step)),
                    int(_scalar(step))))]),
}


def _scalar(v):
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v[0].as_py()
    if isinstance(v, pa.Scalar):
        return v.as_py()
    return v


def _right(a, n: int):
    if n <= 0:
        return pc.utf8_slice_codeunits(a, start=0, stop=0)
    return pc.utf8_slice_codeunits(a, start=-n, stop=np.iinfo(np.int32).max)


def _strdist(a, b, kind):
    """Per-row string distance (levenshtein | jaccard char-bigram).
    Python per row — fine for re-ranking columns, not an index hot path."""
    kind = _scalar(kind)
    av = a.to_pylist() if isinstance(a, (pa.Array, pa.ChunkedArray)) else None
    bv = b.to_pylist() if isinstance(b, (pa.Array, pa.ChunkedArray)) else None
    n = len(av) if av is not None else len(bv)
    av = av if av is not None else [a] * n
    bv = bv if bv is not None else [b] * n

    def lev(x, y):
        x, y = x or "", y or ""
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (cx != cy)))
            prev = cur
        m = max(len(x), len(y))
        return 1.0 - (prev[-1] / m if m else 0.0)

    def jac(x, y):
        gx = {(x or "")[i:i + 2] for i in range(max(len(x or "") - 1, 0))}
        gy = {(y or "")[i:i + 2] for i in range(max(len(y or "") - 1, 0))}
        if not gx and not gy:
            return 1.0
        return len(gx & gy) / len(gx | gy)

    fn = lev if kind == "levenshtein" else jac
    return pa.array([fn(x, y) for x, y in zip(av, bv)], pa.float64())


def _murmur3(a):
    from solr_ray.stages.docids import stable_hash64

    h = stable_hash64(a if isinstance(a, pa.Array) else a.combine_chunks())
    return pa.array(np.asarray(h, dtype=np.int64))


def _value_at(a, i: int):
    """list[i] per row, null when the row is shorter (Solr valueAt EOF)."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return pa.array([None if v is None or i >= len(v) else v[i]
                     for v in a.to_pylist()])


def _list_map(a, fn):
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return pa.array([None if v is None else fn(v) for v in a.to_pylist()],
                    type=a.type)


def _list_offsets(a):
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    counts = pc.list_value_length(a).to_numpy(zero_copy_only=False)
    flat = a.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return flat, starts, counts


def _list_agg(a, reduceat):
    flat, starts, counts = _list_offsets(a)
    out = np.full(len(counts), np.nan)
    nz = counts > 0
    if flat.size:
        vals = reduceat(flat, starts[nz])
        out[nz] = vals[: int(nz.sum())]
    return pa.array(out)


def _list_mean(a):
    flat, starts, counts = _list_offsets(a)
    out = np.full(len(counts), np.nan)
    nz = counts > 0
    if flat.size:
        sums = np.add.reduceat(flat, starts[nz])[: int(nz.sum())]
        out[nz] = sums / counts[nz]
    return pa.array(out)


def _reduce(op, args):
    out = args[0]
    for a in args[1:]:
        out = op(out, a)
    return out


def _concat(*args):
    conv = [a if isinstance(a, (pa.Array, pa.ChunkedArray)) else None for a in args]
    n = next(len(c) for c in conv if c is not None)
    parts = [
        c.cast(pa.string()) if c is not None else pa.array([str(a)] * n)
        for c, a in zip(conv, args)
    ]
    return pc.binary_join_element_wise(*parts, "")


def _vec_np(a):
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return np.array(a.to_pylist(), dtype=np.float64)


def _vec_dot(a, b):
    return pa.array((_vec_np(a) * _vec_np(b)).sum(axis=1))


def _vec_cosine(a, b):
    x, y = _vec_np(a), _vec_np(b)
    nx = np.linalg.norm(x, axis=1)
    ny = np.linalg.norm(y, axis=1)
    denom = np.where((nx == 0) | (ny == 0), 1.0, nx * ny)
    return pa.array((x * y).sum(axis=1) / denom)


def register_function(name: str, fn) -> None:
    FUNCTIONS[name] = fn


def apply_expr(batch: pa.Table, out_col: str, name: str, *args):
    """Evaluate FUNCTIONS[name] over columns/literals; append as out_col."""
    fn = FUNCTIONS[name]
    if fn is None:
        raise ValueError(f"function {name} needs a dedicated helper")
    resolved = [_col(batch, a) for a in args]
    result = fn(*resolved)
    if not isinstance(result, (pa.Array, pa.ChunkedArray)):
        result = pa.array([result] * len(batch))
    elif len(result) == 1 and len(batch) != 1:
        # generator evaluators (e.g. sequence) yield one value: broadcast
        result = pa.concat_arrays(
            [result if isinstance(result, pa.Array)
             else result.combine_chunks()] * len(batch))
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, result)


def scale_column(ds, col: str, lo: float, hi: float, out_col: str | None = None):
    """scale(x, lo, hi): min-max rescale using GLOBAL min/max (two-pass:
    tiny stats aggregate broadcast into a map stage)."""
    out_col = out_col or f"scale_{col}"
    mn, mx = ds.min(col), ds.max(col)
    span = (mx - mn) or 1.0

    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(out_col, pa.array(lo + (v - mn) / span * (hi - lo)))

    return ds.map_batches(f, batch_format="pyarrow")
