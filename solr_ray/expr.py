"""Streaming-expression DSL: parse and evaluate the reference's /stream
expression language against Ray Datasets.

Reference: StreamHandler parses expression text with StreamFactory into a
TupleStream tree (solr/core/src/java/org/apache/solr/handler/
StreamHandler.java:81; Lang.register Lang.java:334). Here the same surface
grammar — nested `name(arg, key=value, ...)` calls — compiles to the ops in
this package; sources resolve table names from a caller-provided dict of
Datasets instead of collections.

Supported functions (the practically-used core of Lang.java:334-416):

    search(tbl, q=<filter-spec-json>, fl="a,b")     source + filter + project
    select(expr, "a as b", "c")                     projection/rename
    unique(expr, over="f")                          distinct on key
    sort(expr, by="f asc|desc[, g ...]")            full sort
    top(expr, n=5, sort="f desc")                   bounded top-k
    rollup(expr, over="f[,g]", count(*), sum(x), avg(x), min(x), max(x))
    hashJoin(left, hashed=right, on="k")            broadcast join
    innerJoin(left, right, on="k")                  shuffle join
    leftOuterJoin(left, right, on="k")
    merge(a, b, ...)                                union-all
    intersect(left, right, on="k")                  semi join
    complement(left, right, on="k")                 anti join
    having(expr, gt|lt|eq(field, value))            post-agg filter
    fetch(tbl, expr, on="k", fl="a,b")              by-key field lookup
    cartesianProduct(expr, field)                   unnest list field
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc


# ------------------------------------------------------------------ parser

_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<star>\*)
  | (?P<punct>[(),=])
""", re.VERBOSE)


def _tokenize(text: str):
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            raise ValueError(f"bad expression at {text[i:i+20]!r}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


class _Call:
    def __init__(self, name, args, kwargs):
        self.name, self.args, self.kwargs = name, args, kwargs

    def __repr__(self):
        return f"{self.name}({self.args}, {self.kwargs})"


def parse_expr(text: str):
    toks = _tokenize(text)
    pos = [0]

    def peek():
        return toks[pos[0]]

    def eat(kind=None, val=None):
        k, v = toks[pos[0]]
        if (kind and k != kind) or (val and v != val):
            raise ValueError(f"expected {kind or val}, got {v!r}")
        pos[0] += 1
        return v

    def value():
        k, v = peek()
        if k == "str":
            eat()
            return json.loads(v)  # unquote with escape handling
        if k == "num":
            eat()
            return float(v) if "." in v else int(v)
        if k == "star":
            eat()
            return "*"
        if k == "name":
            eat("name")
            if peek() == ("punct", "("):
                return call_tail(v)
            if peek() == ("punct", "="):
                raise ValueError("kwarg in value position")
            return v  # bare identifier (table/field name or *)
        raise ValueError(f"unexpected {v!r}")

    def call_tail(name):
        eat(val="(")
        args, kwargs = [], {}
        if peek() != ("punct", ")"):
            while True:
                k, v = peek()
                if k == "name" and toks[pos[0] + 1] == ("punct", "="):
                    eat("name")
                    eat(val="=")
                    kwargs[v] = value()
                else:
                    args.append(value())
                if peek() == ("punct", ","):
                    eat(val=",")
                else:
                    break
        eat(val=")")
        return _Call(name, args, kwargs)

    expr = value()
    if peek()[0] != "eof":
        raise ValueError("trailing input")
    if not isinstance(expr, _Call):
        raise ValueError("expression must be a function call")
    return expr


# --------------------------------------------------------------- evaluator

def _sort_spec(by: str):
    cols, desc = [], []
    for part in by.split(","):
        bits = part.split()
        cols.append(bits[0])
        desc.append(len(bits) > 1 and bits[1].lower() == "desc")
    return cols, desc


# hashJoin's `hashed` side / fetch's lookup table read fully into driver
# memory — exactly HashJoinStream.java:35-56 / FetchStream semantics — so
# cap them: a clear error beats a silent driver OOM at corpus scale.
_BROADCAST_MAX_ROWS = 5_000_000


def _guarded_small_side(ds, what: str, max_rows: int = _BROADCAST_MAX_ROWS):
    """Materialize a deliberately-small side to pandas, refusing past
    max_rows with a pointer to the distributed alternative."""
    head = ds.limit(max_rows + 1).to_pandas()
    if len(head) > max_rows:
        raise ValueError(
            f"{what} exceeds {max_rows} rows; it is broadcast to the "
            "driver by design (HashJoinStream semantics) — use "
            "innerJoin/leftOuterJoin (distributed shuffle join) instead")
    return head


def eval_expr(text: str, tables: dict):
    """Evaluate an expression string; tables maps source names to Datasets."""
    return _eval(parse_expr(text), tables)


def _eval(node, tables: dict):
    if not isinstance(node, _Call):
        raise ValueError(f"cannot evaluate {node!r}")
    name, args, kw = node.name, node.args, node.kwargs

    if name == "search":
        ds = tables[args[0]]
        if "q" in kw:
            from solr_ray.ops.queryfilter import filter_query

            spec = kw["q"] if isinstance(kw["q"], dict) else json.loads(kw["q"])
            ds = filter_query(ds, spec)
        if "fl" in kw:
            ds = ds.select_columns([c.strip() for c in kw["fl"].split(",")])
        return ds

    if name == "select":
        ds = _eval(args[0], tables)
        renames, keep, computed = {}, [], []
        for spec in args[1:]:
            # evaluator call: "add(a, b) as c" — any registered scalar
            # function (functions/scalar.FUNCTIONS, the Lang evaluator
            # surface) over columns / numeric literals
            mf = re.match(
                r"^\s*([A-Za-z_]\w*)\(([^()]*)\)\s+as\s+(\S+)\s*$", spec)
            if mf:
                fargs = []
                for a in mf.group(2).split(","):
                    a = a.strip()
                    if not a:
                        continue
                    try:
                        fargs.append(float(a) if "." in a else int(a))
                    except ValueError:
                        fargs.append(a)
                computed.append((mf.group(3), mf.group(1), fargs))
                keep.append(mf.group(3))
                continue
            m = re.match(r"^\s*(\S+)\s+as\s+(\S+)\s*$", spec)
            if m:
                renames[m.group(1)] = m.group(2)
                keep.append(m.group(1))
            else:
                keep.append(spec.strip())
        if computed:
            from solr_ray.functions.scalar import apply_expr

            def add_computed(t: pa.Table) -> pa.Table:
                for alias, fname, fargs in computed:
                    t = apply_expr(t, alias, fname, *fargs)
                return t

            ds = ds.map_batches(add_computed, batch_format="pyarrow")

        # explicit projection: Ray's select_columns/rename Project ops can
        # be silently dropped by projection pushdown after Join+MapBatches
        # chains (see sql._project) — a plain batch fn can't be rewritten
        def project(t: pa.Table, _k=tuple(keep), _r=dict(renames)) -> pa.Table:
            return pa.table({_r.get(c, c): t[c] for c in _k})

        return ds.map_batches(project, batch_format="pyarrow")

    if name == "unique":
        from solr_ray.ops.grouping import distinct

        return distinct(_eval(args[0], tables), [kw["over"]])

    if name == "sort":
        cols, desc = _sort_spec(kw["by"])
        return _eval(args[0], tables).sort(cols, descending=desc)

    if name == "top":
        cols, desc = _sort_spec(kw["sort"])
        return _eval(args[0], tables).sort(cols, descending=desc) \
            .limit(int(kw["n"]))

    if name == "rollup":
        from ray.data.aggregate import Count, Max, Mean, Min, Sum

        ds = _eval(args[0], tables)
        keys = [c.strip() for c in kw["over"].split(",")]
        fns = {"sum": Sum, "avg": Mean, "min": Min, "max": Max}
        specs = []
        for metric in args[1:]:
            if metric.name == "count":
                specs.append(Count(alias_name="count(*)"))
            else:
                fld = metric.args[0]
                specs.append(fns[metric.name](
                    fld, alias_name=f"{metric.name}({fld})"))
        return ds.groupby(keys).aggregate(*specs)

    if name == "hashJoin":
        from solr_ray.ops.joins import broadcast_hash_join

        left = _eval(args[0], tables)
        right = _eval(kw["hashed"], tables) if isinstance(kw["hashed"], _Call) \
            else tables[kw["hashed"]]
        return broadcast_hash_join(
            left, _guarded_small_side(right, "hashJoin 'hashed'"), kw["on"])

    if name in ("innerJoin", "leftOuterJoin"):
        from solr_ray.ops.joins import shuffle_join

        how = "inner" if name == "innerJoin" else "left_outer"
        return shuffle_join(_eval(args[0], tables), _eval(args[1], tables),
                            on=kw["on"], how=how)

    if name == "merge":
        parts = [_eval(a, tables) for a in args]
        out = parts[0]
        return out.union(*parts[1:]) if len(parts) > 1 else out

    if name == "intersect":
        from solr_ray.ops.joins import intersect_keys

        return intersect_keys(_eval(args[0], tables),
                              _eval(args[1], tables), kw["on"])

    if name == "complement":
        from solr_ray.ops.joins import anti_join

        right = _eval(args[1], tables)
        keys = right.unique(kw["on"]) or []
        return anti_join(_eval(args[0], tables), keys, kw["on"])

    if name == "having":
        ds = _eval(args[0], tables)
        cond = args[1]
        ops = {"gt": pc.greater, "lt": pc.less, "eq": pc.equal,
               "gte": pc.greater_equal, "lte": pc.less_equal}
        fld, val = cond.args[0], cond.args[1]
        fn = ops[cond.name]
        return ds.map_batches(
            lambda t: t.filter(fn(t[fld], pa.scalar(val))),
            batch_format="pyarrow")

    if name == "fetch":
        from solr_ray.ops.joins import fetch_fields

        lookup = _guarded_small_side(tables[args[0]], "fetch lookup")
        ds = _eval(args[1], tables)
        fields = [c.strip() for c in kw["fl"].split(",")]
        return fetch_fields(ds, lookup, kw["on"], fields)

    if name == "cartesianProduct":
        from solr_ray.ops.joins import explode

        return explode(_eval(args[0], tables), args[1])

    if name == "timeseries":
        from solr_ray.ops.windows import timeseries as ts_op

        ds = _eval(args[0], tables) if isinstance(args[0], _Call) \
            else tables[args[0]]
        aggs = {}
        for metric in args[1:]:
            if metric.name == "count":
                aggs["count(*)"] = (kw["ts"], "count")
            else:
                fld = metric.args[0]
                aggs[f"{metric.name}({fld})"] = (fld, metric.name)
        return ts_op(ds, kw["ts"], kw.get("gap", "day"), aggs)

    if name == "let":
        return _eval_let(node, tables)

    raise ValueError(f"unknown stream function {name!r}")


# -------------------------------------------- let() variable bindings
#
# Lang's math-expression surface (Lang.java:419-668 / LetStream.java:42):
# let(a=<stream|col|evaluator>, b=..., <return>) binds names in order;
# col(a, field) pulls one column of a bound (small) stream to a
# driver-side array — the documented Lang contract for series math —
# and the array evaluators are solr_ray.functions.mathx. The return
# position takes tuple(k=v, ...) (one row), zip(k=arr, ...) (rows from
# parallel equal-length arrays), a bound stream name, or any evaluator.

def _let_fns():
    import math

    import numpy as np

    from solr_ray.functions import mathx as mx

    def quantize(x, scale):
        s = float(scale)
        if isinstance(x, np.ndarray):
            return np.floor(x * s) / s
        return math.floor(float(x) * s) / s

    return {
        "movingAvg": mx.moving_avg, "movingMedian": mx.moving_median,
        "seriesDiff": mx.diff, "zscores": mx.zscores,
        "standardize": mx.standardize, "unitize": mx.unitize,
        "corr": mx.corr, "cov": mx.cov, "spearman": mx.spearman,
        "kendall": mx.kendall, "regress": mx.regress,
        "predict": mx.predict, "percentile": mx.percentile_array,
        "geometricMean": mx.geometric_mean,
        "harmonicMean": mx.harmonic_mean, "mode": mx.mode,
        "describe": mx.describe, "hist": mx.hist,
        "euclidean": mx.euclidean, "manhattan": mx.manhattan,
        "canberra": mx.canberra, "cosineDistance": mx.cosine_distance,
        "ebeAdd": mx.ebe_add, "ebeSubtract": mx.ebe_subtract,
        "ebeMultiply": mx.ebe_multiply, "ebeDivide": mx.ebe_divide,
        "scalarAdd": mx.scalar_add, "scalarMultiply": mx.scalar_multiply,
        "normalCdf": mx.normal_cdf, "kmeans": mx.kmeans,
        "ttest": mx.ttest, "pairedTtest": mx.paired_ttest,
        "mannWhitney": mx.mann_whitney, "anova": mx.anova,
        "chiSquare": mx.chi_square,
        "knn": mx.knn_rows, "knnRegress": mx.knn_regress,
        "fft": mx.fft, "ifft": mx.ifft, "convolve": mx.convolve,
        "dbscan": mx.dbscan, "sample": mx.sample,
        "normalDistribution": mx.normal_distribution,
        "uniformDistribution": mx.uniform_distribution,
        "empiricalDistribution": mx.empirical_distribution,
        "markovChain": mx.markov_chain,
        "polyfit": mx.polyfit, "lerp": mx.lerp,
        "derivative": mx.derivative, "integrate": mx.integrate,
        "expMovingAvg": mx.exp_moving_avg, "loess": mx.loess,
        "oscillate": mx.oscillate, "minMaxScale": mx.min_max_scale,
        "l1norm": mx.l1norm, "l2norm": mx.l2norm,
        "linfnorm": mx.linfnorm,
        "mean": lambda a: float(np.mean(np.asarray(a, dtype=np.float64))),
        "quantize": quantize,
        "copyOfRange": lambda a, lo, hi: np.asarray(a)[int(lo):int(hi)],
        "valueRow": lambda m, i: np.asarray(m)[int(i)],
        "length": lambda a: len(a),
        "valueAt": lambda a, i: np.asarray(a)[int(i)].item(),
        "array": lambda *xs: np.asarray(xs, dtype=np.float64),
    }


def _eval_value(node, tables, env, fns):
    import ray.data

    if isinstance(node, (int, float)):
        return node
    if isinstance(node, str):
        if node in env:
            return env[node]
        raise ValueError(f"unbound let variable {node!r}")
    if not isinstance(node, _Call):
        raise ValueError(f"cannot evaluate {node!r}")
    if node.name == "col":
        src = node.args[0]
        ds = (env[src] if isinstance(src, str) and src in env
              else _eval_value(src, tables, env, fns))
        if not hasattr(ds, "to_pandas"):
            raise ValueError("col() needs a stream")
        return ds.to_pandas()[node.args[1]].to_numpy()
    if node.name == "monteCarlo":
        # LAZY special form (MonteCarloEvaluator semantics): re-evaluate
        # the body expression `trials` times, collecting scalar results.
        # Each trial binds `_trial` (0-based) in the environment — use it
        # as the seed of sample()/markovChain draws so trials differ yet
        # the whole simulation stays deterministic:
        #   monteCarlo(mean(sample(normalDistribution(0,1), 100, _trial)),
        #              500)
        if len(node.args) != 2:
            raise ValueError("monteCarlo(expr, trials)")
        trials = int(_eval_value(node.args[1], tables, env, fns))
        out = []
        for i in range(trials):
            e2 = dict(env)
            e2["_trial"] = i
            out.append(float(_eval_value(node.args[0], tables, e2, fns)))
        import numpy as _np

        return _np.asarray(out, dtype=_np.float64)
    if node.name in fns:
        a = [_eval_value(x, tables, env, fns) for x in node.args]
        k = {kk: _eval_value(v, tables, env, fns)
             for kk, v in node.kwargs.items()}
        return fns[node.name](*a, **k)
    # stream expression: bound streams are visible as table names
    stream_env = dict(tables)
    for kname, v in env.items():
        if isinstance(v, ray.data.Dataset):
            stream_env[kname] = v
    return _eval(node, stream_env)


def _let_table(ret, tables, env, fns):
    import numpy as np
    import ray.data

    def cell(v):
        if isinstance(v, np.ndarray):
            return pa.array([v.tolist()])
        if isinstance(v, dict):
            return pa.array([json.dumps(v, sort_keys=True)])
        return pa.array([v])

    if isinstance(ret, _Call) and ret.name == "tuple":
        cols = {kk: cell(_eval_value(v, tables, env, fns))
                for kk, v in ret.kwargs.items()}
        return ray.data.from_arrow(pa.table(cols))
    if isinstance(ret, _Call) and ret.name == "zip":
        arrs = {kk: np.asarray(_eval_value(v, tables, env, fns))
                for kk, v in ret.kwargs.items()}
        n = {len(v) for v in arrs.values()}
        if len(n) != 1:
            raise ValueError("zip() arrays must share one length")
        # pa.array on the ndarray directly (tolist() of datetime64[ns]
        # yields raw integers and loses the timestamp type)
        return ray.data.from_arrow(
            pa.table({kk: pa.array(v) for kk, v in arrs.items()}))
    out = _eval_value(ret, tables, env, fns)
    if hasattr(out, "to_pandas"):
        return out
    if isinstance(out, np.ndarray):
        return ray.data.from_arrow(pa.table({"value": pa.array(out)}))
    return ray.data.from_arrow(pa.table({"value": pa.array([out])}))


def _eval_let(node, tables):
    fns = _let_fns()
    env: dict = {}
    for kname, v in node.kwargs.items():
        env[kname] = _eval_value(v, tables, env, fns)
    if not node.args:
        raise ValueError("let() needs a return expression "
                         "(tuple(...), zip(...), or a bound name)")
    return _let_table(node.args[-1], tables, env, fns)
