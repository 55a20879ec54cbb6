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
        ds = ds.select_columns(keep)
        if renames:
            ds = ds.rename_columns(renames)
        return ds

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
        return broadcast_hash_join(left, right.to_pandas(), kw["on"])

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

        lookup = tables[args[0]].to_pandas()
        ds = _eval(args[1], tables)
        fields = [c.strip() for c in kw["fl"].split(",")]
        return fetch_fields(ds, lookup, kw["on"], fields)

    if name == "cartesianProduct":
        from solr_ray.ops.joins import explode

        return explode(_eval(args[0], tables), args[1])

    raise ValueError(f"unknown stream function {name!r}")
