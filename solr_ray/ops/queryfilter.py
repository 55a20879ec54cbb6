"""Structured filter queries: the non-scoring QParser surface as vectorized
Arrow predicates over a Dataset.

Reference: QParserPlugin registry (solr/core/src/java/org/apache/solr/search/
QParserPlugin.java:50-91). The parsers that restrict a result set without
scoring map to pure column predicates:

- {!term f=x}v / {!terms f=x}a,b,c  -> equality / set membership
- {!prefix f=x}pre                  -> utf8 starts_with
- {!frange l=.. u=..}field          -> numeric range
- {!bool must=.. must_not=.. should=..} -> AND / NOT / OR composition
- lucene field:[a TO b], field:val  -> same primitives

A filter spec is a nested dict (JSON-able, like Solr's JSON query DSL):

    {"op": "and"|"or"|"not", "clauses": [spec, ...]}
    {"op": "term",   "field": f, "value": v}
    {"op": "terms",  "field": f, "values": [..]}
    {"op": "prefix", "field": f, "value": "pre"}
    {"op": "range",  "field": f, "lo": a, "hi": b,
     "include_lo": True, "include_hi": False}
    {"op": "exists", "field": f}

`compile_filter` builds a per-batch pyarrow predicate; `filter_query`
applies it with map_batches (streaming, no shuffle).

Also here: CursorMark keyset paging (search/CursorMark.java:46) —
`cursor_page` returns the next page strictly after a (sort-key) cursor,
the deep-paging pattern that avoids start+rows offset scans.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _typed_scalar(value, col_type):
    """Literal -> scalar of the COLUMN's type where a plain pa.scalar
    would not compare (ISO date/time strings against timestamp/date
    columns — the SQL front-end has no typed literals). Everything else
    keeps Arrow's own promotion rules."""
    if isinstance(value, str) and (pa.types.is_timestamp(col_type)
                                   or pa.types.is_date(col_type)):
        return pc.cast(pa.scalar(value), col_type)
    return pa.scalar(value)


def compile_filter(spec: dict):
    """spec -> fn(pa.Table) -> BooleanArray (vectorized, stateless)."""
    op = spec["op"]
    if op in ("and", "or"):
        subs = [compile_filter(s) for s in spec["clauses"]]
        # Kleene three-valued logic, matching SQL: NULL OR TRUE = TRUE,
        # NULL AND FALSE = FALSE (arrow's plain and_/or_ propagate null
        # instead, which diverges under NOT — hypothesis-caught)
        comb = pc.and_kleene if op == "and" else pc.or_kleene

        def f(t: pa.Table):
            m = subs[0](t)
            for s in subs[1:]:
                m = comb(m, s(t))
            return m

        return f
    if op == "not":
        sub = compile_filter(spec["clauses"][0])
        return lambda t: pc.invert(sub(t))
    if op == "const":
        # constant predicate (e.g. an uncorrelated EXISTS resolved to its
        # truth value before execution)
        val = bool(spec["value"])
        return lambda t: pa.array([val] * t.num_rows, pa.bool_())
    if op == "cmp_lookup":
        # field <cmp> lookup[key_field] — a correlated scalar subquery
        # resolved to a broadcast (key -> value) map: one index_in + take
        # per batch; keys absent from the map yield NULL, which filters
        # out (ANSI: comparison with an empty subquery is NULL)
        import ray

        fn = {"=": pc.equal, "<>": pc.not_equal, "!=": pc.not_equal,
              "<": pc.less, "<=": pc.less_equal,
              ">": pc.greater, ">=": pc.greater_equal}[spec["cmp"]]

        def f(t: pa.Table, _s=spec, _fn=fn):
            keys, vals = ray.get(_s["ref"])
            if len(keys) == 0:  # empty subquery: nothing compares true
                return pa.array([False] * t.num_rows, pa.bool_())
            idx = pc.index_in(t[_s["key_field"]], value_set=keys)
            looked = vals.take(idx)
            return _fn(t[_s["field"]], looked)

        return f
    if op == "term":
        return lambda t: pc.equal(
            t[spec["field"]], _typed_scalar(spec["value"],
                                            t[spec["field"]].type))
    if op == "terms":
        vals = list(spec["values"])

        def f(t: pa.Table):
            col = t[spec["field"]]
            hit = pc.is_in(col, value_set=pa.array(vals))
            # SQL: NULL IN (...) is NULL, not FALSE — matters under NOT
            return pc.if_else(pc.is_valid(col), hit,
                              pa.scalar(None, pa.bool_()))

        return f
    if op == "prefix":
        return lambda t: pc.starts_with(t[spec["field"]],
                                        pattern=spec["value"])
    if op == "like":
        # SQL LIKE with % and _ wildcards (arrow match_like is the
        # same pattern language, case-sensitive, as ANSI/DuckDB)
        return lambda t: pc.match_like(t[spec["field"]],
                                       pattern=spec["pattern"])
    if op == "range":
        fld, lo, hi = spec["field"], spec.get("lo"), spec.get("hi")
        ilo = spec.get("include_lo", True)
        ihi = spec.get("include_hi", False)

        def f(t: pa.Table):
            c = t[fld]
            m = None
            if lo is not None:
                m = (pc.greater_equal if ilo else pc.greater)(
                    c, _typed_scalar(lo, c.type))
            if hi is not None:
                h = (pc.less_equal if ihi else pc.less)(
                    c, _typed_scalar(hi, c.type))
                m = h if m is None else pc.and_(m, h)
            return m if m is not None else pa.array([True] * len(t))

        return f
    if op == "exists":
        return lambda t: pc.is_valid(t[spec["field"]])
    if op == "cmp_expr":
        # scalar-expression predicate from the SQL front-end:
        # <expr over columns> <cmp> <literal>. The expr tree compiles via
        # sql.compile_expr lazily (sql imports this module; by the time a
        # filter compiles, both are loaded). NULL propagates through the
        # comparison (SQL semantics — matters under NOT/Kleene).
        from solr_ray.sql import compile_expr

        ef = compile_expr(spec["node"])
        cmps = {"=": pc.equal, "<>": pc.not_equal, "!=": pc.not_equal,
                "<": pc.less, "<=": pc.less_equal,
                ">": pc.greater, ">=": pc.greater_equal}
        fn = cmps[spec["cmp"]]
        val = pa.scalar(spec["value"])

        def f(t: pa.Table):
            v = ef(t)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            return fn(v, val)

        return f
    if op == "col_eq":
        # column = column predicate (residual implicit-join equality or
        # an explicit self-comparison); NULL = NULL is NULL (ANSI)
        return lambda t: pc.equal(t[spec["left"]], t[spec["right"]])
    if op == "hash_range":
        # {!hash_range f=field l=lo u=hi} (HashRangeQParserPlugin.java:35):
        # shard-split routing — match docs whose stable hash of the field,
        # reduced mod `buckets`, lands in [lo, hi]. Deterministic across
        # runs/workers (stable_hash64), so the ranges PARTITION the corpus.
        fld = spec["field"]
        lo, hi = int(spec["lo"]), int(spec["hi"])
        buckets = int(spec.get("buckets", 1 << 15))

        def f(t: pa.Table):
            import numpy as np

            from solr_ray.stages.docids import stable_hash64

            col = t[fld]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            h = np.asarray(stable_hash64(col), dtype=np.uint64) % buckets
            return pa.array((h >= lo) & (h <= hi))

        return f
    raise ValueError(f"unknown filter op {op!r}")


def filter_query(ds, spec: dict):
    """Apply a structured filter spec to a Dataset (streaming map_batches)."""
    pred = compile_filter(spec)
    return ds.map_batches(lambda t: t.filter(pred(t)), batch_format="pyarrow")


def cursor_page(ds, sort_cols: list[str], after: tuple | None, limit: int,
                descending: bool | list[bool] = False):
    """Keyset pagination: rows strictly after `after` in (sort_cols) order.

    after: the last sort-key tuple of the previous page (None = first page).
    The sort keys must be a total order (include the unique key last, like
    Solr requires the uniqueKey in a cursor sort).
    """
    desc = ([descending] * len(sort_cols)
            if isinstance(descending, bool) else list(descending))

    if after is not None:
        def beyond(t: pa.Table):
            # lexicographic "row > after" under mixed asc/desc
            gt = None  # strictly-after on prefix
            eq = None  # all-equal on prefix
            for c, a, d in zip(sort_cols, after, desc):
                col = t[c]
                cmp_gt = pc.less(col, pa.scalar(a)) if d else pc.greater(
                    col, pa.scalar(a))
                cmp_eq = pc.equal(col, pa.scalar(a))
                term = cmp_gt if eq is None else pc.and_(eq, cmp_gt)
                gt = term if gt is None else pc.or_(gt, term)
                eq = cmp_eq if eq is None else pc.and_(eq, cmp_eq)
            return gt

        ds = ds.map_batches(lambda t: t.filter(beyond(t)),
                            batch_format="pyarrow")
    return ds.sort(sort_cols, descending=desc).limit(limit)
