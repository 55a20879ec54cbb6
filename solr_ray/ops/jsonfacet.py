"""JSON Facet API executor: the reference's nested-facet request DSL
evaluated as Ray Data groupby/aggregate pipelines.

Reference: the JSON Facet module (solr/core/src/java/org/apache/solr/search/
facet/FacetModule.java:45, FacetRequest parsing; SURVEY §2.5). Supported
request shape (a practical subset of the public API):

    {
      "type": "terms", "field": "lang", "limit": 10, "mincount": 1,
      "sort": "count desc",
      "facet": {
          "avg_chars": "avg(n_chars)",
          "sum_chars": "sum(n_chars)",
          "max_chars": "max(n_chars)",
          "min_chars": "min(n_chars)",
          "n_sources": "unique(source)"
      }
    }
    {"type": "range", "field": "value", "start": 0, "end": 500, "gap": 50,
     "facet": {...}}
    {"type": "query", "q": {<ops.queryfilter spec>}, "facet": {...}}

Aggregation functions: count (implicit per bucket), sum/avg/min/max over a
numeric field, unique (exact distinct). Nested bucket facets (a terms facet
inside a terms facet) evaluate as a multi-key groupby, like pivot facets.
One groupby shuffle per facet level — Ray's exact shuffle replaces the
reference's two-phase overrequest+refine protocol (FacetModule.java:162-198).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_AGG_RE = re.compile(r"^(count|sum|avg|min|max|unique)\((\w*)\)$")


def _drop_null(ds, cols):
    """Drop rows with a null in any of cols BEFORE a groupby keyed on
    them: null values never facet (Solr: missing), and Ray's sort-based
    groupby partition search crashes on null key columns."""
    import pyarrow.compute as pc

    def f(t: pa.Table, _c=tuple(cols)) -> pa.Table:
        m = pc.is_valid(t[_c[0]])
        for c in _c[1:]:
            m = pc.and_(m, pc.is_valid(t[c]))
        return t.filter(m)

    return ds.map_batches(f, batch_format="pyarrow")
_PCT_RE = re.compile(r"^percentile\((\w+),([0-9.]+)\)$")


def _parse_aggs(facet: dict | None):
    """facet sub-dict -> ([(out_name, fn, field)], [nested (name, spec)]).
    percentile(field, p) parses to fn "percentile:<p>" — the reference's
    PercentileAgg (t-digest, digest merge across shards;
    PercentileAgg.java:19,139-145), evaluated via functions/tdigest."""
    stats, nested = [], []
    for name, spec in (facet or {}).items():
        if isinstance(spec, str):
            compact = spec.replace(" ", "")
            m = _AGG_RE.match(compact)
            if m:
                stats.append((name, m.group(1), m.group(2)))
                continue
            mp = _PCT_RE.match(compact)
            if not mp:
                raise ValueError(f"unsupported facet function {spec!r}")
            stats.append((name, f"percentile:{mp.group(2)}", mp.group(1)))
        elif isinstance(spec, dict):
            nested.append((name, spec))
        else:
            raise ValueError(f"bad facet spec for {name!r}")
    return stats, nested


def _pct_q(fn: str) -> float:
    return float(fn.split(":", 1)[1]) / 100.0


def _agg_group(g: pd.DataFrame, stats) -> dict:
    out = {"count": int(len(g))}
    for name, fn, field in stats:
        if fn == "count":
            out[name] = int(len(g))
        elif fn == "unique":
            out[name] = int(g[field].nunique())
        elif fn.startswith("percentile:"):
            from solr_ray.functions.tdigest import TDigest

            out[name] = TDigest().add(
                g[field].to_numpy(dtype=np.float64)).quantile(_pct_q(fn))
        else:
            v = g[field].to_numpy(dtype=np.float64)
            out[name] = float(getattr(np, fn if fn != "avg" else "mean")(v)) \
                if v.size else float("nan")
    return out


def _has_unique(stats) -> bool:
    return any(fn == "unique" for _n, fn, _f in stats)


def _agg_dataset(ds, stats) -> dict:
    """Flat stats over a whole Dataset via distributed ds.aggregate —
    result types match _agg_group (count/unique int, numeric stats float).
    unique(field) is an exact distinct = tiny groupby(field) count."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    # GLOBAL Dataset.aggregate(Count()) without a column returns 0 in
    # Ray 2.49 (same bug sql.py works around) — count a real input
    # column with ignore_nulls=False so nulls still count as rows.
    schema = ds.schema()
    star = schema.names[0] if schema and schema.names else None
    count_agg = (Count(star, ignore_nulls=False, alias_name="__n")
                 if star is not None else Count(alias_name="__n"))
    aggs, names = [count_agg], []
    for name, fn, field in stats:
        if fn in ("count", "unique"):
            continue
        if fn.startswith("percentile:"):
            from solr_ray.functions.tdigest import percentile_agg

            aggs.append(percentile_agg(field, _pct_q(fn),
                                       alias_name=f"__{name}"))
        else:
            cls = {"sum": Sum, "avg": Mean, "min": Min, "max": Max}[fn]
            aggs.append(cls(field, alias_name=f"__{name}"))
        names.append(name)
    row = ds.aggregate(*aggs) or {}
    n = int(row.get("__n") or 0)
    out = {"count": n}
    for name, fn, field in stats:
        if fn == "count":
            out[name] = n
        elif fn == "unique":
            out[name] = int(_drop_null(ds.select_columns([field]),
                                       [field]).groupby(field)
                            .count().count())
        else:
            v = row.get(f"__{name}")
            out[name] = float(v) if v is not None else float("nan")
    return out


def json_facet(ds, request: dict) -> dict:
    """Evaluate a JSON facet request against a Dataset; returns the
    response dict: {"buckets": [{"val":..., "count":..., <stats>,
    <nested>: {...}}, ...]} (terms/range) or flat stats (query facet)."""
    ftype = request.get("type", "terms")
    stats, nested = _parse_aggs(request.get("facet"))

    if ftype == "query":
        from solr_ray.ops.queryfilter import filter_query

        sub = filter_query(ds, request["q"]) if request.get("q") else ds
        if nested or _has_unique(stats):
            # several consumers walk the filtered stream (stats + each
            # nested facet) — pin it in the object store, NOT the driver
            sub = sub.materialize()
        out = _agg_dataset(sub, stats)
        for name, spec in nested:
            # nested facets recurse on the DATASET (terms/range paths are
            # groupby pipelines) — the query facet's match set never
            # lands on the driver
            out[name] = json_facet(sub, spec)
        return out

    if ftype == "range":
        field = request["field"]
        start, end, gap = request["start"], request["end"], request["gap"]

        def bucketize(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            v = t[field].to_numpy(zero_copy_only=False).astype(np.float64)
            mask = (v >= start) & (v < end)
            t = t.filter(pa.array(mask))
            vv = v[mask]
            b = (np.floor((vv - start) / gap) * gap + start)
            return t.append_column("__bucket", pa.array(b))

        ds = ds.map_batches(bucketize, batch_format="pyarrow")
        key = "__bucket"
    else:  # terms
        key = request["field"]

    limit = int(request.get("limit", 10))
    mincount = int(request.get("mincount", 1))
    sort = request.get("sort", "count desc" if ftype == "terms" else "index asc")

    if not nested:
        return _terms_distributed(ds, key, stats, limit, mincount, sort)

    # nested facets: per-bucket UDF (the nested DSL recursion), but the
    # bucket ROWS stay a Dataset — mincount filter + sort + limit run
    # distributed and only the ≤limit winning buckets reach the driver
    # (nested results travel as JSON strings so blocks stay Arrow-typed).
    import json as _json

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        row = {"val": [g[key].iloc[0]]}
        row.update({k: [v] for k, v in _agg_group(g, stats).items()})
        row["__nested"] = [_json.dumps(
            {name: json_facet_pandas(g, spec) for name, spec in nested})]
        return pd.DataFrame(row)

    rows = _drop_null(ds, [key]).groupby(key).map_groups(
        per_bucket, batch_format="pandas")
    if mincount > 0:
        import pyarrow.compute as pc

        rows = rows.map_batches(
            lambda t, _m=mincount: t.filter(
                pc.greater_equal(t["count"], pa.scalar(_m))),
            batch_format="pyarrow")
    if sort.startswith("count"):
        rows = rows.sort(["count", "val"], descending=[True, False])
    else:  # index order
        rows = rows.sort("val")
    out = rows.limit(limit).to_pandas()
    buckets = []
    for rec in out.to_dict(orient="records"):
        nested_vals = _json.loads(rec.pop("__nested"))
        rec.update(nested_vals)
        buckets.append(rec)
    return {"buckets": buckets}


def _terms_distributed(ds, key: str, stats, limit: int, mincount: int,
                       sort: str) -> dict:
    """Flat terms/range facet as ONE combiner-style grouped aggregate +
    distributed mincount filter + sort().limit() — the facet_field shape
    (grouping.py:56): no bucket row ever materializes on the driver except
    the ≤limit winners, so a high-cardinality field (urls) can't OOM it.
    unique(field) stats are computed ONLY for the winning buckets (a
    broadcast is_in filter + distinct-pair groupby)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    schema = ds.schema()
    star = schema.names[0] if schema and schema.names else None
    aggs = [Count(star, ignore_nulls=False, alias_name="count")
            if star is not None else Count(alias_name="count")]
    numeric = []
    for name, fn, field in stats:
        if fn in ("count", "unique"):
            continue
        if fn.startswith("percentile:"):
            from solr_ray.functions.tdigest import percentile_agg

            aggs.append(percentile_agg(field, _pct_q(fn),
                                       alias_name=f"__{name}"))
        else:
            cls = {"sum": Sum, "avg": Mean, "min": Min, "max": Max}[fn]
            aggs.append(cls(field, alias_name=f"__{name}"))
        numeric.append(name)
    counts = _drop_null(ds, [key]).groupby(key).aggregate(*aggs)

    def flt(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t[key])  # NULL values never facet (Solr: missing)
        if mincount > 0:
            m = pc.and_kleene(m, pc.greater_equal(t["count"], mincount))
        return t.filter(m)

    counts = counts.map_batches(flt, batch_format="pyarrow")
    if sort.startswith("count"):
        counts = counts.sort(["count", key], descending=[True, False])
    else:
        counts = counts.sort(key)
    head = counts.limit(limit).to_pandas()

    uniq_stats = [(n, f) for n, fn, f in stats if fn == "unique"]
    uniq_maps: dict[str, dict] = {}
    if uniq_stats and len(head):
        # broadcast semi-join (joins.semi_join shape): the winner set is
        # tiny (<= limit buckets) — ray.put once, one pc.is_in kernel per
        # batch, never a per-row python membership loop
        from solr_ray.ops.joins import semi_join

        sub = semi_join(ds, head[key].tolist(), key)
        for name, field in uniq_stats:
            pairs = (_drop_null(sub.select_columns([key, field]),
                                [key, field])
                     .groupby([key, field]).count()
                     .groupby(key).count().to_pandas())
            uniq_maps[name] = dict(zip(pairs[key], pairs["count()"]))

    buckets = []
    for rec in head.to_dict(orient="records"):
        b = {"val": rec[key], "count": int(rec["count"])}
        for name, fn, field in stats:
            if fn == "count":
                b[name] = int(rec["count"])
            elif fn == "unique":
                b[name] = int(uniq_maps.get(name, {}).get(rec[key], 0))
            else:
                v = rec.get(f"__{name}")
                b[name] = float(v) if v is not None and v == v \
                    else float("nan")
        buckets.append(b)
    return {"buckets": buckets}


def json_facet_pandas(df: pd.DataFrame, request: dict) -> dict:
    """Same evaluator over an in-memory group (used for nested facets —
    the group is already small after the parent shuffle)."""
    ftype = request.get("type", "terms")
    stats, nested = _parse_aggs(request.get("facet"))
    if ftype == "query":
        raise ValueError("query facets are top-level only")
    if ftype == "range":
        field = request["field"]
        start, end, gap = request["start"], request["end"], request["gap"]
        v = df[field].to_numpy(dtype=np.float64)
        mask = (v >= start) & (v < end)
        df = df[mask].copy()
        df["__bucket"] = np.floor((v[mask] - start) / gap) * gap + start
        key = "__bucket"
    else:
        key = request["field"]
    limit = int(request.get("limit", 10))
    mincount = int(request.get("mincount", 1))
    sort = request.get("sort", "count desc" if ftype == "terms" else "index asc")
    buckets = []
    for val, g in df.groupby(key, sort=True):
        if len(g) < mincount:
            continue
        b = {"val": val}
        b.update(_agg_group(g, stats))
        for name, spec in nested:
            b[name] = json_facet_pandas(g, spec)
        buckets.append(b)
    if sort.startswith("count"):
        buckets.sort(key=lambda b: (-b["count"], b["val"]))
    else:
        buckets.sort(key=lambda b: b["val"])
    return {"buckets": buckets[:limit]}
