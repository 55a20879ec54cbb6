"""Grouping / faceting / top-k-per-group operators.

Reference semantics:
- distinct over a stream: UniqueStream.java + DistinctOperation (sorted-stream
  dedup) — here a hash groupby + first (shuffle replaces the sort contract).
- result grouping / collapse-expand: Grouping.java:76,
  CollapsingQParserPlugin (3,810 LoC), ExpandComponent — groupby + per-group
  head under a sort.
- term/range facets: FacetModule.java:45, FacetFieldProcessor*,
  FacetRangeProcessor (1,225 LoC). Ray's exact groupby shuffle replaces the
  two-phase overrequest+refine protocol (FacetModule.java:162-198) entirely.
- rollup/hashRollup: RollupStream.java:43 / HashRollupStream.java:43.
- significantTerms: SignificantTermsStream.java:55 (foreground vs background
  term scoring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def distinct(ds, cols: list[str]):
    """Exact distinct rows on the given key columns (hash shuffle + first)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return ds.groupby(cols).map_groups(first, batch_format="pandas")


def _non_null(ds, field: str):
    """Null collapse/group keys are excluded (Solr's default
    nullPolicy=ignore) — and dropping them pre-shuffle also dodges the
    Ray sort-groupby null-key partition crash."""
    return ds.map_batches(
        lambda t, _f=field: t.filter(pc.is_valid(t[_f])),
        batch_format="pyarrow")


def collapse(ds, field: str, sort_col: str, descending: bool = True):
    """CollapsingQParserPlugin semantics: one row per group — the row with
    the max (or min) sort_col; ties broken deterministically by row order
    after a stable sort. Docs with a null collapse field are excluded
    (the reference's default nullPolicy=ignore)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_col, ascending=not descending, kind="stable")
        return g.head(1)

    return _non_null(ds, field).groupby(field).map_groups(
        pick, batch_format="pandas")


def group_topk(ds, field: str, sort_col: str, k: int, descending: bool = True):
    """ExpandComponent / grouping: top-k rows per group by sort_col.
    Null group keys excluded (nullPolicy=ignore analog)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_col, ascending=not descending, kind="stable")
        return g.head(k)

    return _non_null(ds, field).groupby(field).map_groups(
        pick, batch_format="pandas")


def facet_field(ds, field: str, limit: int = 10, mincount: int = 1,
                prefix: str | None = None, sort: str = "count"):
    """Term facet: value -> count (FacetFieldProcessor parameter surface:
    facet.limit, facet.mincount, facet.prefix, facet.sort=count|index).
    sort="count" orders (count desc, value asc) — Solr's default;
    sort="index" orders by value asc. NULL values never facet (Solr
    counts them separately via facet.missing — see facet_missing);
    they're dropped BEFORE the shuffle — Ray's sort-groupby partition
    search crashes on null key columns, and the rows are dead weight."""
    counts = ds.map_batches(
        lambda t, _f=field: t.filter(pc.is_valid(t[_f])),
        batch_format="pyarrow").groupby(field).count()

    def flt(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t["count()"], mincount)
        if prefix is not None:
            m = pc.and_kleene(
                m, pc.starts_with(pc.cast(t[field], pa.string()),
                                  pattern=prefix))
        return t.filter(m)

    out = counts.map_batches(flt, batch_format="pyarrow").rename_columns(
        {"count()": "count"})
    if sort == "index":
        return out.sort(field).limit(limit)
    return out.sort(["count", field], descending=[True, False]).limit(limit)


def facet_missing(ds, field: str) -> int:
    """facet.missing: number of docs with no value in the field."""
    import ray

    def part(t: pa.Table) -> pa.Table:
        v = int(pc.sum(pc.cast(pc.is_null(t[field]),
                               pa.int64())).as_py() or 0)
        return pa.table({"c": pa.array([v], pa.int64())})

    return int(ds.map_batches(part, batch_format="pyarrow").sum("c") or 0)


def facet_range(ds, field: str, start, end, gap, agg_field: str | None = None):
    """Range facet (FacetRangeProcessor): bucket = floor((v-start)/gap),
    values outside [start, end) dropped; per-bucket count (+ optional sum)."""

    def bucketize(t: pa.Table) -> pa.Table:
        v = t[field].to_numpy(zero_copy_only=False).astype(np.float64)
        mask = (v >= start) & (v < end)
        b = np.floor((v[mask] - start) / gap).astype(np.int64)
        cols = {"bucket_start": b * gap + start}
        if agg_field:
            cols[agg_field] = t[agg_field].to_numpy(zero_copy_only=False)[mask]
        return pa.table({k: pa.array(c) for k, c in cols.items()})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    g = bucketed.groupby("bucket_start")
    if agg_field:
        from ray.data.aggregate import Count, Sum

        return g.aggregate(
            Count(alias_name="count"), Sum(agg_field, alias_name=f"sum_{agg_field}")
        ).sort("bucket_start")
    return g.count().sort("bucket_start")


def facet_interval(ds, field: str, intervals: list[tuple]):
    """Interval facet (facet.interval / IntervalFacets): count rows per
    ARBITRARY interval, Solr bracket syntax semantics — each interval is
    (label, lo, hi, include_lo, include_hi); intervals may overlap (a row
    counts in every interval containing it), unlike range facets.

    One vectorized comparison pass per interval per batch; the per-batch
    partial counts are the combiner, the groupby ships only
    (label, partial) rows.
    """
    spec = [(str(lb), lo, hi, bool(il), bool(ih))
            for lb, lo, hi, il, ih in intervals]

    def partial(t: pa.Table) -> pa.Table:
        v = t[field].to_numpy(zero_copy_only=False).astype(np.float64)
        labels, counts = [], []
        for lb, lo, hi, il, ih in spec:
            m = np.ones(v.size, dtype=bool)
            if lo is not None:
                m &= (v >= lo) if il else (v > lo)
            if hi is not None:
                m &= (v <= hi) if ih else (v < hi)
            labels.append(lb)
            counts.append(int(m.sum()))
        return pa.table({"interval": pa.array(labels, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("interval")
            .aggregate(Sum("n", alias_name="count"))
            .sort("interval"))


def pivot_facet(ds, fields: list[str], limit: int = 100):
    """Pivot facet (PivotFacet*.java): nested value combination counts.
    Rows with a null in any pivot field are dropped pre-shuffle (Solr
    pivots skip missing values; null keys also crash Ray's groupby)."""
    def live(t: pa.Table, _fs=tuple(fields)) -> pa.Table:
        m = pc.is_valid(t[_fs[0]])
        for f in _fs[1:]:
            m = pc.and_(m, pc.is_valid(t[f]))
        return t.filter(m)

    return (
        ds.map_batches(live, batch_format="pyarrow")
        .groupby(fields)
        .count()
        .sort(["count()", *fields], descending=[True] + [False] * len(fields))
        .limit(limit)
    )


def significant_terms(
    fg_ds, bg_ds, text_col: str = "text", analyzer: str = "simple",
    min_doc_freq: int = 2, limit: int = 20,
):
    """significantTerms: score terms overrepresented in the foreground subset
    vs the background corpus (SignificantTermsStream.java:55, which merges
    per-shard partials the same way).

    Fully distributed: per-batch partial doc-freq counts for BOTH corpora
    are unioned into one (term, fg_df, bg_df) stream, merged by a single
    groupby(term) (≤ one row per (term, batch) enters the shuffle — the
    combiner bounds it regardless of corpus size), scored vectorized inside
    map_batches, and top-k'd via sort().limit(). No vocabulary ever lands
    on the driver — a 10^8-term web-scale background works."""
    from ray.data.aggregate import Sum

    from solr_ray.analysis.chain import process_analyzer

    fg_total = int(fg_ds.count())
    bg_total = int(bg_ds.count())

    def partial(side: str):
        def fn(t: pa.Table) -> pa.Table:
            az = process_analyzer(analyzer)
            toks = az.tokenize_array(t[text_col])
            flat = toks.flatten()
            counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            parent = np.repeat(np.arange(len(t)), counts)
            df_tbl = (
                pa.table({"term": flat, "doc": pa.array(parent)})
                .group_by(["term", "doc"], use_threads=False)
                .aggregate([])
                .group_by("term", use_threads=False)
                .aggregate([("doc", "count")])
            )
            df = df_tbl["doc_count"].cast(pa.int64())
            zero = pa.array(np.zeros(df_tbl.num_rows, dtype=np.int64))
            return pa.table({
                "term": df_tbl["term"],
                "fg_df": df if side == "fg" else zero,
                "bg_df": df if side == "bg" else zero,
            })
        return fn

    merged = (
        fg_ds.map_batches(partial("fg"), batch_format="pyarrow")
        .union(bg_ds.map_batches(partial("bg"), batch_format="pyarrow"))
        .groupby("term")
        .aggregate(Sum("fg_df", alias_name="fg_df"),
                   Sum("bg_df", alias_name="bg_df"))
    )

    def score(t: pa.Table) -> pa.Table:
        fg = t["fg_df"].to_numpy(zero_copy_only=False).astype(np.int64)
        bg = t["bg_df"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = fg >= min_doc_freq
        fg, bg = fg[keep], bg[keep]
        # op order mirrors the SQL oracle: (fg/fg_n) / ((bg+1)/(bg_n+1))
        sc = (fg / fg_total) / ((bg + 1.0) / (bg_total + 1.0))
        return pa.table({
            "term": t["term"].filter(pa.array(keep)),
            "fg_df": pa.array(fg),
            "bg_df": pa.array(bg),
            "score": pa.array(sc, pa.float64()),
        })

    return (merged.map_batches(score, batch_format="pyarrow")
            .sort(["score", "term"], descending=[True, False])
            .limit(limit))


def combiner_groupby(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                     driver_merge_max_rows: int = 5_000_000):
    """Grouped aggregation with EXPLICIT per-batch combining — the
    "pre-aggregate inside map_batches before a groupby" scale pattern.

    aggs: out_name -> (col, fn), fn in sum|min|max|count (count ignores
    col). Each batch reduces to one partial row per key via ONE Arrow
    group_by; the partials (n_blocks x n_groups rows) merge in a single
    driver-side Arrow group_by when small (gated), else through a Ray
    groupby whose input is already combiner-sized. For low-cardinality
    keys this replaces a full sort-shuffle of the raw rows with a scan —
    Ray's generic Aggregate costs seconds of fixed shuffle work to
    reduce a 6-group table. Results are identical for integer sums
    (order-free); float sums may reassociate, same as any shuffle."""
    import ray
    import ray.data
    import pyarrow.compute as _pc
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        specs = []
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                cnt_src = keys[0]
                specs.append((cnt_src, "count"))
                cols[out] = f"{cnt_src}_count"
            else:
                specs.append((col, fn))
                cols[out] = f"{col}_{fn}"
        agg = t.group_by(keys, use_threads=False).aggregate(specs)
        out_cols = {k: agg[k] for k in keys}
        for out, src in cols.items():
            out_cols[out] = agg[src]
        return pa.table(out_cols)

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    parts, total = [], 0
    for ref in parts_ds.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue  # empty blocks can carry a degenerate schema
        parts.append(t)
        total += t.num_rows
        if total > driver_merge_max_rows:
            parts = None
            break
    if parts == []:
        parts = None  # fall through: empty input handled by Ray groupby
    if parts is None:
        g = parts_ds.groupby(keys)
        specs = []
        for out, (_col, fn) in aggs.items():
            cls = Sum if fn in ("sum", "count") else (
                Min if fn == "min" else Max)
            specs.append(cls(out, alias_name=out))
        return g.aggregate(*specs)
    merged = pa.concat_tables(parts, promote_options="permissive")\
        .group_by(keys, use_threads=False)
    specs = []
    for out, (_col, fn) in aggs.items():
        specs.append((out, "sum" if fn == "count" else
                      ("sum" if fn == "sum" else fn)))
    agg = merged.aggregate(specs)
    cols = {k: agg[k] for k in keys}
    for out, (_col, fn) in aggs.items():
        suffix = "sum" if fn in ("sum", "count") else fn
        cols[out] = agg[f"{out}_{suffix}"]
    return ray.data.from_arrow(pa.table(cols))


def relatedness_facet(ds, field: str, fg_spec: dict, limit: int = 10,
                      min_pop: float = 0.0):
    """Semantic-knowledge-graph relatedness per facet bucket
    (solr/core/src/java/org/apache/solr/search/facet/RelatednessAgg.java:
    computeRelatedness — z-score of the bucket's foreground count against
    the background probability, blended through five sigmoids, rounded to
    5 digits; fg/bg popularity are counts over the BACKGROUND size by
    design, RelatednessAgg.java:539).

    One distributed pass: per-batch partials count (bucket, bg, fg) with
    the foreground indicator evaluated inline; a small groupby(field)
    merges; scoring is vectorized. Buckets sort (relatedness desc, value
    asc); buckets under min_pop get -inf relatedness like the reference.
    """
    from ray.data.aggregate import Sum

    from solr_ray.ops.queryfilter import compile_filter

    pred = compile_filter(fg_spec)

    def part(t: pa.Table) -> pa.Table:
        m = pred(t)
        fg = pc.cast(pc.fill_null(m, False), pa.int64())
        agg = (pa.table({field: t[field], "fg": fg,
                         "one": pa.array(np.ones(len(t), np.int64))})
               .group_by(field, use_threads=False)
               .aggregate([("fg", "sum"), ("one", "sum")]))
        return pa.table({field: agg[field], "fg_count": agg["fg_sum"],
                         "bg_count": agg["one_sum"]})

    merged = (ds.map_batches(part, batch_format="pyarrow")
              .groupby(field)
              .aggregate(Sum("fg_count", alias_name="fg_count"),
                         Sum("bg_count", alias_name="bg_count")))
    bg_size = ds.count()
    fg_size = int(merged.sum("fg_count") or 0)

    def score(t: pa.Table) -> pa.Table:
        fgc = t["fg_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        bgc = t["bg_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        fg_size_d = float(fg_size)
        bg_size_d = float(bg_size)
        bg_prob = bgc / bg_size_d
        num = fgc - fg_size_d * bg_prob
        denom = np.sqrt(fg_size_d * bg_prob * (1 - bg_prob))
        denom = np.where(denom == 0, 1e-10, denom)
        z = num / denom

        def sig(x, offset, scale):
            return (x + offset) / (scale + np.abs(x + offset))

        result = (0.2 * sig(z, -80, 50) + 0.2 * sig(z, -30, 30)
                  + 0.2 * sig(z, 0, 30) + 0.2 * sig(z, 30, 30)
                  + 0.2 * sig(z, 80, 50))
        r5 = np.floor(result * 1e5 + 0.5) / 1e5  # Java Math.round
        fg_pop = np.floor((fgc / bg_size_d) * 1e5 + 0.5) / 1e5
        bg_pop = np.floor((bgc / bg_size_d) * 1e5 + 0.5) / 1e5
        r5 = np.where((fg_pop < min_pop) | (bg_pop < min_pop),
                      -np.inf, r5)
        return pa.table({
            field: t[field],
            "fg_count": pc.cast(t["fg_count"], pa.int64()),
            "bg_count": pc.cast(t["bg_count"], pa.int64()),
            "fg_pop": pa.array(fg_pop, pa.float64()),
            "bg_pop": pa.array(bg_pop, pa.float64()),
            "relatedness": pa.array(r5, pa.float64()),
        })

    return (merged.map_batches(score, batch_format="pyarrow")
            .sort(["relatedness", field], descending=[True, False])
            .limit(limit))
