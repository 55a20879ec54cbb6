"""Stream-shaped operators over an ordered, partitioned log.

The reference has NO window/watermark semantics (SURVEY.md §2.9): its
streaming layer is micro-batch (daemon/DaemonStream re-runs, topic/TopicStream
checkpoints on monotone _version_, timeseries/TimeSeriesStream buckets a date
range). Ray-native equivalents treat the events table as an ordered log:

- timeseries: date-trunc bucketing + grouped aggregates (TimeSeriesStream.java:52)
- tumbling windows: a pure combiner groupby over (key, window) — no
  co-location requirement at all.
- session/sliding windows per key: COMPOSITE (key-hash bucket, coarse
  time slice) shuffle key, so a group holds one bucket of keys over one
  slice of the log — per-group peak rows stay bounded as the log grows.
  Cross-slice exactness via boundary stitching (sessions: each key's
  first/last sessions per slice; sliding: head/tail rows) — one extra
  tiny pass over O(keys x slices) rows, gated onto the driver below 5M.
- topic-style incremental consumption: a checkpointed filter ts > last_seen.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


_TRUNC = {
    "hour": "h", "day": "D", "week": "W", "month": "M", "minute": "min",
}


def _push_shuffle(ds):
    """Scoped SORT_SHUFFLE_PUSH_BASED on THIS dataset's captured context
    (Ray snapshots DataContext at dataset creation, so mutating the
    global after read_parquet does nothing — the dataset's own context is
    the one execution reads; restored by the caller's finally). The
    composite-key window shuffles move the whole event log once, and
    push-based sort measured ~1.8x faster than the default pull-based
    sort on them (1.48 s vs 2.64 s warm, sf0.1 sessions) — same finding
    as the index build's bucket shuffle. Scoped, never leaked: round 3
    measured a leaked strategy taxing every later small groupby."""
    from ray.data.context import ShuffleStrategy

    ctx = ds.context
    saved = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    return ctx, saved


def _ts_int_us(col):
    """int64 MICROSECOND view of a column. Timestamp columns carry their
    storage unit into a bare int64 cast (ns for pandas-sourced blocks),
    which would make slice_us/gap_us math 1000x off — normalize to
    timestamp('us') first. Integer columns pass through (already epoch-us
    by contract)."""
    import pyarrow.compute as pc

    typ = col.type
    if pa.types.is_timestamp(typ):
        col = pc.cast(col, pa.timestamp("us", tz=typ.tz))
    return pc.cast(col, pa.int64())


def timeseries(ds, ts_col: str, gap: str, aggs: dict[str, tuple[str, str]],
               driver_merge_max_rows: int = 5_000_000):
    """Date-bucketed metrics. gap: hour|minute|day|week|month.
    aggs: out_name -> (col, fn) with fn in sum|mean|min|max|count.

    Combiner shape (TimeSeriesStream.java:52 buckets a bounded date
    range, so the bucket count is small by contract): each batch
    pre-aggregates its rows to one partial row per bucket, and the
    partials — at most n_blocks x n_buckets rows — merge in one Arrow
    group_by on the driver, the same gated pattern as the index build's
    global-stats merge. A generic Ray groupby here pays ~2-4 s of
    sort-shuffle fixed cost to reduce a few hundred output rows. If the
    partials exceed driver_merge_max_rows (huge range x tiny gap), fall
    back to the distributed groupby."""
    import pyarrow.compute as pc
    import ray
    import ray.data
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    unit = _TRUNC[gap]

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        b = t[ts_col].dt.to_period(unit).dt.start_time
        g = t.groupby(b, sort=False)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                cols[out] = g[ts_col].size()
            elif fn == "mean":
                cols[f"__{out}_s"] = g[col].sum()
                cols[f"__{out}_c"] = g[col].count()
            else:
                cols[out] = getattr(g[col], fn)()
        out_df = pd.DataFrame(cols)
        out_df.insert(0, "bucket", out_df.index)
        return out_df.reset_index(drop=True)

    parts_ds = ds.map_batches(partial, batch_format="pandas")
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

    if parts is not None and not parts:
        # empty input: typed empty result (Ray loses the schema of empty
        # map outputs, so build it from the agg spec + input schema)
        sch = ds.schema()
        in_types = dict(zip(sch.names, sch.types)) if sch else {}
        cols = {"bucket": pa.array([], pa.timestamp("ns"))}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                ty = pa.int64()
            elif fn == "mean":
                ty = pa.float64()
            else:
                ty = in_types.get(col, pa.float64())
            cols[out] = pa.array([], ty)
        return ray.data.from_arrow(pa.table(cols))

    if parts is None:
        # distributed fallback: merge the partials with a Ray groupby
        merged = parts_ds.groupby("bucket")
        specs = []
        for out, (_col, fn) in aggs.items():
            if fn == "count" or fn == "sum":
                specs.append(Sum(out, alias_name=out))
            elif fn == "mean":
                specs.append(Sum(f"__{out}_s", alias_name=f"__{out}_s"))
                specs.append(Sum(f"__{out}_c", alias_name=f"__{out}_c"))
            else:
                specs.append((Min if fn == "min" else Max)(
                    out, alias_name=out))
        got = merged.aggregate(*specs)
        if any(fn == "mean" for _o, (_c, fn) in aggs.items()):
            def finish(t: pa.Table) -> pa.Table:
                cols = {"bucket": t["bucket"]}
                for out, (_col, fn) in aggs.items():
                    cols[out] = (pc.divide(
                        pc.cast(t[f"__{out}_s"], pa.float64()),
                        pc.cast(t[f"__{out}_c"], pa.float64()))
                        if fn == "mean" else t[out])
                return pa.table(cols)

            got = got.map_batches(finish, batch_format="pyarrow")
        return got.sort("bucket")

    merged = pa.concat_tables(parts).group_by("bucket", use_threads=False)
    specs = []
    for out, (_col, fn) in aggs.items():
        if fn in ("count", "sum"):
            specs.append((out, "sum"))
        elif fn == "mean":
            specs.append((f"__{out}_s", "sum"))
            specs.append((f"__{out}_c", "sum"))
        else:
            specs.append((out, fn))
    agg = merged.aggregate(specs)
    cols = {"bucket": agg["bucket"]}
    for out, (_col, fn) in aggs.items():
        if fn in ("count", "sum"):
            cols[out] = agg[f"{out}_sum"]
        elif fn == "mean":
            cols[out] = pc.divide(
                pc.cast(agg[f"__{out}_s_sum"], pa.float64()),
                pc.cast(agg[f"__{out}_c_sum"], pa.float64()))
        else:
            cols[out] = agg[f"{out}_{fn}"]
    out_t = pa.table(cols)
    order = pc.sort_indices(out_t, sort_keys=[("bucket", "ascending")])
    return ray.data.from_arrow(out_t.take(order))


def _hash_bucket(t: pa.Table, key_col, num_buckets: int,
                 out_col: str = "__wbucket") -> pa.Table:
    """Append a hash-bucket column so per-key window ops shuffle into
    num_buckets groups instead of one python group per key; each key
    lives in exactly one bucket (co-location preserved). key_col may be a
    list (composite partition key — hashes combine multiplicatively)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for kc in keys:
        col = t[kc]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            ch = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            from solr_ray.stages.docids import stable_hash64

            ch = np.asarray(stable_hash64(col), dtype=np.uint64)
        h = h * np.uint64(0x9E3779B97F4A7C15) + ch
    b = (h % num_buckets).astype(np.int64)
    return t.append_column(out_col, pa.array(b))


def tumbling_window(ds, key_col: str, ts_col: str, width_us: int,
                    value_col: str, agg: str = "sum"):
    """Per-key tumbling windows of fixed width (event-time, no watermark —
    batch log semantics). Returns (key, window_start, agg value).

    Pure combiner shape — every (key, window) is independent, so each
    batch pre-aggregates to one partial row per (key, window) and a
    grouped Ray aggregate merges the partials. No bucket ever
    materializes more than a block of (key, window) partials, so there
    is no per-group size ceiling at any corpus size (the old fixed
    64-bucket map_groups held ~1/64 of the log per UDF call)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    if agg not in ("sum", "mean", "min", "max", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    out_name = f"{agg}_{value_col}"

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        ts_us = t[ts_col].astype("datetime64[us]").astype("int64")
        w = (ts_us // width_us) * width_us
        g = t.assign(__w=w).groupby([key_col, "__w"], sort=False)
        cols = {}
        if agg == "count":
            cols["__p"] = g[value_col].count()
        elif agg == "mean":
            cols["__s"] = g[value_col].sum()
            cols["__c"] = g[value_col].count()
        else:
            cols["__p"] = getattr(g[value_col], agg)()
        out = pd.DataFrame(cols)
        out.insert(0, key_col, out.index.get_level_values(0))
        out.insert(1, "__w", out.index.get_level_values(1))
        return out.reset_index(drop=True)

    parts = ds.map_batches(partial, batch_format="pandas")
    if agg == "mean":
        specs = [Sum("__s", alias_name="__s"), Sum("__c", alias_name="__c")]
    elif agg in ("sum", "count"):
        specs = [Sum("__p", alias_name="__p")]
    else:
        specs = [(Min if agg == "min" else Max)("__p", alias_name="__p")]
    merged = parts.groupby([key_col, "__w"]).aggregate(*specs)

    def finish(t: pa.Table) -> pa.Table:
        if agg == "mean":
            val = pc.divide(pc.cast(t["__s"], pa.float64()),
                            pc.cast(t["__c"], pa.float64()))
        else:
            val = t["__p"]
        return pa.table({
            key_col: t[key_col],
            "window_start": pc.cast(
                pc.multiply(t["__w"], pa.scalar(1000)), pa.timestamp("ns")),
            out_name: val,
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def sliding_window(ds, key_col: str, ts_col: str, value_col: str, n: int,
                   agg: str = "mean", tie_col: str | None = None,
                   num_buckets: int = 64, slice_us: int | None = None):
    """Per-key rolling agg (mean|sum|min|max) over the last n events
    (ts-ordered; tie_col pins the order of equal timestamps — without it,
    ties keep stable input order, which no SQL window can reproduce).
    agg="sum" over integer values is exact (no float accumulation), which
    makes it SQL-oracle-able bit-for-bit.

    Scale shape: shuffle key is COMPOSITE (key-hash bucket, coarse time
    slice), so no group ever holds more than one bucket x one slice of
    the log. Exactness across slice edges via a head/tail fix-up pass:
    within a slice, rows at per-key position >= n-1 have their full
    window in-slice ("settled"); the first n-1 rows per key ("heads")
    lack history, and the last n-1 per key ("tails") are the history the
    NEXT slice's heads need. One extra groupby over heads+tails only —
    O(n * keys * slices) rows, independent of slice size — recomputes the
    heads over the tail suffixes of earlier slices. Walking back from any
    head consumes at most n-1 predecessors, and each earlier slice
    contributes its full suffix (min(len, n-1) rows) before any interior
    gap can be reached, so the recomputed windows see exactly the true
    preceding events. Integer sums are therefore bit-identical to an
    unsliced run; float rolling aggregates match to accumulation order.

    slice_us defaults to one day.

    key_col may be a list (composite partition key); tie_col may be a
    list of additional order columns; agg also accepts "count" (the SQL
    frame-aggregate delegation path in sql.py uses all three)."""
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    ties = ([] if tie_col is None
            else [tie_col] if isinstance(tie_col, str) else list(tie_col))
    order = [ts_col, *ties]
    if slice_us is None:
        slice_us = 86_400_000_000
    out_col = f"rolling_{value_col}"

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _hash_bucket(t, key_cols, num_buckets)
        ts_us = _ts_int_us(t[ts_col])
        return t.append_column(
            "__slice", pc.cast(
                pc.floor(pc.divide(pc.cast(ts_us, pa.float64()),
                                   pa.scalar(float(slice_us)))), pa.int64()))

    def roll_slice(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([*key_cols, *order], kind="stable")
             .drop(columns=["__slice"]).copy())
        grp = g.groupby(key_cols, sort=False)
        r = grp[value_col].rolling(n, min_periods=1)
        g[out_col] = getattr(r, agg)().reset_index(
            level=list(range(len(key_cols))), drop=True)
        pos = grp.cumcount().to_numpy()
        size = grp[value_col].transform("size").to_numpy()
        g["__head"] = pos < (n - 1)
        g["__tail"] = pos >= (size - (n - 1))
        return g

    def fixup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*key_cols, *order], kind="stable").copy()
        grp = g.groupby(key_cols, sort=False)
        r = grp[value_col].rolling(n, min_periods=1)
        g[out_col] = getattr(r, agg)().reset_index(
            level=list(range(len(key_cols))), drop=True)
        return (g[g["__head"]]
                .drop(columns=["__head", "__tail", "__wbucket"]))

    ctx, saved = _push_shuffle(ds)
    try:
        per_slice = (ds.map_batches(bucketize, batch_format="pyarrow")
                     .groupby(["__wbucket", "__slice"])
                     .map_groups(roll_slice, batch_format="pandas")
                     .materialize())  # two consumers: settled + fix-up
    finally:
        ctx.shuffle_strategy = saved
    keep = tuple(ds.schema().names) + (out_col,)

    def take_settled(t: pa.Table, _k=keep) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(t["__head"])).select(list(_k))

    def take_boundary(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.or_(t["__head"], t["__tail"]))

    settled = per_slice.map_batches(take_settled, batch_format="pyarrow")
    boundary = per_slice.map_batches(take_boundary, batch_format="pyarrow")

    # fix-up rows are O(n x keys x slices), independent of slice size —
    # under the gate one driver pandas pass replaces the Ray sort-shuffle's
    # multi-second fixed cost (same gating as session_windows' stitch)
    import ray
    import ray.data

    gate = 5_000_000
    parts, total = [], 0
    for ref in boundary.to_arrow_refs():
        t = ray.get(ref)
        if not isinstance(t, pa.Table):  # tiny inputs can stay pandas
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0:
            continue
        parts.append(t)
        total += t.num_rows
        if total > gate:
            parts = None
            break
    if parts is None:
        fixed = (boundary.groupby("__wbucket")
                 .map_groups(fixup, batch_format="pandas")
                 .map_batches(lambda t, _k=keep: t.select(list(_k)),
                              batch_format="pyarrow"))
    elif parts:
        df = fixup(pa.concat_tables(parts).to_pandas())
        fixed = ray.data.from_arrow(pa.Table.from_pandas(
            df[list(keep)], preserve_index=False))
    else:
        fixed = None
    return settled.union(fixed) if fixed is not None else settled


def session_windows(ds, key_col: str, ts_col: str, gap_us: int,
                    num_buckets: int = 64, slice_us: int | None = None):
    """Per-key session windows: a new session starts when the gap to the
    previous event exceeds gap_us. Returns per-session rows
    (key, session_start, session_end, n_events).

    Scale shape: the shuffle key is COMPOSITE (key-hash bucket, coarse
    time slice), so a group holds one bucket of keys over ONE slice of
    the log — per-group peak rows stay bounded as the log grows in time
    (grow num_buckets for key-dimension growth). Inside a group the
    sessionize is one vectorized pass over (key, ts)-sorted rows.

    Slicing is EXACT via boundary stitching: per slice, each key's first
    and last sessions are the only ones that can merge across a slice
    edge (interior sessions are already > gap from their slice-mates, and
    everything in later slices is farther). Those boundary sessions go
    through one extra tiny groupby — session rows, not event rows — that
    chain-merges runs whose gap <= gap_us; interior sessions pass through
    untouched. Result is bit-identical to an unsliced run.

    slice_us defaults to 4096 * gap_us (a slice must exceed the gap;
    enforced)."""
    if slice_us is None:
        slice_us = gap_us * 4096
    if slice_us <= gap_us:
        raise ValueError("slice_us must exceed gap_us")

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _hash_bucket(t, key_col, num_buckets, out_col="__sbucket")
        ts_us = _ts_int_us(t[ts_col])
        return t.append_column(
            "__slice", pc.cast(
                pc.floor(pc.divide(pc.cast(ts_us, pa.float64()),
                                   pa.scalar(float(slice_us)))), pa.int64()))

    def _merge_runs(keys, mn, mx, n, bucket):
        """Vectorized chain-merge of (key, start)-sorted session rows:
        sessions of one key merge while start - prev_end <= gap_us."""
        new = np.ones(len(mn), dtype=bool)
        if len(mn) > 1:
            new[1:] = (keys[1:] != keys[:-1]) | (
                (mn[1:] - mx[:-1]) > gap_us)
        sid = np.cumsum(new) - 1
        df = pd.DataFrame({"k": keys, "sid": sid, "mn": mn, "mx": mx,
                           "n": n, "b": bucket})
        agg = df.groupby("sid", sort=True).agg(
            k=("k", "first"), mn=("mn", "min"), mx=("mx", "max"),
            n=("n", "sum"), b=("b", "first"))
        return agg

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        """Sessionize one (bucket, slice) group; flag each key's first and
        last sessions as boundary candidates for the stitch pass."""
        g = g.sort_values([key_col, ts_col], kind="stable")
        ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = g[key_col].to_numpy()
        bucket = g["__sbucket"].to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (keys[1:] != keys[:-1]) | (
                (ts[1:] - ts[:-1]) > gap_us)
        sid = np.cumsum(new) - 1
        df = pd.DataFrame({"k": keys, "sid": sid, "ts": ts, "b": bucket})
        agg = df.groupby("sid", sort=True).agg(
            k=("k", "first"), mn=("ts", "min"), mx=("ts", "max"),
            n=("ts", "count"), b=("b", "first"))
        kk = agg["k"].to_numpy()
        first = np.ones(len(kk), dtype=bool)
        if len(kk) > 1:
            first[1:] = kk[1:] != kk[:-1]
        last = np.ones(len(kk), dtype=bool)
        if len(kk) > 1:
            last[:-1] = kk[1:] != kk[:-1]
        return pd.DataFrame({
            key_col: kk,
            "__mn": agg["mn"].to_numpy(),
            "__mx": agg["mx"].to_numpy(),
            "n_events": agg["n"].to_numpy().astype(np.int64),
            "__sbucket": agg["b"].to_numpy(),
            "__bnd": first | last,
        })

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__mn"], kind="stable")
        agg = _merge_runs(g[key_col].to_numpy(), g["__mn"].to_numpy(),
                          g["__mx"].to_numpy(), g["n_events"].to_numpy(),
                          g["__sbucket"].to_numpy())
        return pd.DataFrame({
            key_col: agg["k"].to_numpy(),
            "__mn": agg["mn"].to_numpy(),
            "__mx": agg["mx"].to_numpy(),
            "n_events": agg["n"].to_numpy().astype(np.int64),
        })

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            key_col: t[key_col],
            "session_start": pc.cast(
                pc.multiply(t["__mn"], pa.scalar(1000)), pa.timestamp("ns")),
            "session_end": pc.cast(
                pc.multiply(t["__mx"], pa.scalar(1000)), pa.timestamp("ns")),
            "n_events": t["n_events"],
        })

    def take_interior(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(t["__bnd"])).select(
            [key_col, "__mn", "__mx", "n_events"])

    def take_boundary(t: pa.Table) -> pa.Table:
        return t.filter(t["__bnd"])

    ctx, saved = _push_shuffle(ds)
    try:
        per_slice = (ds.map_batches(bucketize, batch_format="pyarrow")
                     .groupby(["__sbucket", "__slice"])
                     .map_groups(sessions, batch_format="pandas")
                     .materialize())  # two consumers: interior + boundary
    finally:
        ctx.shuffle_strategy = saved
    interior = per_slice.map_batches(take_interior, batch_format="pyarrow")
    boundary = per_slice.map_batches(take_boundary, batch_format="pyarrow")

    # Stitch path is gated like combiner_groupby's merge: boundary rows
    # are SESSION rows (<= 2 x keys x slices, independent of event
    # count) — under the gate, one driver numpy chain-merge replaces a
    # whole Ray sort-shuffle (~2-4 s fixed cost on tiny inputs);
    # above it, the distributed groupby(__sbucket) stitch runs.
    import ray
    import ray.data

    gate = 5_000_000
    parts, total = [], 0
    for ref in boundary.to_arrow_refs():
        t = ray.get(ref)
        if not isinstance(t, pa.Table):  # tiny inputs can stay pandas
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0:
            continue
        parts.append(t)
        total += t.num_rows
        if total > gate:
            parts = None
            break
    if parts is None:
        stitched = (boundary.groupby("__sbucket")
                    .map_groups(stitch, batch_format="pandas"))
    else:
        if parts:
            b = pa.concat_tables(parts)
            df = stitch(b.to_pandas())
            stitched = ray.data.from_arrow(pa.Table.from_pandas(
                df, preserve_index=False))
        else:
            stitched = None
    if stitched is None:
        out = interior
    else:
        out = interior.union(stitched)
    return out.map_batches(finish, batch_format="pyarrow")


class TopicCheckpoint:
    """topic/TopicStream semantics (TopicStream.java:75-78,111): pull only
    rows newer than the stored checkpoint, then advance it. Ordering
    assumption: the watermark column is monotone per run (the reference
    assumes monotone _version_; here, event ts). At-least-once on crash
    (checkpoint advances only after a successful read), same as the
    reference."""

    def __init__(self, path: str):
        self.path = path

    def read_checkpoint(self) -> int:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return int(json.load(f)["max_seen"])
        return -(1 << 62)

    def pull(self, ds, ts_col: str):
        import pyarrow.compute as pc

        last = self.read_checkpoint()

        def newer(t: pa.Table) -> pa.Table:
            # microsecond watermark on both sides (commit stores us too;
            # a bare int64 cast would compare storage units — ns for
            # pandas-sourced blocks — against a us checkpoint)
            v = _ts_int_us(t[ts_col])
            return t.filter(pc.greater(v, pa.scalar(last)))

        out = ds.map_batches(newer, batch_format="pyarrow")
        return out

    def commit(self, max_seen: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"max_seen": int(max_seen)}, f)
        os.replace(tmp, self.path)


class DaemonRunner:
    """daemon/DaemonStream analog (DaemonStream.java:48-66 wraps an inner
    stream and re-runs it on an interval, each run consuming from the
    topic checkpoint). Batch semantics — no sleeping scheduler, the
    caller owns the cadence: each run_once() pulls only rows newer than
    the checkpoint, applies the pipeline to the increment, advances the
    checkpoint to the max watermark seen (at-least-once: commit happens
    AFTER the pipeline consumes), and returns the increment's result.
    run_until_idle() loops until a pull yields no rows.

    The increment is materialized before the pipeline sees it (it is
    consumed twice: watermark probe + user pipeline), which is the
    bounded-new-data contract a checkpointed consumer relies on."""

    def __init__(self, checkpoint_path: str, ts_col: str, pipeline):
        self.topic = TopicCheckpoint(checkpoint_path)
        self.ts_col = ts_col
        self.pipeline = pipeline

    def run_once(self, ds):
        """One daemon iteration. Returns (result, n_new_rows)."""
        import pyarrow.compute as pc

        new = self.topic.pull(ds, self.ts_col).materialize()
        n = new.count()
        if n == 0:
            return None, 0

        def mx(t: pa.Table) -> pa.Table:
            v = _ts_int_us(t[self.ts_col])
            m = pc.max(v).as_py()
            return pa.table({"m": pa.array(
                [m if m is not None else -(1 << 62)], pa.int64())})

        hi = max(r["m"] for r in
                 new.map_batches(mx, batch_format="pyarrow").take_all())
        out = self.pipeline(new)
        self.topic.commit(hi)
        return out, n

    def run_until_idle(self, ds_factory, max_runs: int = 100):
        """Re-run until a pull returns nothing. ds_factory is called per
        iteration (a fresh read sees newly landed data, like the daemon's
        inner stream re-opening). Returns the per-run results."""
        results = []
        for _ in range(max_runs):
            out, n = self.run_once(ds_factory())
            if n == 0:
                break
            results.append(out)
        return results
