"""Stream-shaped operators over an ordered, partitioned log.

The reference has NO window/watermark semantics (SURVEY.md §2.9): its
streaming layer is micro-batch (daemon/DaemonStream re-runs, topic/TopicStream
checkpoints on monotone _version_, timeseries/TimeSeriesStream buckets a date
range). Ray-native equivalents treat the events table as an ordered log:

- timeseries: date-trunc bucketing + grouped aggregates (TimeSeriesStream.java:52)
- tumbling/sliding/session windows per key: groupby(key).map_groups over the
  ts-sorted group (ORDERING ASSUMPTION: all rows of one key fit one group and
  are sorted inside the UDF; at 100 TB, key-partition + time-range-partition
  the log first)
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


def _hash_bucket(t: pa.Table, key_col: str, num_buckets: int,
                 out_col: str = "__wbucket") -> pa.Table:
    """Append a hash-bucket column so per-key window ops shuffle into
    num_buckets groups instead of one python group per key; each key
    lives in exactly one bucket (co-location preserved)."""
    col = t[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        b = (col.to_numpy(zero_copy_only=False).astype(np.uint64)
             % num_buckets).astype(np.int64)
    else:
        from solr_ray.stages.docids import stable_hash64

        b = (np.asarray(stable_hash64(col), dtype=np.uint64)
             % num_buckets).astype(np.int64)
    return t.append_column(out_col, pa.array(b))


def tumbling_window(ds, key_col: str, ts_col: str, width_us: int,
                    value_col: str, agg: str = "sum"):
    """Per-key tumbling windows of fixed width (event-time, no watermark —
    batch log semantics). Returns (key, window_start, agg value)."""

    num_buckets = 64

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        # all keys of the bucket in ONE vectorized pandas groupby
        ts_us = g[ts_col].astype("datetime64[us]").astype("int64")
        w = (ts_us // width_us) * width_us
        out = (g.assign(__w=w)
               .groupby([key_col, "__w"], sort=True)[value_col].agg(agg))
        idx = out.index
        return pd.DataFrame({
            key_col: idx.get_level_values(0),
            "window_start": pd.to_datetime(idx.get_level_values(1),
                                           unit="us"),
            f"{agg}_{value_col}": out.to_numpy(),
        })

    return (ds.map_batches(
                lambda t: _hash_bucket(t, key_col, num_buckets),
                batch_format="pyarrow")
            .groupby("__wbucket")
            .map_groups(windows, batch_format="pandas"))


def sliding_window(ds, key_col: str, ts_col: str, value_col: str, n: int,
                   agg: str = "mean", tie_col: str | None = None):
    """Per-key rolling agg (mean|sum|min|max) over the last n events
    (ts-ordered; tie_col pins the order of equal timestamps — without it,
    ties keep stable input order, which no SQL window can reproduce).
    agg="sum" over integer values is exact (no float accumulation), which
    makes it SQL-oracle-able bit-for-bit."""

    keys = [ts_col] if tie_col is None else [ts_col, tie_col]

    num_buckets = 64

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key_col, *keys], kind="stable")
             .drop(columns=["__wbucket"]).copy())
        r = (g.groupby(key_col, sort=False)[value_col]
             .rolling(n, min_periods=1))
        vals = getattr(r, agg)().reset_index(level=0, drop=True)
        g[f"rolling_{value_col}"] = vals
        return g

    return (ds.map_batches(
                lambda t: _hash_bucket(t, key_col, num_buckets),
                batch_format="pyarrow")
            .groupby("__wbucket")
            .map_groups(roll, batch_format="pandas"))


def session_windows(ds, key_col: str, ts_col: str, gap_us: int,
                    num_buckets: int = 64):
    """Per-key session windows: a new session starts when the gap to the
    previous event exceeds gap_us. Returns per-session rows.

    Keys are hash-bucketed so the shuffle produces num_buckets groups
    (not one python UDF call per key); inside a bucket the sessionize is
    ONE vectorized pass over (key, ts)-sorted rows — new-session = key
    change OR gap exceeded — so per-key work never touches the
    interpreter. Same co-location guarantee (a key lives in exactly one
    bucket), ~25x fewer UDF invocations on a 1.5k-key log."""

    def bucketize(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            b = (col.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % num_buckets).astype(np.int64)
        else:
            from solr_ray.stages.docids import stable_hash64

            b = (np.asarray(stable_hash64(col), dtype=np.uint64)
                 % num_buckets).astype(np.int64)
        return t.append_column("__sbucket", pa.array(b))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="stable")
        ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = g[key_col].to_numpy()
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (keys[1:] != keys[:-1]) | (
                (ts[1:] - ts[:-1]) > gap_us)
        sid = np.cumsum(new) - 1
        df = pd.DataFrame({"k": keys, "sid": sid, "ts": ts})
        agg = df.groupby("sid", sort=True).agg(
            k=("k", "first"), mn=("ts", "min"), mx=("ts", "max"),
            n=("ts", "count"))
        return pd.DataFrame({
            key_col: agg["k"].to_numpy(),
            "session_start": pd.to_datetime(agg["mn"], unit="us"),
            "session_end": pd.to_datetime(agg["mx"], unit="us"),
            "n_events": agg["n"].to_numpy(),
        })

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__sbucket")
            .map_groups(sessions, batch_format="pandas"))


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
            v = pc.cast(t[ts_col], pa.int64())
            return t.filter(pc.greater(v, pa.scalar(last)))

        out = ds.map_batches(newer, batch_format="pyarrow")
        return out

    def commit(self, max_seen: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"max_seen": int(max_seen)}, f)
        os.replace(tmp, self.path)
