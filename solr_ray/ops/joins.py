"""Joins and lookups.

Reference mapping (SURVEY.md §2.4):
- hashJoin / outerHashJoin (HashJoinStream.java:35-56 — small side fully read
  into an in-memory map at open): broadcast_hash_join — ray.put the small
  side ONCE, probe with a pandas merge per batch. No shuffle.
- innerJoin / leftOuterJoin (sorted-merge, BiJoinStream): shuffle_join —
  Ray's native hash-partitioned Dataset.join.
- {!join from to} semi-join (JoinQParserPlugin.java): semi_join / anti_join —
  broadcast the key SET and filter inside map_batches.
- fetch (FetchStream.java:52 — batched by-key field lookup): fetch_fields.
- cartesianProduct (CartesianProductStream.java:47 — unnest a list field):
  explode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_hash_join(ds, small: pd.DataFrame, on: str | list[str],
                        how: str = "inner", suffix: str = "_r"):
    """Small side broadcast once; per-batch pandas merge probe."""
    import ray

    assert how in ("inner", "left")
    ref = ray.put(small)
    on_cols = [on] if isinstance(on, str) else list(on)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        return batch.merge(s, on=on_cols, how=how, suffixes=("", suffix))

    return ds.map_batches(probe, batch_format="pandas")


def shuffle_join(left, right, on: str | list[str], how: str = "inner",
                 num_partitions: int = 16):
    """Both-sides-large join: Ray's hash-partitioned Dataset.join."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    return left.join(right, join_type=how, num_partitions=num_partitions, on=on_t)


def _key_array(keys) -> pa.Array:
    """Normalize a key side (iterable / Dataset / DataFrame column) into a
    deduped Arrow array for `pc.is_in` (one vectorized kernel call per batch
    instead of a per-row python membership loop — ~10-100x on wide batches).
    The key side is broadcast, so it must be small (the {!join} small side);
    large key sets belong in shuffle_join."""
    if hasattr(keys, "to_pandas"):
        keys = keys.to_pandas().iloc[:, 0].tolist()
    return pa.array(sorted(set(keys)))


def semi_join(ds, keys, on: str):
    """Rows of ds whose `on` value appears in keys (index-time {!join}
    semantics). keys: iterable or Dataset of a single column."""
    import ray

    ref = ray.put(_key_array(keys))

    def f(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        return t.filter(pc.is_in(t[on], value_set=s))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join(ds, keys, on: str):
    """complement/ComplementStream semantics: rows whose key is NOT in keys."""
    import ray

    ref = ray.put(_key_array(keys))

    def f(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        return t.filter(pc.invert(pc.is_in(t[on], value_set=s)))

    return ds.map_batches(f, batch_format="pyarrow")


def fetch_fields(ds, lookup: pd.DataFrame, on: str, fields: list[str]):
    """FetchStream: enrich each row with `fields` from lookup by key
    (left join keeping all rows; missing keys -> nulls)."""
    return broadcast_hash_join(ds, lookup[[on, *fields]], on, how="left")


def explode(ds, list_col: str, out_col: str | None = None):
    """cartesianProduct: one output row per element of the list column,
    other columns repeated. Vectorized via Arrow list flatten."""
    out_col = out_col or list_col

    def f(t: pa.Table) -> pa.Table:
        col = t[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype(np.float64), nan=0).astype(np.int64)
        parent = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        base = t.drop_columns([list_col]).take(pa.array(parent))
        return base.append_column(out_col, col.flatten())

    return ds.map_batches(f, batch_format="pyarrow")


def intersect_keys(left, right, on: str):
    """intersect/IntersectStream: left rows whose key exists in right."""
    keys = right.unique(on)
    return semi_join(left, keys, on)
