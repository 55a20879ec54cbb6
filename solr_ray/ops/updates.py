"""Atomic-update semantics: merge a small batch of partial documents onto a
large stored table by unique key.

Reference: AtomicUpdateDocumentMerger
(solr/core/src/java/org/apache/solr/update/processor/AtomicUpdateDocumentMerger.java:68,164-196)
supports per-field ops ``set / inc / add / add-distinct / remove /
removeregex`` applied to the currently-stored document under its unique key.
Batch equivalent: the updates table is the SMALL side (one row per key, one
column per updated field) broadcast once via ``ray.put``; the stored table
streams through ``map_batches`` and each batch left-merges its keys against
the update map — no shuffle of the big side, mirroring HashJoinStream's
broadcast pattern (HashJoinStream.java:35-56).

Supported ops (field -> (op, column-in-updates)):
- "set":  replace value (missing key -> unchanged)
- "inc":  numeric increment
- "add":  append to a list column
- "add_distinct": append if absent
- "remove": remove value from a list column
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def atomic_update(ds, updates: pd.DataFrame, key: str,
                  ops: dict[str, str]):
    """Apply per-field atomic ops from `updates` (indexed by `key`) onto ds.

    ops: {field_name: op} where op in set|inc|add|add_distinct|remove and
    `updates` carries a column per field with the operand value.
    """
    import ray

    assert key in updates.columns
    for f in ops:
        assert f in updates.columns, f
    up = updates.drop_duplicates(subset=[key], keep="last").set_index(key)
    ref = ray.put(up)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        u = ray.get(ref)
        hit = batch[key].isin(u.index)
        if not hit.any():
            return batch
        batch = batch.copy()
        keys = batch.loc[hit, key]
        for field, op in ops.items():
            operand = u.loc[keys, field].to_numpy()
            if op == "set":
                batch.loc[hit, field] = operand
            elif op == "inc":
                batch.loc[hit, field] = batch.loc[hit, field].to_numpy() + operand
            elif op in ("add", "add_distinct", "remove"):
                cur = batch.loc[hit, field]
                out = []
                for lst, v in zip(cur, operand):
                    lst = list(lst) if lst is not None else []
                    if op == "add":
                        lst = lst + [v]
                    elif op == "add_distinct":
                        if v not in lst:
                            lst = lst + [v]
                    else:
                        lst = [x for x in lst if x != v]
                    out.append(lst)
                batch.loc[hit, field] = pd.Series(out, index=cur.index)
            else:
                raise ValueError(f"unknown atomic op {op!r}")
        return batch

    return ds.map_batches(merge, batch_format="pandas")
