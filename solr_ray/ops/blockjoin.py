"""Block join over nested documents (parent rows + list<struct> children).

Reference: BlockJoinParentQParserPlugin / BlockJoinChildQParserPlugin
(solr/core/src/java/org/apache/solr/search/join/BlockJoinParentQParserPlugin.java:38,
ToParentBlockJoinQuery semantics): {!parent which=...}childQuery returns
parents with at least one matching child, scored by ScoreMode
(none|max|total|avg) over the matching children; {!child of=...}parentQuery
returns the children of matching parents.

Ray-native layout: instead of Lucene's index-contiguous parent/child blocks,
children live in a ``list<struct>`` column on the parent row (the
_childDocuments_ representation of Solr's JSON nested docs) — the "block" is
the row itself, so both directions are per-batch vectorized map_batches with
NO join shuffle at query time. ``nest_children`` builds the layout from flat
parent/child tables (one hash shuffle, done once at ingest).

Child predicates reuse ops.queryfilter.compile_filter specs, evaluated over
the flattened child struct viewed as a table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from solr_ray.ops.queryfilter import compile_filter


def _flat_children(t: pa.Table, child_col: str):
    """(child table view, parent row index per child) for one batch."""
    col = t[child_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts.astype(np.float64), nan=0).astype(np.int64)
    parent_idx = np.repeat(np.arange(len(t), dtype=np.int64), counts)
    flat = col.flatten()  # StructArray of all children in batch order
    child_tbl = pa.table(
        {f.name: flat.field(f.name) for f in flat.type})
    return child_tbl, parent_idx


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset; pandas-backed blocks (from_pandas) report
    a PandasBlockSchema with dtype `object` for strings, so convert one
    batch to learn the real Arrow types."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    for b in ds.limit(100).iter_batches(batch_format="pyarrow",
                                        batch_size=100):
        return b.schema
    raise ValueError("cannot infer schema of an empty dataset")


def nest_children(parent_ds, child_ds, parent_key: str, child_key: str,
                  child_col: str = "_childDocuments_"):
    """Build the nested layout from flat tables: one row per parent with its
    children packed into a list<struct> column. ONE hash shuffle total:
    parents and (widened) child rows union on the parent key and a single
    groupby packs each group arrow-natively — no Dataset.join (Arrow's hash
    join rejects list<struct> payload columns). Parents with no children get
    an empty list; orphan children (no parent row) are dropped."""
    p_schema = _arrow_schema(parent_ds)
    c_schema = _arrow_schema(child_ds)
    child_fields = [f for f in c_schema if f.name != child_key]
    kid_type = pa.struct([(f.name, f.type) for f in child_fields])
    payload = [f for f in p_schema if f.name != parent_key]
    col_order = [parent_key, *[f.name for f in payload], "_kid", "_is_parent"]

    def widen_parent(t: pa.Table) -> pa.Table:
        cols = {parent_key: t[parent_key]}
        for f in payload:
            cols[f.name] = t[f.name]
        cols["_kid"] = pa.nulls(len(t), kid_type)
        cols["_is_parent"] = pa.array(np.ones(len(t), dtype=bool))
        return pa.table({c: cols[c] for c in col_order})

    def widen_child(t: pa.Table) -> pa.Table:
        kid = pa.StructArray.from_arrays(
            [t[f.name].combine_chunks() if isinstance(t[f.name], pa.ChunkedArray)
             else t[f.name] for f in child_fields],
            names=[f.name for f in child_fields])
        cols = {parent_key: t[child_key]}
        for f in payload:
            cols[f.name] = pa.nulls(len(t), f.type)
        cols["_kid"] = kid
        cols["_is_parent"] = pa.array(np.zeros(len(t), dtype=bool))
        return pa.table({c: cols[c] for c in col_order})

    unioned = parent_ds.map_batches(
        widen_parent, batch_format="pyarrow"
    ).union(child_ds.map_batches(widen_child, batch_format="pyarrow"))

    out_schema = pa.schema(
        [p_schema.field(parent_key), *payload,
         (child_col, pa.list_(kid_type))])

    def build_block(g: pa.Table) -> pa.Table:
        """All groups of one key-sorted block, vectorized: group boundaries
        from one run-length pass, the list<struct> column from offset
        arithmetic — O(block) arrow/numpy work instead of one Python
        call + table concat per parent key."""
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.combine_chunks()
        n = g.num_rows
        keys = g[parent_key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if n > 1:
            neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
            run_start = np.concatenate(
                [[True], neq.to_numpy(zero_copy_only=False)])
        else:
            run_start = np.array([True])
        gid = np.cumsum(run_start) - 1          # group id per row, ascending
        ngroups = int(gid[-1]) + 1
        isp = g["_is_parent"].to_numpy(zero_copy_only=False)
        pidx = np.flatnonzero(isp)
        if pidx.size == 0:                       # all-orphan block
            return out_schema.empty_table()
        pgid = gid[pidx]
        first = np.unique(pgid, return_index=True)[1]  # first parent per key
        pidx, pgid = pidx[first], pgid[first]
        has_parent = np.zeros(ngroups, dtype=bool)
        has_parent[pgid] = True
        cidx = np.flatnonzero(~isp)
        cgid = gid[cidx]
        ckeep = has_parent[cgid]                 # drop orphan children
        cidx, cgid = cidx[ckeep], cgid[ckeep]
        counts = np.bincount(cgid, minlength=ngroups)[pgid]
        offs = np.zeros(pgid.size + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        kid_col = g["_kid"]
        if isinstance(kid_col, pa.ChunkedArray):
            kid_col = kid_col.combine_chunks()
        kids = kid_col.take(pa.array(cidx))
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kids)
        prows = g.take(pa.array(pidx)).drop_columns(["_kid", "_is_parent"])
        return prows.append_column(child_col, lst).cast(out_schema)

    # Co-locate each parent key via a COARSE hash bucket groupby —
    # map_groups guarantees every row of a bucket reaches ONE UDF call
    # (a plain sort can split an oversized reduce partition into multiple
    # blocks, silently orphaning a key that straddles the split), while
    # build_block stays vectorized over the whole bucket so UDF dispatch
    # is O(num_buckets), not O(parent keys).
    num_buckets = 64

    def add_pb(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = t[parent_key]
        if pa.types.is_integer(k.type):
            h = pc.cast(k, pa.uint64())
        else:
            h = pa.array(pd.util.hash_array(
                np.asarray(pc.cast(k, pa.string()).to_pandas(),
                           dtype=object)))
        return t.append_column(
            "__pb", pc.cast(pc.bit_wise_and(h, num_buckets - 1), pa.int64()))

    def build_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__pb"]).combine_chunks()
        return build_block(g.sort_by(parent_key))

    return unioned.map_batches(add_pb, batch_format="pyarrow").groupby(
        "__pb").map_groups(build_bucket, batch_format="pyarrow")


def parent_query(ds, child_filter: dict, score_field: str | None = None,
                 score_mode: str = "max",
                 child_col: str = "_childDocuments_",
                 parent_filter: dict | None = None):
    """{!parent}: parents with >=1 child matching child_filter.

    score_mode over the MATCHING children's score_field: "max" | "total" |
    "avg" | "none" (ToParentBlockJoinQuery ScoreMode). Output = parent
    columns (minus the child list) + "score" + "n_matching_children".
    """
    pred = compile_filter(child_filter)
    ppred = compile_filter(parent_filter) if parent_filter else None

    def f(t: pa.Table) -> pa.Table:
        if ppred is not None:
            t = t.filter(ppred(t))
        if len(t) == 0:
            base = t.drop_columns([child_col])
            return base.append_column(
                "score", pa.array([], pa.float64())).append_column(
                "n_matching_children", pa.array([], pa.int64()))
        kids, parent_idx = _flat_children(t, child_col)
        mask = pred(kids).to_numpy(zero_copy_only=False)
        if mask.dtype == object:
            mask = mask.astype(bool)
        sel = np.flatnonzero(mask)
        pidx = parent_idx[sel]
        n = len(t)
        n_match = np.bincount(pidx, minlength=n).astype(np.int64)
        if score_mode == "none" or score_field is None:
            score = n_match.astype(np.float64)
        else:
            vals = kids[score_field].to_numpy(
                zero_copy_only=False).astype(np.float64)[sel]
            if score_mode == "max":
                score = np.full(n, -np.inf)
                np.maximum.at(score, pidx, vals)
            elif score_mode in ("total", "sum"):
                score = np.bincount(pidx, weights=vals, minlength=n)
            elif score_mode == "avg":
                tot = np.bincount(pidx, weights=vals, minlength=n)
                score = np.divide(tot, n_match,
                                  out=np.zeros(n), where=n_match > 0)
            else:
                raise ValueError(score_mode)
        keep = np.flatnonzero(n_match > 0)
        out = t.drop_columns([child_col]).take(pa.array(keep))
        return out.append_column(
            "score", pa.array(score[keep], pa.float64())).append_column(
            "n_matching_children", pa.array(n_match[keep], pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def child_query(ds, parent_filter: dict, child_filter: dict | None = None,
                child_col: str = "_childDocuments_",
                parent_cols: tuple[str, ...] = ()):
    """{!child}: children of parents matching parent_filter (optionally
    also filtered by child_filter). Output = child struct columns +
    requested parent_cols carried onto each child row."""
    ppred = compile_filter(parent_filter)
    cpred = compile_filter(child_filter) if child_filter else None

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(ppred(t))
        kids, parent_idx = _flat_children(t, child_col)
        for c in parent_cols:
            kids = kids.append_column(
                c, t[c].combine_chunks().take(pa.array(parent_idx)))
        if cpred is not None and len(kids):
            kids = kids.filter(cpred(kids))
        return kids

    return ds.map_batches(f, batch_format="pyarrow")
