"""Graph traversal over an edge table.

Reference: gatherNodes/nodes streaming expression (solr/solrj-streaming/
.../io/graph/GatherNodesStream.java:69) — iterative frontier expansion where
each step queries the index for edges whose `from` field matches the current
frontier; ShortestPathStream.java:63 does the same with path tracking.

Ray mapping (SURVEY §2.4): a driver loop of per-level distributed
semi-joins. Each level: broadcast the frontier set (ray.put), stream the
edge Dataset through a membership filter, collect the distinct destination
nodes. Level count is small (BFS depth); per-level work is fully
distributed; the frontier is the only driver-side state (bounded by the
reachable-set size, same as the reference's in-memory visited set).

For hub-heavy web graphs where the reachable set itself might not fit the
driver, gather_nodes_distributed keeps frontier AND visited as Datasets
(per-level hash joins; the driver sees only row counts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def gather_nodes(edges, from_col: str, to_col: str, seeds, depth: int = 1):
    """BFS from `seeds` over directed edges; returns pa.Table(node, level)
    with level = first (minimum) depth each node was reached at, seeds at 0.
    """
    import ray

    visited: dict = {s: 0 for s in seeds}
    frontier = set(seeds)
    for level in range(1, depth + 1):
        if not frontier:
            break
        ref = ray.put(pa.array(sorted(frontier)))

        def step(t: pa.Table) -> pa.Table:
            f = ray.get(ref)
            return t.filter(pc.is_in(t[from_col], value_set=f)).select([to_col])

        reached = (edges.map_batches(step, batch_format="pyarrow")
                   .unique(to_col) or [])  # empty frontier -> None in Ray
        nxt = set()
        for n in reached:
            if n not in visited:
                visited[n] = level
                nxt.add(n)
        frontier = nxt
    nodes = sorted(visited)
    return pa.table({
        "node": pa.array(nodes),
        "level": pa.array([visited[n] for n in nodes], pa.int64()),
    })


def gather_nodes_distributed(edges, from_col: str, to_col: str, seeds,
                             depth: int = 1, num_partitions: int = 16):
    """gather_nodes for hub-heavy graphs: the frontier and visited sets
    stay DATASETS end-to-end — each level is a distributed hash join
    (edges ⋈ frontier) + distinct + anti-join against visited, so a web
    graph whose frontier explodes through a hub can never overflow the
    driver (the only driver-side state is one row count per level).
    Returns a Dataset(node, level); same result as gather_nodes.

    Trade-off: 2 join shuffles per level vs the broadcast path's single
    streaming filter — use gather_nodes when the reachable set comfortably
    fits one machine, this when it might not."""
    import ray.data

    def _dedup_nodes(ds):
        def drop_cnt(t: pa.Table) -> pa.Table:
            return t.select(["node"])

        return ds.groupby("node").count().map_batches(
            drop_cnt, batch_format="pyarrow")

    seed_nodes = sorted(set(seeds))
    visited = ray.data.from_arrow(pa.table({
        "node": pa.array(seed_nodes),
        "level": pa.array([0] * len(seed_nodes), pa.int64()),
    })).materialize()
    frontier = visited.map_batches(
        lambda t: t.select(["node"]), batch_format="pyarrow").materialize()

    for level in range(1, depth + 1):
        if frontier.count() == 0:
            break
        # hop: edges whose source is in the frontier (hash-partitioned
        # join — Ray drops the right key, so join on a copy)
        fr = frontier.map_batches(
            lambda t: pa.table({"__f": t["node"]}),
            batch_format="pyarrow").repartition(4)
        hop = edges.join(fr, join_type="inner",
                         num_partitions=num_partitions,
                         on=(from_col,), right_on=("__f",))
        # repartition coalesces the aggregate's empty zero-schema blocks,
        # which otherwise break the join's key resolution (same workaround
        # as sql._attach_distinct_counts)
        reached = _dedup_nodes(hop.map_batches(
            lambda t, _c=to_col: pa.table({"node": t[_c]}),
            batch_format="pyarrow")).repartition(num_partitions).materialize()
        if reached.count() == 0:
            break
        # anti-join visited: keep only first-time nodes
        seen = visited.map_batches(
            lambda t: pa.table({
                "__v": t["node"],
                "__seen": pa.array(np.ones(len(t), np.int8))}),
            batch_format="pyarrow").repartition(4)
        nxt = reached.join(seen, join_type="left_outer",
                           num_partitions=num_partitions,
                           on=("node",), right_on=("__v",))

        def fresh(t: pa.Table, _lv=level) -> pa.Table:
            t = t.filter(pc.is_null(t["__seen"]))
            return pa.table({
                "node": t["node"],
                "level": pa.array(
                    np.full(t.num_rows, _lv, np.int64))})

        nxt = nxt.map_batches(fresh, batch_format="pyarrow").materialize()
        if nxt.count() == 0:
            break
        visited = visited.union(nxt).materialize()
        frontier = nxt.map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow")
    return visited


def shortest_path(edges, from_col: str, to_col: str, src, dst,
                  max_depth: int = 6):
    """ShortestPathStream: one shortest path src -> dst (BFS with parent
    tracking), or None if dst is unreachable within max_depth."""
    import ray

    parent: dict = {src: None}
    frontier = {src}
    for _ in range(max_depth):
        if dst in parent or not frontier:
            break
        ref = ray.put(pa.array(sorted(frontier)))

        def step(t: pa.Table) -> pa.Table:
            f = ray.get(ref)
            return t.filter(
                pc.is_in(t[from_col], value_set=f)).select([from_col, to_col])

        hops = (
            edges.map_batches(step, batch_format="pyarrow")
            .groupby(to_col)
            .map_groups(lambda g: g.head(1), batch_format="pandas")
        )
        nxt = set()
        for row in hops.take_all():
            n = row[to_col]
            if n not in parent:
                parent[n] = row[from_col]
                nxt.add(n)
        frontier = nxt
    if dst not in parent:
        return None
    path = [dst]
    while parent[path[-1]] is not None:
        path.append(parent[path[-1]])
    return list(reversed(path))


def shortest_path_distributed(edges, from_col: str, to_col: str, src, dst,
                              max_depth: int = 6,
                              num_partitions: int = 16):
    """shortest_path for graphs whose BFS levels outgrow the driver: each
    level lives as a Dataset(node, parent) — one hash join (edges ⋈
    frontier) + a groupby-MIN parent (deterministic tie-break; the
    broadcast variant keeps an arbitrary first parent) + an anti-join
    against visited. Driver state per level = one row count. The
    backtrack reads ONE node's parent per level (a filtered pass over
    that level's materialized table), so path reconstruction is
    O(path_len) tiny scans, never a collected frontier.

    Returns the path [src, ..., dst] (min-parent deterministic) or None.
    Same reachability/length as shortest_path (asserted in pytest)."""
    import ray.data
    from ray.data.aggregate import Min

    if src == dst:
        return [src]
    visited = ray.data.from_arrow(pa.table({
        "node": pa.array([src])})).materialize()
    frontier = visited
    levels: list = []
    found = False
    for _ in range(max_depth):
        fr = frontier.map_batches(
            lambda t: pa.table({"__f": t["node"]}),
            batch_format="pyarrow").repartition(4).materialize()
        hop = edges.join(fr, join_type="inner",
                         num_partitions=num_partitions,
                         on=(from_col,), right_on=("__f",))
        # materialize barrier: chaining a second join (below) onto a
        # join+groupby plan deadlocks the hash-shuffle aggregator pools
        # on a small CPU budget (same barrier sql.py uses between joins)
        reached = (hop.map_batches(
            lambda t, _f=from_col, _t=to_col: pa.table(
                {"node": t[_t], "parent": t[_f]}),
            batch_format="pyarrow")
            .groupby("node").aggregate(Min("parent", alias_name="parent"))
            .repartition(num_partitions).materialize())
        seen = visited.map_batches(
            lambda t: pa.table({
                "__v": t["node"],
                "__seen": pa.array(np.ones(len(t), np.int8))}),
            batch_format="pyarrow").repartition(4).materialize()
        nxt = reached.join(seen, join_type="left_outer",
                           num_partitions=num_partitions,
                           on=("node",), right_on=("__v",))

        def fresh(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_null(t["__seen"]))
            return t.select(["node", "parent"])

        lvl = nxt.map_batches(fresh, batch_format="pyarrow").materialize()
        if lvl.count() == 0:
            break
        levels.append(lvl)
        hit = lvl.map_batches(
            lambda t, _d=dst: t.filter(pc.equal(t["node"], pa.scalar(_d))),
            batch_format="pyarrow")
        if hit.count() > 0:
            found = True
            break
        visited = visited.union(lvl.map_batches(
            lambda t: t.select(["node"]),
            batch_format="pyarrow")).materialize()
        frontier = lvl.map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow")
    if not found:
        return None
    # backtrack: one tiny filtered scan per level, deepest first — each
    # node on the path was first discovered at exactly its level, so
    # every lookup succeeds until src (which is in no level table)
    path = [dst]
    for lvl in reversed(levels):
        cur = path[-1]
        if cur == src:
            break
        row = lvl.map_batches(
            lambda t, _c=cur: t.filter(pc.equal(t["node"], pa.scalar(_c))),
            batch_format="pyarrow").take(1)
        assert row, "BFS level missing a path predecessor"
        path.append(row[0]["parent"])
    assert path[-1] == src
    return list(reversed(path))


def graph_terms_filter(ds, field: str, terms, max_doc_freq: int = -1):
    """{!graphTerms} (GraphTermsQParserPlugin, solr/core/src/java/org/
    apache/solr/search/GraphTermsQParserPlugin.java:60): membership filter
    over a term list that SKIPS terms whose document frequency exceeds
    maxDocFreq — the traversal-frontier guard that keeps a graph walk from
    exploding through a hub node.

    Two passes, both distributed: one combiner groupby counts df for the
    candidate terms only (the frontier is broadcast, so the partial is
    frontier-sized, not vocab-sized), then the surviving terms broadcast
    into a vectorized is_in filter."""
    import ray

    terms = sorted(set(terms))
    tset = pa.array(terms)
    if max_doc_freq >= 0:
        ref = ray.put(tset)

        def df_part(t: pa.Table) -> pa.Table:
            vs = ray.get(ref)
            hit = t.filter(pc.is_in(t[field], value_set=vs))
            agg = (hit.select([field]).group_by(field, use_threads=False)
                   .aggregate([([], "count_all")]))
            return pa.table({"term": agg[field],
                             "df": agg["count_all"]})

        from ray.data.aggregate import Sum

        df = (ds.map_batches(df_part, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("df", alias_name="df"))
              .to_pandas())
        keep = set(df[df["df"] <= max_doc_freq]["term"])
        tset = pa.array(sorted(k for k in terms if k in keep))

    ref2 = ray.put(tset)

    def flt(t: pa.Table) -> pa.Table:
        vs = ray.get(ref2)
        return t.filter(pc.is_in(t[field], value_set=vs))

    return ds.map_batches(flt, batch_format="pyarrow")
