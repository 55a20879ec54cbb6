"""Graph traversal (gatherNodes / shortestPath) tests."""

import pandas as pd

import ray.data


def _edges():
    # a -> b -> c -> d, plus a -> x, and a disconnected z1 -> z2
    return ray.data.from_pandas(pd.DataFrame({
        "src": ["a", "b", "c", "a", "z1"],
        "dst": ["b", "c", "d", "x", "z2"],
    })).repartition(2)


def test_gather_nodes_levels():
    from solr_ray.ops.graph import gather_nodes

    out = gather_nodes(_edges(), "src", "dst", seeds=["a"], depth=2)
    got = dict(zip(out["node"].to_pylist(), out["level"].to_pylist()))
    assert got == {"a": 0, "b": 1, "x": 1, "c": 2}


def test_gather_nodes_min_level_on_diamond():
    from solr_ray.ops.graph import gather_nodes

    edges = ray.data.from_pandas(pd.DataFrame({
        "src": ["a", "a", "b", "c"],
        "dst": ["b", "c", "d", "d"],
    }))
    out = gather_nodes(edges, "src", "dst", seeds=["a"], depth=3)
    got = dict(zip(out["node"].to_pylist(), out["level"].to_pylist()))
    assert got["d"] == 2


def test_shortest_path():
    from solr_ray.ops.graph import shortest_path

    assert shortest_path(_edges(), "src", "dst", "a", "d") == \
        ["a", "b", "c", "d"]
    assert shortest_path(_edges(), "src", "dst", "a", "z2") is None


def test_graph_terms_filter(ray_session):
    import pyarrow as pa
    import ray.data

    from solr_ray.ops.graph import graph_terms_filter

    t = ray.data.from_arrow(pa.table({
        "u": ["a", "a", "a", "b", "b", "c", "d"],
        "v": [1, 2, 3, 4, 5, 6, 7],
    })).repartition(3)
    out = graph_terms_filter(t, "u", ["a", "b", "c", "zzz"],
                             max_doc_freq=2).to_pandas()
    assert sorted(out["u"]) == ["b", "b", "c"]  # hub 'a' (df 3) skipped
    out2 = graph_terms_filter(t, "u", ["a", "d"]).to_pandas()
    assert sorted(out2["u"]) == ["a", "a", "a", "d"]  # no df cap


def test_gather_nodes_distributed_hub_graph(ray_session):
    """Dataset-frontier BFS == broadcast BFS on a hub-heavy graph (one
    node fanning out to 2000 leaves) — the shape where a driver-side
    frontier set would balloon. No node set ever reaches the driver in
    the distributed variant (only per-level row counts)."""
    import pandas as pd

    from solr_ray.ops.graph import gather_nodes, gather_nodes_distributed

    e_from, e_to = ["s0"], ["hub"]
    for i in range(2000):
        e_from.append("hub")
        e_to.append(f"leaf{i:05d}")
    for i in range(5):
        e_from.append(f"leaf{i:05d}")
        e_to.append(f"deep{i}")
    edges = ray.data.from_pandas(
        pd.DataFrame({"src": e_from, "dst": e_to})).repartition(8)
    want = gather_nodes(edges, "src", "dst", ["s0"], depth=3).to_pandas()
    got = (gather_nodes_distributed(edges, "src", "dst", ["s0"], depth=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = want.sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == want["node"].tolist()
    assert got["level"].tolist() == want["level"].tolist()


def test_shortest_path_distributed(ray_session):
    """Dataset-resident BFS levels + min-parent backtrack: same length as
    the broadcast shortest_path, every hop a real edge, deterministic
    (min parent). Covers unreachable, depth-limited, and src==dst."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from solr_ray.ops.graph import shortest_path, shortest_path_distributed

    rng = np.random.default_rng(17)
    n = 300
    src_nodes = rng.integers(0, n, 1500)
    dst_nodes = rng.integers(0, n, 1500)
    # add a guaranteed 3-hop chain so a known path exists
    chain = np.array([[900, 901], [901, 902], [902, 903]])
    e = pa.table({
        "s": np.concatenate([src_nodes, chain[:, 0]]),
        "d": np.concatenate([dst_nodes, chain[:, 1]]),
    })
    edges = ray.data.from_arrow(e).repartition(4)
    edge_set = set(zip(e["s"].to_pylist(), e["d"].to_pylist()))

    got = shortest_path_distributed(edges, "s", "d", 900, 903, max_depth=5)
    assert got == [900, 901, 902, 903]

    # random pair: equal LENGTH to the broadcast version, valid hops
    want = shortest_path(edges, "s", "d", 0, 7, max_depth=5)
    got2 = shortest_path_distributed(edges, "s", "d", 0, 7, max_depth=5)
    if want is None:
        assert got2 is None
    else:
        assert got2 is not None and len(got2) == len(want)
        assert got2[0] == 0 and got2[-1] == 7
        for a, b in zip(got2, got2[1:]):
            assert (a, b) in edge_set
    # unreachable / identity
    assert shortest_path_distributed(edges, "s", "d", 900, 12345,
                                     max_depth=3) is None
    assert shortest_path_distributed(edges, "s", "d", 5, 5) == [5]
