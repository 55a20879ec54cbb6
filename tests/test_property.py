"""Property-based tests (hypothesis) for the engine's core invariants:
codec round-trips, fast-tokenizer equivalence, top-k ordering."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_ray.analysis.chain import get_analyzer
from solr_ray.stages.codec import (
    delta_decode, delta_encode, varint_decode, varint_encode)

_SETTINGS = dict(max_examples=100, deadline=None)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(**_SETTINGS)
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v), v.size), v)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=200, unique=True))
@settings(**_SETTINGS)
def test_delta_roundtrip_sorted(ids):
    v = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(v)), v)


@given(st.lists(st.text(max_size=60), max_size=30),
       st.sampled_from(["text_en", "text_general", "standard", "simple",
                        "whitespace"]))
@settings(**_SETTINGS)
def test_fast_tokenizer_equals_reference(texts, analyzer):
    """The translate+split batch path must equal the per-string regex path
    for ARBITRARY unicode input, in both output encodings."""
    az = get_analyzer(analyzer)
    want = [az.tokenize_text(t) for t in texts]
    col = pa.array(texts, pa.string())
    assert az.tokenize_array(col).to_pylist() == want
    assert az.tokenize_array(col, dict_encode=True).to_pylist() == want


@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.floats(0.001, 100.0)),
                min_size=1, max_size=300),
       st.integers(1, 20))
@settings(**_SETTINGS)
def test_order_topk_properties(pairs, k):
    """_order_topk == full (score desc, doc asc) sort truncated to k."""
    from solr_ray.search.wand import _order_topk

    seen = {}
    for d, s in pairs:  # dedupe doc ids (accumulator semantics)
        seen[d] = s
    ids = np.array(sorted(seen), dtype=np.int64)
    sc = np.array([seen[d] for d in sorted(seen)], dtype=np.float64)
    got_ids, got_sc = _order_topk(ids.copy(), sc.copy(), k)
    order = np.lexsort((ids, -sc))[:k]
    assert np.array_equal(got_ids, ids[order])
    assert np.array_equal(got_sc, sc[order])


@given(st.text(max_size=120))
@settings(**_SETTINGS)
def test_sql_parser_never_crashes_unstructured(sql):
    """Arbitrary input either parses or raises ValueError — no other
    exception type escapes the tokenizer/parser."""
    from solr_ray.sql import parse_sql

    try:
        parse_sql(sql)
    except ValueError:
        pass


# ---------------------------------------------------------------- intervals

class _FakeSeg:
    """Segment stub exposing exactly the API segment_intervals needs —
    lets hypothesis hammer the interval algebra without Ray or disk."""

    def __init__(self, docs):
        self.dl = np.array([len(d) for d in docs], dtype=np.int64)
        vocab = sorted({t for d in docs for t in d})
        self.terms = vocab
        self.lookup = {t: i for i, t in enumerate(vocab)}
        self._pos = {}
        for t in vocab:
            ids, tfs, pos = [], [], []
            for di, d in enumerate(docs):
                ps = [i for i, x in enumerate(d) if x == t]
                if ps:
                    ids.append(di)
                    tfs.append(len(ps))
                    pos.extend(ps)
            self._pos[t] = (np.array(ids, np.int64),
                            np.array(tfs, np.int64),
                            np.array(pos, np.int32))

    def term_positions(self, t):
        return self._pos.get(t)


_IV_VOCAB = ["a", "b", "c", "d"]


def _iv_exprs():
    from solr_ray.search.intervals import I

    leaf = st.sampled_from(_IV_VOCAB)

    def compose(children):
        return st.one_of(
            st.tuples(children, children).map(lambda x: I.ordered(*x)),
            st.tuples(children, children).map(lambda x: I.unordered(*x)),
            st.tuples(children, children).map(lambda x: I.or_(*x)),
            st.tuples(children, st.integers(1, 6)).map(
                lambda x: I.maxwidth(x[0], x[1])),
            st.tuples(children, children).map(
                lambda x: I.containing(x[0], x[1])),
            st.tuples(children, children).map(
                lambda x: I.not_containing(x[0], x[1])),
            st.tuples(children, children).map(
                lambda x: I.contained_by(x[0], x[1])),
            st.tuples(children, children).map(
                lambda x: I.overlapping(x[0], x[1])),
            st.tuples(children, children).map(
                lambda x: I.before(x[0], x[1])),
        )

    return st.recursive(leaf, compose, max_leaves=5)


@given(st.lists(st.lists(st.sampled_from(_IV_VOCAB), max_size=14),
                min_size=1, max_size=6),
       _iv_exprs())
@settings(max_examples=150, deadline=None)
def test_interval_algebra_property(docs, expr):
    """Engine minimal-interval sets == brute-force enumeration for random
    corpora and random operator trees."""
    from solr_ray.search.intervals import segment_intervals
    from tests.test_intervals import _brute

    if isinstance(expr, str):
        return  # bare leaf: trivially the term positions
    seg = _FakeSeg(docs)
    mult = np.int64(int(seg.dl.max(initial=0)) + 2)
    s, e, _w = segment_intervals(seg, expr, mult)
    got = {}
    for sk, ek in zip(s.tolist(), e.tolist()):
        got.setdefault(int(sk // mult), set()).add(
            (int(sk % mult), int(ek % mult)))
    want = {}
    for di, d in enumerate(docs):
        ivs = _brute(d, expr)
        if ivs:
            want[di] = ivs
    assert got == want


# ------------------------------------------- sliced windows (round 4)

import ray.data


@given(st.lists(st.tuples(st.integers(0, 5),            # key
                          st.integers(0, 10_000)),      # ts (us)
                min_size=1, max_size=120),
       st.integers(50, 2_000),                           # gap_us
       st.integers(3, 40))                               # slice/gap ratio
@settings(max_examples=25, deadline=None)
def test_session_windows_sliced_property(ray_session, rows, gap, ratio):
    """Random logs: composite-key sessionize + boundary stitch must equal
    the brute-force per-key pass for ANY gap/slice combination (sessions
    spanning several slices, single-event slices, ties)."""
    import pandas as pd

    from solr_ray.ops.windows import session_windows

    df = pd.DataFrame({
        "k": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    got = session_windows(ds, "k", "ts", gap_us=gap, num_buckets=3,
                          slice_us=gap * ratio).to_pandas()
    got = got.sort_values(["k", "session_start"]).reset_index(drop=True)
    want = []
    for k, g in df.sort_values(["k", "ts"]).groupby("k"):
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new = np.ones(len(t), bool)
        new[1:] = (t[1:] - t[:-1]) > gap
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            m = t[sid == s]
            want.append((k, m.min(), m.max(), len(m)))
    assert len(got) == len(want)
    for i, (k, mn, mx, n) in enumerate(want):
        assert got["k"].iloc[i] == k
        assert int(got["session_start"].astype("datetime64[us]")
                   .astype("int64").iloc[i]) == mn
        assert int(got["session_end"].astype("datetime64[us]")
                   .astype("int64").iloc[i]) == mx
        assert int(got["n_events"].iloc[i]) == n


@given(st.lists(st.tuples(st.integers(0, 4),             # key
                          st.integers(0, 5_000),         # ts
                          st.integers(-9, 9)),           # value
                min_size=1, max_size=100),
       st.integers(2, 6),                                 # n
       st.integers(100, 1_500))                           # slice_us
@settings(max_examples=25, deadline=None)
def test_sliding_window_sliced_property(ray_session, rows, n, slice_us):
    """Random logs: head/tail fix-up must reproduce pandas rolling sums
    exactly for any slice width (slices smaller than n, empty slices,
    duplicate timestamps broken by eid)."""
    import pandas as pd

    from solr_ray.ops.windows import sliding_window

    df = pd.DataFrame({
        "k": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
        "v": [r[2] for r in rows],
        "eid": np.arange(len(rows)),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    got = sliding_window(ds, "k", "ts", "v", n=n, agg="sum", tie_col="eid",
                         num_buckets=3, slice_us=slice_us).to_pandas()
    got = got.sort_values("eid").reset_index(drop=True)
    w = df.sort_values(["k", "ts", "eid"]).copy()
    w["roll"] = (w.groupby("k")["v"].rolling(n, min_periods=1).sum()
                 .reset_index(level=0, drop=True))
    w = w.sort_values("eid").reset_index(drop=True)
    assert len(got) == len(w)
    assert (got["rolling_v"].to_numpy() == w["roll"].to_numpy()).all()


# --------------------------------------------- SQL windows (round 4)

@given(st.lists(st.tuples(st.integers(0, 3),           # partition key
                          st.integers(-20, 20)),        # value
                min_size=1, max_size=60),
       st.integers(1, 5),                                # frame n
       st.booleans())                                    # order desc
@settings(max_examples=30, deadline=None)
def test_sql_window_functions_property(ray_session, rows, n, desc):
    """Random tables: ROW_NUMBER/RANK/DENSE_RANK and SUM OVER ROWS
    BETWEEN must match DuckDB exactly (ids provide a unique tie-break
    for ROW_NUMBER; RANK/DENSE_RANK are exercised over tied values)."""
    import duckdb

    from solr_ray.sql import execute_sql

    t = pa.table({
        "id": pa.array(range(len(rows)), pa.int64()),
        "p": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
    })
    d = "DESC, id" if desc else ""
    ordc = f"v {d}" if desc else "v, id"
    sql = (f"SELECT id, "
           f"ROW_NUMBER() OVER (PARTITION BY p ORDER BY {ordc}) AS rn, "
           f"RANK() OVER (PARTITION BY p ORDER BY v) AS r, "
           f"DENSE_RANK() OVER (PARTITION BY p ORDER BY v) AS dr, "
           f"SUM(v) OVER (PARTITION BY p ORDER BY {ordc} "
           f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW) AS rs "
           f"FROM t ORDER BY id")
    got = execute_sql(sql, {"t": ray.data.from_arrow(t)}).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(sql).df()
    con.close()
    assert len(got) == len(want)
    for c in ("rn", "r", "dr", "rs"):
        assert np.allclose(got[c].to_numpy().astype(float),
                           want[c].to_numpy().astype(float)), c


# --------------------------------- SQL windows, sliced path (round 5)

@given(st.lists(st.tuples(st.integers(0, 1),            # partition (hot: 2)
                          st.integers(0, 500),           # order value
                          st.integers(-9, 9)),           # agg value
                min_size=1, max_size=150),
       st.integers(1, 4),                                # frame n
       st.integers(2, 16))                               # forced slice count
@settings(max_examples=25, deadline=None)
def test_sql_window_sliced_hot_partition_property(ray_session,
                                                  rows, n, nslices):
    """The r4 ceiling: a hot PARTITION BY key used to land in ONE group.
    Force the slice count tiny so every example exercises multi-slice
    offsets + head/tail fix-up over a near-single-key table, and assert
    exact DuckDB equality (rank offsets, dense-rank distinct offsets,
    frame sums across slice edges, duplicate order values within and at
    slice boundaries)."""
    import duckdb

    import solr_ray.sql as sqlmod
    from solr_ray.sql import execute_sql

    saved = sqlmod._WIN_SLICES, sqlmod._SLICED_MIN_ROWS
    sqlmod._WIN_SLICES = nslices
    sqlmod._SLICED_MIN_ROWS = 0  # force the composite-key path on tiny input
    try:
        _run_sliced_case(rows, n)
    finally:
        sqlmod._WIN_SLICES, sqlmod._SLICED_MIN_ROWS = saved


def _run_sliced_case(rows, n):
    import duckdb

    from solr_ray.sql import execute_sql

    t = pa.table({
        "id": pa.array(range(len(rows)), pa.int64()),
        "p": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
    })
    sql = (f"SELECT id, "
           f"ROW_NUMBER() OVER (PARTITION BY p ORDER BY o, id) AS rn, "
           f"RANK() OVER (PARTITION BY p ORDER BY o) AS r, "
           f"DENSE_RANK() OVER (PARTITION BY p ORDER BY o) AS dr, "
           f"SUM(v) OVER (PARTITION BY p ORDER BY o, id "
           f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW) AS rs "
           f"FROM t ORDER BY id")
    got = execute_sql(sql, {"t": ray.data.from_arrow(t)}).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(sql).df()
    con.close()
    assert len(got) == len(want)
    for c in ("rn", "r", "dr", "rs"):
        assert np.allclose(got[c].to_numpy().astype(float),
                           want[c].to_numpy().astype(float)), c


@given(st.lists(st.tuples(st.integers(0, 1),            # partition (hot: 2)
                          st.integers(0, 500),           # order value
                          st.integers(-9, 9)),           # nav value
                min_size=1, max_size=120),
       st.integers(1, 3),                                # lag/lead offset
       st.integers(2, 12))                               # forced slice count
@settings(max_examples=10, deadline=None)
def test_sql_nav_sliced_property(ray_session, rows, k, nslices):
    """LAG/LEAD/NTILE/FIRST_VALUE/LAST_VALUE on the sliced scale path
    (ROW_NUMBER shuffle + rn+-k hash joins) must match DuckDB exactly —
    including duplicate order values at slice boundaries (LAST_VALUE
    peer groups), defaults at partition edges, and NTILE remainders."""
    import duckdb

    import solr_ray.sql as sqlmod
    from solr_ray.sql import execute_sql

    t = pa.table({
        "id": pa.array(range(len(rows)), pa.int64()),
        "p": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
        # w is constant within a (p, o) peer group, so LAST_VALUE(w)
        # OVER (ORDER BY o) is deterministic despite peer ties
        "w": pa.array([r[1] * 3 + r[0] for r in rows], pa.int64()),
    })
    sql = (f"SELECT id, "
           f"LAG(v, {k}, -99) OVER (PARTITION BY p ORDER BY o, id) AS pv, "
           f"LEAD(v, {k}) OVER (PARTITION BY p ORDER BY o, id) AS nv, "
           f"NTILE(3) OVER (PARTITION BY p ORDER BY o, id) AS q3, "
           f"FIRST_VALUE(v) OVER (PARTITION BY p ORDER BY o, id) AS fv, "
           f"LAST_VALUE(w) OVER (PARTITION BY p ORDER BY o) AS lv "
           f"FROM t ORDER BY id")
    saved = sqlmod._WIN_SLICES, sqlmod._SLICED_MIN_ROWS
    sqlmod._WIN_SLICES = nslices
    sqlmod._SLICED_MIN_ROWS = 0  # force the sliced path on tiny input
    try:
        got = execute_sql(sql, {"t": ray.data.from_arrow(t)}).to_pandas()
    finally:
        sqlmod._WIN_SLICES, sqlmod._SLICED_MIN_ROWS = saved
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(sql).df()
    con.close()
    assert len(got) == len(want)
    for c in ("pv", "nv", "q3", "fv", "lv"):
        g = got[c].to_numpy().astype(float)
        w = want[c].to_numpy().astype(float)
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all(), c


@given(st.lists(st.one_of(st.integers(0, 6), st.none()),
                min_size=0, max_size=40),
       st.lists(st.one_of(st.integers(0, 6), st.none()),
                min_size=0, max_size=40),
       st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]),
       st.sampled_from(["UNION", "INTERSECT", "EXCEPT"]))
@settings(max_examples=20, deadline=None)
def test_sql_setops_property(ray_session, xs, ys, op1, op2):
    """Chained set operations over random (nullable) columns must match
    DuckDB exactly — NULL-equality distinct semantics, INTERSECT
    precedence, empty operands (typed-empty substitution), duplicate
    collapse rules."""
    import duckdb

    from solr_ray.sql import execute_sql

    t = pa.table({"x": pa.array(xs, pa.int64()),
                  "y": pa.array(ys[: len(xs)] + [None] * max(
                      0, len(xs) - len(ys)), pa.int64())})
    u = pa.table({"x": pa.array(ys, pa.int64())})
    sql = (f"SELECT x AS k FROM t {op1} SELECT y AS k FROM t "
           f"{op2} SELECT x AS k FROM u ORDER BY k")
    got = execute_sql(sql, {"t": ray.data.from_arrow(t),
                            "u": ray.data.from_arrow(u)}).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    con.register("u", u)
    want = con.execute(sql).df()
    con.close()
    assert len(got) == len(want)
    if len(got):
        g = got["k"].to_numpy().astype(float)
        w = want["k"].to_numpy().astype(float)
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()


# ------------------------------- SQL subqueries (round 5)

@given(st.lists(st.tuples(st.integers(0, 4),           # grp
                          st.integers(-50, 50)),        # val
                min_size=1, max_size=80),
       st.integers(-40, 40))                            # inner threshold
@settings(max_examples=30, deadline=None)
def test_sql_subquery_property(ray_session, rows, thresh):
    """EXISTS / NOT EXISTS / IN-subquery / correlated scalar subquery
    over random tables must match DuckDB exactly — including empty
    subquery results, all-matching groups, and negative thresholds."""
    import duckdb

    from solr_ray.sql import execute_sql

    t = pa.table({
        "id": pa.array(range(len(rows)), pa.int64()),
        "grp": pa.array([r[0] for r in rows], pa.int64()),
        "val": pa.array([r[1] for r in rows], pa.int64()),
    })
    cases = [
        (f"SELECT id FROM t a WHERE EXISTS (SELECT 1 AS one FROM t b "
         f"WHERE b.grp = a.grp AND b.val > {thresh}) ORDER BY id"),
        (f"SELECT id FROM t a WHERE NOT EXISTS (SELECT 1 AS one FROM t b "
         f"WHERE b.grp = a.grp AND b.val > {thresh}) ORDER BY id"),
        (f"SELECT id FROM t WHERE grp IN (SELECT grp FROM t "
         f"WHERE val > {thresh}) ORDER BY id"),
        ("SELECT id FROM t a WHERE a.val >= (SELECT MAX(val) AS m "
         "FROM t b WHERE b.grp = a.grp) ORDER BY id"),
    ]
    con = duckdb.connect()
    con.register("t", t)
    try:
        for sql in cases:
            got = execute_sql(
                sql, {"t": ray.data.from_arrow(t)}).to_pandas()
            want = con.execute(sql).df()
            assert len(got) == len(want), sql
            if len(want):
                assert (got["id"].to_numpy()
                        == want["id"].to_numpy()).all(), sql
    finally:
        con.close()
