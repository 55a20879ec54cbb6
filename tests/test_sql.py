"""/sql front-end (solr_ray/sql.py) vs DuckDB on the same in-memory table."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from solr_ray.sql import execute_sql, parse_sql


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(7)
    n = 2000
    return pa.table({
        "id": pa.array(np.arange(n)),
        "grp": pa.array([f"g{i % 7}" for i in range(n)]),
        "kind": pa.array([("click", "view", "error")[i % 3]
                          for i in range(n)]),
        "val": pa.array(rng.integers(0, 1000, n)),
        "name": pa.array([f"item{i:04d}" for i in range(n)]),
    })


def _both(sql, table):
    import ray.data

    got = execute_sql(sql, {"t": ray.data.from_arrow(table)}).to_pandas()
    want = duckdb.sql(sql.replace("FROM t", "FROM tt"),
                      params=None).df() if False else None
    con = duckdb.connect()
    con.register("t", table)
    want = con.execute(sql).df()
    con.close()
    return got, want


def _assert_same(got, want, sort_cols=None):
    if sort_cols:
        got = got.sort_values(sort_cols).reset_index(drop=True)
        want = want.sort_values(sort_cols).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(float), w.astype(float)), c
        else:
            assert (g == w).all(), c


def test_select_where_project(ray_session, table):
    sql = ("SELECT id, val FROM t WHERE kind = 'click' AND val >= 500 "
           "ORDER BY id LIMIT 50")
    got, want = _both(sql, table)
    _assert_same(got, want)


def test_where_in_between_like_not(ray_session, table):
    sql = ("SELECT id FROM t WHERE (kind IN ('view', 'error') "
           "OR val BETWEEN 10 AND 20) AND NOT name LIKE 'item000%' "
           "ORDER BY id")
    got, want = _both(sql, table)
    _assert_same(got, want)


def test_group_by_aggregates(ray_session, table):
    sql = ("SELECT grp, COUNT(*) AS n, SUM(val) AS total, MIN(val) AS lo, "
           "MAX(val) AS hi, AVG(val) AS mean FROM t GROUP BY grp "
           "ORDER BY grp")
    got, want = _both(sql, table)
    _assert_same(got, want)


def test_having_and_order_desc(ray_session, table):
    sql = ("SELECT kind, COUNT(*) AS n FROM t WHERE val < 900 "
           "GROUP BY kind HAVING n > 100 ORDER BY n DESC, kind")
    got, want = _both(sql, table)
    _assert_same(got, want)


def test_global_aggregate(ray_session, table):
    sql = "SELECT COUNT(*) AS n, SUM(val) AS s FROM t"
    got, want = _both(sql, table)
    _assert_same(got, want)


def test_parse_errors():
    # general LIKE is supported now; the pattern must still be a string
    assert parse_sql("SELECT * FROM t WHERE name LIKE '%mid%'")[
        "where"] == {"op": "like", "field": "name", "pattern": "%mid%"}
    with pytest.raises(ValueError):
        parse_sql("SELECT * FROM t WHERE name LIKE 5")
    with pytest.raises(ValueError):
        parse_sql("SELECT a * b FROM t")  # expression items require AS
    with pytest.raises(ValueError):
        parse_sql("DELETE FROM t")
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t JOIN u ON a = b")


def test_execute_rejects_bad_mix(ray_session, table):
    import ray.data

    with pytest.raises(ValueError):
        execute_sql("SELECT id, SUM(val) AS s FROM t",
                    {"t": ray.data.from_arrow(table)})


def test_cast_sum_bigint(ray_session, table):
    sql = ("SELECT grp, CAST(SUM(val) AS BIGINT) AS total, "
           "CAST(COUNT(*) AS DOUBLE) AS nf FROM t GROUP BY grp "
           "ORDER BY grp")
    got, want = _both(sql, table)
    _assert_same(got, want)


def test_cast_requires_alias():
    with pytest.raises(ValueError):
        parse_sql("SELECT CAST(SUM(v) AS BIGINT) FROM t")
    with pytest.raises(ValueError):
        parse_sql("SELECT CAST(v AS BLOB) AS x FROM t")
