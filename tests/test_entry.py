"""Driver-contract smoke: a fast subset of __ray_entry__ queries checked
against their DuckDB oracles at sf0.001 (the full set runs via
tools/check_entry.py at sf0.01)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

FAST_SQL_CHECKED = [
    "bm25_top10",
    "term_df",
    "pricing_summary",
    "facet_lang",
    "exact_dedup_docs",
    "semi_join_building",
    "timeseries_hourly",
    "token_counts",
    "knn_cosine",
    "atomic_update_inc",
    "filter_bool",
    "cursor_page2",
    "geofilt",
    "sql_group",
    "rerank_trees",
    "langid",
    "quality",
]


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", FAST_SQL_CHECKED)
def test_query_matches_oracle(entrymod, con, name):
    res = entrymod.queries()[name](SF_DIR)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    got = _normalize(got)
    want = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            eq = (a == b) | (np.isnan(a.astype(float)) & np.isnan(b.astype(float)))
            assert eq.all(), f"{name}.{c}: max diff {np.abs(a - b).max()}"
        else:
            assert (a == b).all(), f"{name}.{c}"


def test_entry_smoke(entrymod):
    df = entrymod.entry().to_pandas()
    assert len(df) > 0
    assert list(df.columns) == ["qid", "rank", "doc_id", "url", "score"]


def test_every_query_has_callable(entrymod):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs), "oracle_sql keys must be queries() keys"
    assert len(qs) >= 40
    assert len(sqls) >= 30
