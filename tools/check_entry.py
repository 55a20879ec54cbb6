"""Driver-mimic: run each __ray_entry__ query at sf0.01 and compare with its
DuckDB oracle (sorted columns, sorted rows, exact values; floats reported
with max-abs-diff on mismatch). Usage:

    python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
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


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            got = normalize(to_pandas(qs[name](sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows  ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            want = normalize(con.execute(sqls[name]).df())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL raised: {ex}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind == "f":
                eq = (a == b) | (np.isnan(a) & np.isnan(b))
                if not eq.all():
                    bad = (c, float(np.nanmax(np.abs(a - b))),
                           int((~eq).sum()))
                    break
            else:
                if not (a == b).all():
                    i = int(np.flatnonzero(a != b)[0])
                    bad = (c, f"first diff row {i}: {a[i]!r} != {b[i]!r}", "")
                    break
        if bad:
            print(f"[FAIL] {name}: col {bad[0]} mismatch ({bad[1]}, "
                  f"{bad[2]} rows)")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(got)} rows  ({dt:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
