"""Local mirror of the driver's correctness harness.

Runs every ``queries()[name](sf_dir)`` and, when an ``oracle_sql()`` entry
exists, the matching DuckDB SQL over the same parquet tables; compares row
count, column names, and order-insensitive values (sorted by all columns).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                # EXACT float comparison — the driver hashes exact values,
                # and a tolerance here is how the round-3 q10 cent flake
                # sailed through a green local sweep (nan == nan allowed)
                x = av.astype(float).to_numpy()
                y = bv.astype(float).to_numpy()
                eq = (x == y) | (np.isnan(x) & np.isnan(y))
                ok = bool(eq.all())
                bad = (~eq).nonzero()[0][:3]
            else:
                eq_s = av.astype(str) == bv.astype(str)
                ok = bool(eq_s.all())
                bad = (~eq_s).to_numpy().nonzero()[0][:3]
            if not ok:
                problems.append(
                    f"col {c} differs, e.g. rows {bad.tolist()}: "
                    f"ray={av.iloc[bad].tolist()} sql={bv.iloc[bad].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import importlib

    m = importlib.import_module("__ray_entry__")
    qs, oracles = m.queries(), m.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        ray_s = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(ray_df)} ({ray_s:.1f}s) [rows-only]")
            continue
        t0 = time.time()
        sql_df = con.sql(oracles[name]).df()
        sql_s = time.time() - t0
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: ({ray_s:.1f}s ray, {sql_s:.1f}s sql)")
            for p in problems:
                print(f"     {p}")
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(ray_df)} ({ray_s:.1f}s ray, {sql_s:.1f}s sql)")
    print("FAILED:" if failed else "ALL OK", failed if failed else "")
    return 1 if failed else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
