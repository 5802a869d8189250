"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side at a given SF, compare row count,
column names/types, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        problems.append(f"columns ray={rc} sql={sc}")
        return problems
    a, b = canonical(ray_df), canonical(sql_df)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}] ray={a[c].dtype} sql={b[c].dtype}")
    try:
        if not a.equals(b):
            neq = (a.fillna("<null>") != b.fillna("<null>")).any(axis=0) if len(a) == len(b) else None
            if neq is not None:
                bad_cols = [c for c in a.columns if neq[c]]
                problems.append(f"values differ in cols {bad_cols}")
                for c in bad_cols[:2]:
                    mask = a[c].fillna("<null>") != b[c].fillna("<null>")
                    idx = mask[mask].index[:3]
                    for i in idx:
                        problems.append(f"  [{c}] row{i}: ray={a[c][i]!r} sql={b[c][i]!r}")
            else:
                problems.append("values differ (and rowcount)")
    except Exception as e:
        problems.append(f"compare error: {e}")
    return problems


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(ray_df)} rows, cols={sorted(ray_df.columns)}")
            n_rows_only += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ray_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    ray.shutdown()


if __name__ == "__main__":
    main()
