"""Driver-style correctness check: run each queries() entry and its
oracle_sql() twin over the same sf_dir, compare row count, schema and
order-insensitive values.  Usage: python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

# `python tools/check_oracle.py` puts tools/ (not the repo root) on
# sys.path; make the harness runnable from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = normalize(ray_df), normalize(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(
                    av.fillna(np.nan).astype(float), bv.fillna(np.nan).astype(float),
                    rtol=0, atol=0, equal_nan=True,
                )
            else:
                ok = av.fillna("<NULL>").astype(str).equals(bv.fillna("<NULL>").astype(str))
            if not ok:
                diff = (av.fillna("<N>").astype(str) != bv.fillna("<N>").astype(str))
                idx = diff[diff].index[:3].tolist()
                problems.append(
                    f"col {c}: {int(diff.sum())} mismatches, e.g. idx {idx}: "
                    f"ray={av.iloc[idx[0] if idx else 0]!r} sql={bv.iloc[idx[0] if idx else 0]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ontology_time_machine_ray.context import tune_data_context

    tune_data_context()

    from ontology_time_machine_ray.pipelines.queries import QUERIES, oracle_sql_for

    oracles = oracle_sql_for(sf_dir)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(ray_df)} rows) {time.time()-t0:.1f}s")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: sql error {e}")
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print("   ", p)
        else:
            print(f"PASS {name}: {len(ray_df)} rows {time.time()-t0:.1f}s")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
