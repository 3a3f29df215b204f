"""In-suite driver simulation: a cross-family sample of registry queries
compared against their DuckDB oracles exactly the way the external
harness (tools/check_oracle.py) and the driver do -- row count, schema,
order-insensitive values.  The FULL sweep runs out-of-suite (it takes
minutes; see ORACLE_SWEEP_r05.json); this keeps a canary inside
``pytest`` so registry/oracle drift fails CI, not just the round gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

#: one representative per family, biased to round-5 additions (cheap at
#: sf0.001; the heavyweights are covered by the external sweep)
SAMPLE = [
    "kg_report",             # kg aggregate
    "kg_skipgram_negatives", # kg walks + negative sampling
    "rel_q1_lineitem",       # relational
    "events_users_kmv",      # grouped sketch
    "rel_distinct_hll",      # integer-exact estimator replay
    "text_bpe_encode",       # BPE vs scalar-reference vocab
    "dedup_substrings",      # maximal-run ExactSubstr
    "dup_run_stats",         # detection-side runs
    "corpus_mix_temperature",# derived-rate mixing
    "corpus_report",         # composition dashboard
    "docs_csv_stats",        # alternate source format
    "media_catalog",         # media family
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(ray_session, sf_dir, name):
    import duckdb

    from ontology_time_machine_ray.pipelines.queries import QUERIES, oracle_sql_for

    oracles = oracle_sql_for(sf_dir)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    ray_df = _to_pandas(QUERIES[name](sf_dir))
    sql_df = con.sql(oracles[name]).df()
    assert sorted(ray_df.columns) == sorted(sql_df.columns), name
    assert len(ray_df) == len(sql_df), name
    a, b = _normalize(ray_df), _normalize(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(
                av.fillna(np.nan).astype(float),
                bv.fillna(np.nan).astype(float),
                rtol=0,
                atol=0,
                equal_nan=True,
            ), (name, c)
        else:
            assert (
                av.fillna("<NULL>").astype(str).equals(bv.fillna("<NULL>").astype(str))
            ), (name, c)
