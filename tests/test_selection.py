"""Exact distributed top-N selection (stages/selection.py) vs a pandas
rank oracle, including the multi-round histogram-refinement path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ontology_time_machine_ray.stages import selection


def _oracle(df: pd.DataFrame, n: int) -> pd.DataFrame:
    r = df.sort_values(["quality", "doc_id"], ascending=[False, True])
    return r.head(n).sort_values("doc_id").reset_index(drop=True)


def _frame(seed: int, rows: int, scores: int, id_spread: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ids = rng.choice(np.arange(rows * id_spread, dtype=np.int64), rows, replace=False)
    return pd.DataFrame(
        {"doc_id": ids, "quality": rng.integers(0, scores, rows).astype(np.int64)}
    )


@pytest.mark.parametrize("pct", [1, 25, 50, 99, 100])
def test_top_pct_matches_rank_oracle(ray_session, pct):
    import ray.data as rd

    df = _frame(7, 500, 4, 3)
    n = (len(df) * pct + 99) // 100
    got = (
        selection.exact_top_n(rd.from_pandas(df), pct=pct, id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _oracle(df, n))


def test_top_n_multi_round_refinement(ray_session, monkeypatch):
    """Force several histogram rounds: tiny bins + a huge sparse id range
    so one 1024-bin round cannot isolate the cutoff."""
    import ray.data as rd

    monkeypatch.setattr(selection, "BINS", 4)
    monkeypatch.setattr(selection, "FINAL_FETCH_ROWS", 8)
    rng = np.random.default_rng(3)
    ids = rng.choice(np.arange(10_000_000, dtype=np.int64), 400, replace=False)
    # all-one scores -> every row is in the boundary group
    df = pd.DataFrame({"doc_id": ids, "quality": np.ones(400, dtype=np.int64)})
    got = (
        selection.exact_top_n(rd.from_pandas(df), n=137, id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _oracle(df, 137))


def test_top_n_edges(ray_session):
    import ray.data as rd

    df = _frame(11, 60, 3, 2)
    ds = rd.from_pandas(df)
    assert selection.exact_top_n(ds, n=0, id_col="doc_id").count() == 0
    assert selection.exact_top_n(ds, n=10_000, id_col="doc_id").count() == len(df)
    with pytest.raises(ValueError):
        selection.exact_top_n(ds, id_col="doc_id")
    with pytest.raises(ValueError):
        selection.exact_top_n(ds, n=3, pct=10, id_col="doc_id")


def test_sample_per_group_rank_and_invariance(ray_session, tmp_path):
    """Per-group sample picks exactly k min-md5-rank docs per group and
    is independent of input partitioning (the rank is a pure row
    function)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import sample_per_group

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": "x",
            "lang": ["en", "de"] * 20,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet")
    )
    out = sample_per_group(str(tmp_path), k=3).to_pandas()
    assert out.groupby("lang").size().to_dict() == {"de": 3, "en": 3}
    for lang, sub in docs.groupby("lang"):
        ranks = sorted(
            (hashlib.md5(f"spg:{d}".encode()).hexdigest(), d)
            for d in sub["doc_id"]
        )
        expect = {d for _, d in ranks[:3]}
        got = set(out.loc[out["lang"] == lang, "doc_id"])
        assert got == expect
