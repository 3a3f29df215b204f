"""groupagg primitives: bucketed join dtype preservation and exactness."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_bucketed_join_matches_pandas_and_keeps_dtypes(ray_session):
    import ray.data as rd

    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 50, 300).astype(np.int64),
            "lv": rng.randint(0, 1000, 300).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 50, 200).astype(np.int64),
            "rv": rng.randint(0, 1000, 200).astype(np.int64),
            "rs": [f"s{i}" for i in range(200)],
        }
    )
    got = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how="inner"
    ).to_pandas()
    # int columns must come back int64 (the union's NaN-fill floats them
    # transiently; the join restores the declared dtypes)
    assert got["k"].dtype == np.int64
    assert got["lv"].dtype == np.int64
    assert got["rv"].dtype == np.int64
    want = left.merge(right, on="k", how="inner")
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv", "rs"]].itertuples(index=False)))
    assert key(got) == key(want)


def test_bucketed_join_semi_anti(ray_session):
    import ray.data as rd

    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": np.arange(100, dtype=np.int64),
            "lv": rng.randint(0, 9, 100).astype(np.int64),
        }
    )
    # duplicate right keys must not multiply semi-join output rows
    right_keys = np.repeat(rng.choice(100, 40, replace=False).astype(np.int64), 3)
    right = pd.DataFrame({"k": right_keys, "junk": np.arange(len(right_keys))})

    semi = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how="semi"
    ).to_pandas()
    anti = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how="anti"
    ).to_pandas()

    member = set(right_keys.tolist())
    assert sorted(semi["k"]) == sorted(k for k in left["k"] if k in member)
    assert sorted(anti["k"]) == sorted(k for k in left["k"] if k not in member)
    assert len(semi) + len(anti) == len(left)
    # right payload columns never reach the output
    assert set(semi.columns) == {"k", "lv"}
    assert semi["lv"].dtype == np.int64


def test_bucketed_join_semi_anti_null_keys(ray_session):
    """SQL EXISTS semantics: a NULL key never matches, even against a NULL
    key on the right -- semi drops null-keyed left rows, anti keeps them."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    left = pd.DataFrame(
        {"k": pd.array([1, 2, None, None], dtype="Int64"), "lv": [10, 20, 30, 40]}
    )
    right = pd.DataFrame({"k": pd.array([2, None], dtype="Int64")})
    semi = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how="semi"
    ).to_pandas()
    anti = bucketed_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how="anti"
    ).to_pandas()
    assert sorted(semi["lv"]) == [20]
    assert sorted(anti["lv"]) == [10, 30, 40]


def test_rank_and_quantile_operators_vs_pandas(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa

    from ontology_time_machine_ray.pipelines.relational import (
        rank_parts_by_brand,
        segment_quantiles,
    )

    rng = np.random.RandomState(3)
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(200, dtype=np.int64),
            "p_brand": [f"B{i % 7}" for i in range(200)],
            "p_retailprice": np.round(rng.uniform(10, 500, 200), 2),
        }
    )
    cust = pd.DataFrame(
        {
            "c_mktsegment": [f"S{i % 3}" for i in range(300)],
            "c_acctbal": np.round(rng.uniform(-999, 9999, 300), 2),
        }
    )
    pq.write_table(pa.Table.from_pandas(part), str(tmp_path / "part.parquet"))
    pq.write_table(pa.Table.from_pandas(cust), str(tmp_path / "customer.parquet"))

    got = (
        rank_parts_by_brand(str(tmp_path))
        .to_pandas()
        .sort_values(["p_brand", "rnk"])
        .reset_index(drop=True)
    )
    want = part.sort_values(
        ["p_brand", "p_retailprice", "p_partkey"], ascending=[True, False, True]
    )
    want = want.assign(rnk=want.groupby("p_brand").cumcount() + 1)
    want = (
        want[want["rnk"] <= 3][["p_brand", "rnk", "p_partkey", "p_retailprice"]]
        .sort_values(["p_brand", "rnk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"rnk": "int64"}), want.astype({"rnk": "int64"})
    )

    q = segment_quantiles(str(tmp_path)).sort_values(["c_mktsegment", "q"]).reset_index(drop=True)
    for _, row in q.iterrows():
        vals = np.sort(
            (cust[cust["c_mktsegment"] == row["c_mktsegment"]]["c_acctbal"] * 100)
            .round()
            .astype("int64")
            .to_numpy()
        )
        import math

        target = max(1, math.ceil(row["q"] * len(vals)))
        assert row["acctbal"] == vals[target - 1] / 100.0


def test_bucketed_join_salted_hot_key(ray_session):
    """A pathological hot key (half of all left rows) joined with salt=8
    must give results identical to the unsalted join and to pandas, for
    inner, left, semi and anti."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    rng = np.random.RandomState(17)
    hot = np.zeros(500, dtype=np.int64)  # key 0 is hot
    cold = rng.randint(1, 40, 500).astype(np.int64)
    left = pd.DataFrame(
        {"k": np.concatenate([hot, cold]), "lv": np.arange(1000, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.arange(0, 30, dtype=np.int64), "rv": np.arange(30, dtype=np.int64) * 7}
    )
    for how in ("inner", "left", "semi", "anti"):
        got = bucketed_join(
            rd.from_pandas(left), rd.from_pandas(right), on=["k"], how=how, salt=8
        ).to_pandas()
        if how in ("semi", "anti"):
            member = set(right["k"])
            keep = left["k"].isin(member)
            want = left[keep if how == "semi" else ~keep]
            assert sorted(got["lv"]) == sorted(want["lv"])
            assert set(got.columns) == {"k", "lv"}
        else:
            want = left.merge(right, on="k", how=how)
            key = lambda df: sorted(
                map(tuple, df[["k", "lv", "rv"]].fillna(-1).itertuples(index=False))
            )
            assert key(got) == key(want)
        assert "_salt" not in got.columns


def test_bloom_semi_anti_join_exact_and_prefilters(ray_session):
    """Bloom-prefiltered semi/anti equals the plain bucketed join exactly,
    and the shuffled residue is a small fraction of the left side when key
    overlap is sparse."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.groupagg import (
        bloom_semi_anti_join,
        bucketed_join,
    )
    from ontology_time_machine_ray.stages.sketch import bloom_contains, bloom_of

    rng = np.random.RandomState(23)
    # key column deliberately NOT first: the anti bypass stream must be
    # reindexed to the join output's order before the positional union
    left = pd.DataFrame(
        {
            "lv": np.arange(5000, dtype=np.int64),
            "k": rng.randint(0, 1_000_000, 5000).astype(np.int64),
        }
    )
    # sparse overlap: 40 of the left's keys, plus 60 unrelated ones
    right = pd.DataFrame(
        {"k": np.concatenate([left["k"].to_numpy()[:40],
                              rng.randint(2_000_000, 3_000_000, 60).astype(np.int64)])}
    )
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    for how in ("semi", "anti"):
        # odd m_bits: build and probe must still agree on the modulus
        got = bloom_semi_anti_join(lds, rds, on="k", how=how, m_bits=1_000_001).to_pandas()
        want = bucketed_join(lds, rds, on=["k"], how=how).to_pandas()
        assert sorted(got["lv"]) == sorted(want["lv"])
    # the prefilter really cuts the shuffled volume
    bits = bloom_of(rds, "k")
    residue = int(bloom_contains(bits, left["k"]).sum())
    assert residue < len(left) // 10


def test_profile_lineitem_null_and_encoding(ray_session, tmp_path):
    """Profile rollup on a hand table with nulls: counts, distincts and
    the zero-padded canonical encodings (lexicographic == numeric)."""
    import pandas as pd

    from ontology_time_machine_ray.pipelines import relational

    df = pd.DataFrame(
        {
            "l_returnflag": ["A", None, "R", "A"],
            "l_linestatus": ["O", "F", "O", "F"],
            "l_quantity": [5.0, 45.0, None, 5.0],
            "l_shipdate": pd.to_datetime(
                ["1995-01-01", "1992-06-15", "1998-11-30", None]
            ),
        }
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "lineitem.parquet"))
    out = (
        relational.profile_lineitem(str(tmp_path))
        .to_pandas()
        .set_index("col_name")
        .sort_index()
    )
    rf = out.loc["l_returnflag"]
    assert (rf["n_rows"], rf["n_null"], rf["n_distinct"]) == (4, 1, 2)
    assert (rf["min_v"], rf["max_v"]) == ("A", "R")
    q = out.loc["l_quantity"]
    assert (q["n_rows"], q["n_null"], q["n_distinct"]) == (4, 1, 2)
    # 45.0 > 5.0 numerically AND lexicographically thanks to the padding
    assert q["min_v"] == "000000000500" and q["max_v"] == "000000004500"
    sd = out.loc["l_shipdate"]
    assert sd["n_null"] == 1 and sd["n_distinct"] == 3
    assert sd["min_v"] < sd["max_v"]


def test_events_outliers_integer_zscore(ray_session, tmp_path):
    """The integer-squared z-score test flags exactly the >3-sigma event
    and never flags degenerate groups (n=1 and n=2 can't exceed 3
    sigma by construction)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.pipelines.relational import events_outliers

    vals = [10.0] * 30 + [10.5] * 30 + [9.5] * 30 + [500.0]  # one spike
    ev = pd.DataFrame(
        {
            "event_id": range(len(vals) + 3),
            "user_id": [1] * len(vals) + [2] + [3, 3],
            "value": vals + [42.0, 7.0, 9.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
    out = events_outliers(str(tmp_path)).to_pandas()
    assert out["event_id"].tolist() == [len(vals) - 1]  # the 500.0 spike
    assert out["value_c"].tolist() == [50000]
    # scalar replay of the inequality on the spike row
    v = np.array([round(x * 100) for x in vals], dtype="int64")
    n, s, sq = len(v), int(v.sum()), int((v**2).sum())
    assert (n * 50000 - s) ** 2 > 9 * (n * sq - s * s)


def test_events_late_arrivals_watermark(ray_session, tmp_path):
    """Watermark semantics on a hand stream: event_id 11 (delayed by
    the %11 rule to arrive after ids 12..60) has event-time far below
    the watermark its successors advanced -> exactly one late event."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.pipelines.relational import events_late_arrivals

    base = pd.Timestamp("2024-01-01")
    ids = list(range(1, 70))
    ev = pd.DataFrame(
        {
            "event_id": ids,
            "user_id": 7,
            # event time tracks id: 1 minute apart
            "ts": [base + pd.Timedelta(minutes=i) for i in ids],
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
    out = events_late_arrivals(str(tmp_path)).to_pandas()
    assert int(out["n_events"].sum()) == len(ids)
    # delayed ids 11, 22, 33, 44, 55 arrive 50 slots late; each is then
    # ~50 minutes behind the watermark (>> 300 s lateness) -> all late.
    # id 66 arrives last (slot 116) but only 3 min behind the max event
    # time (< 300 s allowed lateness) -> on time.
    assert int(out["n_late"].sum()) == 5


def test_profile_encoding_rejects_negatives():
    import pandas as pd
    import pytest

    from ontology_time_machine_ray.pipelines.relational import _profile_canonical

    with pytest.raises(ValueError, match="non-negative"):
        _profile_canonical(pd.Series([1.0, -5.0]), "cents")


def test_events_outliers_overflow_guard(ray_session, tmp_path):
    """Values big enough to overflow the int64 z-test raise loudly (the
    SQL oracle errors on BIGINT overflow; numpy must not wrap silently)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from ontology_time_machine_ray.pipelines.relational import events_outliers

    ev = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": 1,
            "value": [9e7, 9e7, 9e7, 1e8],  # ~1e10 cents each: s ~ 4e10
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="int64 range"):
        events_outliers(str(tmp_path)).materialize()

    # regression: the rhs k^2*(n*sq - s^2) can wrap while |d| and |s| look
    # safe -- v = [0, 1.5e9] cents wraps rhs to ~1.8e18 and the old guard
    # passed, silently flagging BOTH 1-sigma events as 3-sigma outliers.
    # The bound must raise, never emit wrong rows.
    ev2 = pd.DataFrame(
        {"event_id": [0, 1], "user_id": 7, "value": [0.0, 1.5e7]}  # 1.5e9 cents
    )
    d2 = tmp_path / "wrap"
    d2.mkdir()
    pq.write_table(pa.Table.from_pandas(ev2), str(d2 / "events.parquet"))
    with pytest.raises(Exception, match="int64 range"):
        events_outliers(str(d2)).materialize()
