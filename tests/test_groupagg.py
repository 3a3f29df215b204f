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
