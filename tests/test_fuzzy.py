"""Fuzzy-join stage: batch-DP Levenshtein vs a reference implementation,
deletion-neighborhood completeness, and the end-to-end pair query."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ontology_time_machine_ray.stages import fuzzy


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[len(b)]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.text("abcde", max_size=10), st.text("abcde", max_size=10)),
        min_size=1,
        max_size=20,
    )
)
def test_levenshtein_batch_matches_reference(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = fuzzy.levenshtein_batch(a, b)
    want = np.array([_lev_ref(x, y) for x, y in pairs], dtype=np.int64)
    assert (got == want).all()


@settings(max_examples=40, deadline=None)
@given(st.sets(st.text("abc", min_size=1, max_size=7), min_size=2, max_size=12))
def test_deletion_blocking_is_complete(names):
    """FastSS completeness: every pair at ed <= k shares a k-deletion
    variant (Bocek et al. 2007) -- the property the distributed plan's
    exactness rests on."""
    k = fuzzy.MAX_DIST
    names = sorted(names)
    vs = {n: fuzzy._deletion_variants(n, k) for n in names}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if _lev_ref(a, b) <= k:
                assert vs[a] & vs[b], (a, b)


def test_fuzzy_name_pairs_matches_bruteforce(ray_session, sf_dir):
    import pyarrow.parquet as pq

    got = (
        fuzzy.fuzzy_name_pairs(sf_dir)
        .to_pandas()
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )
    names = (
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_name"])
        .to_pandas()
        .groupby("p_name", as_index=False)
        .agg(cnt=("p_name", "size"))
    )
    rows = []
    arr = names.to_numpy()
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            a, ca = arr[i]
            b, cb = arr[j]
            if a > b:
                a, b, ca, cb = b, a, cb, ca
            d = _lev_ref(a, b)
            if 1 <= d <= fuzzy.MAX_DIST:
                rows.append((a, b, d, ca, cb))
    want = (
        pd.DataFrame(rows, columns=["name_a", "name_b", "d", "n_a", "n_b"])
        .astype({"d": "int64", "n_a": "int64", "n_b": "int64"})
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
