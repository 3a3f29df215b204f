"""KMV cardinality sketch: exactness, error bound, mergeability."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_kmv_exact_below_saturation():
    from ontology_time_machine_ray.stages.sketch import kmv_estimate, kmv_partial

    s = pd.Series(np.arange(500, dtype=np.int64).repeat(3))
    sk = kmv_partial(s, k=1024)
    assert kmv_estimate(sk, 1024) == 500


def test_kmv_error_bound_above_saturation():
    from ontology_time_machine_ray.stages.sketch import kmv_estimate, kmv_partial

    n, k = 200_000, 1024
    s = pd.Series(np.arange(n, dtype=np.int64))
    est = kmv_estimate(kmv_partial(s, k), k)
    # stderr ~ 1/sqrt(k-2) ~ 3.1%; 5 sigma gives a deterministic-safe bound
    assert abs(est - n) / n < 0.16, f"KMV estimate {est} too far from {n}"


def test_kmv_merge_equals_single_pass():
    from ontology_time_machine_ray.stages.sketch import kmv_merge, kmv_partial

    rng = np.random.RandomState(2)
    vals = rng.randint(0, 50_000, 120_000)
    s = pd.Series(vals, dtype=np.int64)
    k = 512
    whole = kmv_partial(s, k)
    # split into uneven chunks, sketch each, merge in shuffled order
    chunks = np.array_split(vals, [10_000, 17_000, 90_000])
    parts = [kmv_partial(pd.Series(c, dtype=np.int64), k) for c in chunks]
    rng.shuffle(parts)
    merged = kmv_merge(parts, k)
    assert np.array_equal(whole, merged)


def test_distinct_count_sketch_distributed(ray_session):
    import ray.data as rd

    from ontology_time_machine_ray.stages.sketch import distinct_count_sketch

    rng = np.random.RandomState(9)
    df = pd.DataFrame({"v": rng.randint(0, 3000, 50_000).astype(np.int64)})
    got = distinct_count_sketch(rd.from_pandas(df).repartition(8), "v", k=8192)
    assert got == df["v"].nunique()
