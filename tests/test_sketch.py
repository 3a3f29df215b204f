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


def test_mg_error_bound_and_exactness():
    """Misra-Gries guarantees: exact when distinct <= k; undercount bounded
    by n/(k+1) under saturation; merge of partials respects the bound."""
    import numpy as np
    import pandas as pd

    from ontology_time_machine_ray.stages.sketch import mg_merge, mg_partial

    rng = np.random.RandomState(3)
    # skewed stream: value v has frequency ~ 1/(v+1)
    stream = np.concatenate([np.full(2000 // (v + 1), v) for v in range(100)])
    rng.shuffle(stream)
    true = pd.Series(stream).value_counts()

    # unsaturated: k >= distinct -> exact
    exact = mg_partial(true, k=200)
    pd.testing.assert_series_equal(
        exact.sort_index(), true.sort_index(), check_names=False
    )

    # saturated, merged from block partials: undercount <= n / (k+1)
    k = 8
    blocks = np.array_split(stream, 7)
    partials = [mg_partial(pd.Series(b).value_counts(), k) for b in blocks]
    merged = mg_merge(partials, k)
    n = len(stream)
    for v, est in merged.items():
        t = true[v]
        assert est <= t, "MG never overcounts"
        assert t - est <= n // (k + 1) + 1
    # every truly heavy item (count > n/(k+1)) must survive the merge
    for v, t in true.items():
        if t > n / (k + 1):
            assert v in merged.index


def test_quantile_sketch_bounds_and_exactness(ray_session):
    """Weighted quantile sketch: exact when every block is unsaturated;
    rank error <= sum(n_i/k) when saturated."""
    import numpy as np
    import ray.data as rd

    from ontology_time_machine_ray.stages.sketch import (
        quantile_sketch_merge,
        quantile_sketch_partial,
        quantile_sketch_query,
        quantiles_sketched,
    )

    rng = np.random.RandomState(9)
    data = rng.lognormal(3, 1, 50_000)
    blocks = np.array_split(data, 7)

    # unsaturated: k >= block size -> exact quantile_disc
    sk = quantile_sketch_merge([quantile_sketch_partial(b, k=10_000) for b in blocks])
    svals = np.sort(data)
    for q in (0.1, 0.5, 0.95):
        import math

        exact = svals[max(1, math.ceil(q * len(svals))) - 1]
        assert quantile_sketch_query(sk, q) == exact

    # saturated (k=128 per block): rank error <= sum(n_i / k)
    k = 128
    sk = quantile_sketch_merge([quantile_sketch_partial(b, k=k) for b in blocks])
    budget = sum(len(b) / k for b in blocks)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = quantile_sketch_query(sk, q)
        rank = np.searchsorted(svals, est, side="right")
        assert abs(rank - q * len(svals)) <= budget + 1

    # q=1.0 under saturation: float drift in n/k weights must not wrap the
    # answer to the MINIMUM (target clamped to the total weight); the
    # correct saturated answer is the sketch's LAST sample
    sk_odd = quantile_sketch_merge(
        [quantile_sketch_partial(data[:7143], k=1000)]
    )
    assert quantile_sketch_query(sk_odd, 1.0) == sk_odd[0][-1]
    # empty sketch -> NaN, not a crash
    assert np.isnan(quantile_sketch_query(quantile_sketch_merge([]), 0.5))

    # the Dataset wrapper agrees with the driver-side merge
    import pandas as pd

    got = quantiles_sketched(
        rd.from_pandas(pd.DataFrame({"x": data})), "x", [0.5], k=65_536
    )  # k >= any single Ray block -> unsaturated -> exact
    assert got[0.5] == svals[max(1, int(np.ceil(0.5 * len(svals)))) - 1]


def test_hll_accuracy_merge_and_exact_bitlength():
    """HLL: (a) the raw estimator lands within ~4 sigma (13%) of truth on
    10k distinct keys at m=1024; (b) merging block partials equals one
    global partial (commutative monoid); (c) the vectorized bit-length
    helper is exact at the 2^53 float boundary where a log2-based
    version rounds to the neighbouring power of two."""
    import numpy as np
    import pandas as pd

    from ontology_time_machine_ray.stages.sketch import (
        _bit_length_u64,
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    vals = pd.Series([f"key-{i}" for i in range(10_000)])
    est = hll_estimate(hll_partial(vals))
    assert abs(est["estimate"] - 10_000) / 10_000 < 0.13, est
    assert est["m"] == 1024

    parts = [hll_partial(vals[i::4]) for i in range(4)]
    assert (hll_merge(parts) == hll_partial(vals)).all()

    x = np.array(
        [0, 1, 2**53 - 1, 2**53, 2**53 + 1, 2**54 - 1, 2**63], dtype=np.uint64
    )
    want = [0, 1, 53, 54, 54, 54, 64]
    assert _bit_length_u64(x).tolist() == want


def test_hll_registers_match_scalar_replay():
    """Register contents vs a per-value Python replay of the same md5
    hash split (top-p register, leading-zero rho)."""
    import numpy as np
    import pandas as pd

    from ontology_time_machine_ray.functions.hashing import md5_hash64_series
    from ontology_time_machine_ray.stages.sketch import HLL_P, hll_partial

    vals = pd.Series([f"v{i}" for i in range(500)])
    got = hll_partial(vals)
    m = 1 << HLL_P
    width = 64 - HLL_P
    want = np.zeros(m, dtype=np.uint8)
    for h in md5_hash64_series(vals).tolist():
        reg = h >> width
        suffix = h & ((1 << width) - 1)
        rho = width - suffix.bit_length() + 1
        want[reg] = max(want[reg], rho)
    assert (got == want).all()


def test_events_users_kmv_saturation_paths(ray_session, sf_dir):
    """Grouped KMV per hour: below saturation the result is the exact
    per-hour COUNT(DISTINCT); with a tiny k the estimate path engages
    and stays within the KMV error envelope."""
    import pandas as pd

    from ontology_time_machine_ray.stages.sketch import events_users_kmv

    got = (
        events_users_kmv(sf_dir)
        .to_pandas()
        .set_index("hour")["n_distinct"]
        .sort_index()
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    want = (
        ev.assign(hour=ev["ts"].dt.floor("h"))
        .groupby("hour")["user_id"]
        .nunique()
        .sort_index()
    )
    # unit-normalize the index (Ray round-trips as ns, parquet is us)
    got.index = got.index.astype("datetime64[us]")
    want.index = want.index.astype("datetime64[us]")
    assert got.index.equals(want.index)
    assert (got == want).all()  # k=1024 >> per-hour users: exact

    est = (
        events_users_kmv(sf_dir, k=4)
        .to_pandas()
        .set_index("hour")["n_distinct"]
        .sort_index()
    )
    est.index = est.index.astype("datetime64[us]")
    # saturated hours: bounded-error estimate, positive, not insane
    assert (est > 0).all()
    assert (est <= want * 6 + 8).all()
