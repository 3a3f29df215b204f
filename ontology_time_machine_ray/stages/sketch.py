"""Mergeable cardinality sketch (KMV / bottom-k) as a distributed operator.

K-Minimum-Values estimates |distinct| from the k smallest values of a
uniform 64-bit hash of the column: each block emits its k smallest unique
hashes (a partial sketch, <= k * 8 bytes regardless of block size), the
driver unions the tiny partials and keeps the global k smallest.  If the
union holds fewer than k distinct hashes the sketch is *saturation-free*
and the count is EXACT -- which is what makes the operator DuckDB
oracle-checkable at test scale (`count(DISTINCT ...)`) while degrading to
a (k-1) * 2^64 / h_(k) estimate with ~1/sqrt(k-2) relative error on
corpora with billions of distinct keys.

Scale shape: one streaming pass, no shuffle at all (the partials are the
only thing that ever leaves a worker), driver merge is O(blocks * k).
This is the pattern the exact `distinct_customers` operator cannot
follow -- its bucketed shuffle moves every distinct key once -- so the
sketch is the 100-TB path and the exact operator the small-side path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray.data as rd

from ontology_time_machine_ray.functions.hashing import (
    md5_hash64_series,
    stable_hash64_series,
)
from ontology_time_machine_ray.sources.readers import sized_read_parquet


def kmv_partial(values: pd.Series, k: int) -> np.ndarray:
    """The k smallest unique hash values of ``values`` (sorted uint64)."""
    return kmv_partial_from_hashes(stable_hash64_series(values), k)


def kmv_merge(partials: list[np.ndarray], k: int) -> np.ndarray:
    """Union partial sketches and keep the global k smallest (the sketch
    is a bounded-size commutative monoid: merge order never matters)."""
    if not partials:
        return np.array([], dtype=np.uint64)
    return kmv_partial_from_hashes(np.concatenate(partials), k)


def kmv_partial_from_hashes(h: np.ndarray, k: int) -> np.ndarray:
    h = np.unique(h.astype(np.uint64))
    if len(h) > k:
        h = np.partition(h, k - 1)[:k]
        h.sort()
    return h


def kmv_estimate(sketch: np.ndarray, k: int) -> int:
    """Distinct-count estimate: exact when unsaturated (< k hashes seen),
    else the classic KMV estimator (k-1) / F(h_(k)) with F the fraction
    of the hash space below the k-th minimum."""
    if len(sketch) < k:
        return int(len(sketch))
    kth = float(sketch[k - 1]) + 1.0  # h_(k), half-open hash space
    return int(round((k - 1) * (2.0 ** 64) / kth))


def distinct_count_sketch(ds: rd.Dataset, column: str, k: int = 8192) -> int:
    """Streaming distinct-count of ``ds[column]`` via KMV."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = kmv_partial(df[column], k)
        return pd.DataFrame({"h": sk})

    partials = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()["h"]
        .to_numpy()
    )
    return kmv_estimate(kmv_partial_from_hashes(partials, k), k)


def distinct_customers_sketch(sf_dir: str, k: int = 32768) -> pd.DataFrame:
    """Query entry: distinct order customers via the sketch.  At sf<=0.1
    (<= ~15k distinct customers < k) the sketch is unsaturated, so the
    result equals the exact ``count(DISTINCT o_custkey)`` oracle; at
    corpus scale the same code returns the bounded-error estimate
    (~1/sqrt(k-2) ~ 0.55% relative) without ever shuffling.  A partial is
    still only k * 8 bytes = 256 KB per block."""
    import os

    ds = sized_read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )
    n = distinct_count_sketch(ds, "o_custkey", k)
    return pd.DataFrame({"n_distinct": pd.Series([n], dtype="int64")})


# --------------------------------------------------------------------- #
# Misra-Gries heavy-hitter summary (mergeable frequency sketch)          #
# --------------------------------------------------------------------- #
def mg_partial(counts: pd.Series, k: int) -> pd.Series:
    """Compress exact value->count pairs to a Misra-Gries summary of at
    most ``k`` counters: keep the k largest, decrement all by the
    (k+1)-th largest (the classic reduction).  Any item's stored count
    undercounts its true count by at most (stream length)/(k+1)."""
    if len(counts) <= k:
        return counts
    top = counts.sort_values(ascending=False, kind="stable")
    dec = int(top.iloc[k])
    out = top.iloc[:k] - dec
    return out[out > 0]

def mg_merge(partials: list[pd.Series], k: int) -> pd.Series:
    """Merge MG summaries: sum counters, re-compress to k (Agarwal et al.
    2013 -- mergeable summaries; errors add, staying <= n_total/(k+1))."""
    if not partials:
        return pd.Series(dtype="int64")
    total = pd.concat(partials).groupby(level=0).sum()
    return mg_partial(total, k)

def heavy_hitters_sketch(
    ds: rd.Dataset, column: str, k_counters: int = 4096, top: int = 20
) -> pd.DataFrame:
    """Top-``top`` most frequent values of ``ds[column]`` by Misra-Gries:
    one pass, no shuffle -- each block ships <= k_counters counters to the
    driver (the frequency analog of the KMV distinct sketch).  EXACT when
    the global distinct count is <= k_counters (no decrement ever fires),
    which is the oracle-checkable regime at test scale; at corpus scale
    the same code returns every value with true count > n/(k_counters+1)
    with bounded undercount.  Deterministic (count desc, value asc) cut."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[column].value_counts()  # exact within the block
        s = mg_partial(vc, k_counters)
        return pd.DataFrame({"v": s.index, "n": s.to_numpy().astype("int64")})

    parts = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    merged = mg_merge([parts.set_index("v")["n"]], k_counters)
    out = merged.rename_axis("v").reset_index(name="n")
    return (
        out.sort_values(["n", "v"], ascending=[False, True], kind="stable")
        .head(top)
        .reset_index(drop=True)
    )

def top_terms_sketch(sf_dir: str, k_counters: int = 4096, top: int = 20) -> pd.DataFrame:
    """Query entry: top terms by total OCCURRENCE count via the MG sketch
    (vs ``textops.top_terms``'s exact shuffle path, which ranks by
    document frequency).  Unsaturated at test scale (tiny vocabulary) ->
    equals the exact SQL answer; the same operator degrades gracefully at
    corpus scale instead of shuffling the full term table."""
    import os

    docs = sized_read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def explode_terms(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"\S+")
        return pd.DataFrame({"term": toks.explode().dropna().to_numpy()})

    terms = docs.map_batches(explode_terms, batch_format="pandas")
    out = heavy_hitters_sketch(terms, "term", k_counters, top)
    return out.rename(columns={"v": "term", "n": "n_occurrences"})


def events_users_kmv(sf_dir: str, k: int = 1024) -> rd.Dataset:
    """Distinct users PER HOUR via grouped KMV -- the sketch composed
    INSIDE a groupby: each batch emits its per-hour bottom-k distinct
    user hashes (<= groups-in-batch x k rows, never the events), one
    hour-bucketed exchange co-locates each hour's partials, and the
    per-hour union-of-bottom-k yields the exact count below saturation
    (the oracle is plain ``COUNT(DISTINCT)`` per hour) or the KMV
    estimate above it.  The grain that moves is (hour, hash) -- at
    100 TB the exchange is bounded by hours x blocks x k, not events."""
    import os

    ds = sized_read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "hour": df["ts"].dt.floor("h"),
                "h": md5_hash64_series(df["user_id"].astype(str)),
            }
        ).drop_duplicates()
        # bottom-k per group: the per-batch combiner
        return out.sort_values(["hour", "h"]).groupby("hour", sort=False).head(k)

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    sparse = ds.map_batches(partial, batch_format="pandas")

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"hour": [], "n_distinct": []}
        for hour, sub in g.groupby("hour", sort=False):
            hs = np.unique(sub["h"].to_numpy().astype(np.uint64))
            if len(hs) < k:
                n = len(hs)  # saturation-free: exact
            else:
                n = kmv_estimate(hs[:k], k)
            rows["hour"].append(hour)
            rows["n_distinct"].append(n)
        return pd.DataFrame(
            {
                "hour": pd.Series(rows["hour"]),
                "n_distinct": pd.Series(rows["n_distinct"], dtype="int64"),
            }
        )

    return grouped_apply(sparse, ["hour"], estimate)


# --------------------------------------------------------------------- #
# HyperLogLog (mergeable register sketch; Flajolet et al. 2007)          #
# --------------------------------------------------------------------- #
#: register-index bits: m = 2^HLL_P = 1024 registers (4 KB partial;
#: ~1.04/sqrt(m) ~ 3.3% relative standard error).
HLL_P = 10

#: alpha_m for m=1024 (0.7213 / (1 + 1.079/m)) in e6 fixed point -- a
#: FROZEN integer constant so both engines compute the identical
#: estimator with no float in sight.
HLL_ALPHA_E6 = 720541


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (64 shift passes --
    no float conversion, so values above 2^53 can never round to a
    neighbouring power of two the way a log2-based version silently
    would)."""
    bl = np.zeros(len(x), dtype=np.int64)
    s = x.copy()
    while s.any():
        bl[s > 0] += 1
        s = s >> np.uint64(1)
    return bl


def hll_partial(values: pd.Series, p: int = HLL_P) -> np.ndarray:
    """Per-block register array (uint8[2^p]): max over the block of
    rho(h) per register, with h the engine-standard 64-bit md5 hash
    (top ``p`` bits = register, rho = leading-zero count of the
    remaining ``64-p`` bits + 1).  Partials merge by elementwise max --
    the same commutative-monoid shape as KMV/Bloom, so every block
    ships exactly 2^p bytes to the driver."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    vals = values.dropna().astype(str).drop_duplicates()
    if not len(vals):
        return regs
    h = md5_hash64_series(vals)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    width = 64 - p
    suffix = h & np.uint64((1 << width) - 1)
    rho = (width - _bit_length_u64(suffix) + 1).astype(np.uint8)
    np.maximum.at(regs, reg, rho)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    return np.maximum.reduce(partials) if partials else np.zeros(1 << HLL_P, np.uint8)


def hll_estimate(regs: np.ndarray, p: int = HLL_P) -> dict:
    """The raw HLL estimator in EXACT integer arithmetic: the harmonic
    sum of 2^-rho_j is a dyadic rational, so it is carried as the
    integer Σ 2^(S - rho_j) with S = 64-p+1 (arbitrary-precision Python
    int; the SQL replay uses HUGEINT), and the alpha_m multiplier is
    the frozen e6 constant -- both engines floor-divide to the same
    BIGINT.  No small-range/large-range corrections: the exact-below-
    saturation counter in this engine is the KMV sketch; this operator
    is the bounded-memory register-merge shape, and its oracle replays
    the estimator, not a true count."""
    m = 1 << p
    scale = 64 - p + 1
    rho = regs.astype(np.int64).tolist()  # PYTHON ints: the harmonic sum
    # reaches m * 2^scale = 2^65, past int64 -- a numpy accumulator here
    # wraps silently
    s = sum(1 << (scale - r) for r in rho)
    est = (HLL_ALPHA_E6 * m * m * (1 << scale)) // s // 1_000_000
    return {
        "m": m,
        "zeros": int((regs == 0).sum()),
        "max_rho": max(rho) if rho else 0,
        "estimate": int(est),
    }


def distinct_hll(ds: "rd.Dataset", column: str, p: int = HLL_P) -> dict:
    """Streaming distinct-count estimate of ``ds[column]`` via HLL."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"regs": [hll_partial(df[column], p)]})

    parts = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()["regs"]
        .tolist()
    )
    return hll_estimate(hll_merge([np.asarray(r, dtype=np.uint8) for r in parts]), p)


def distinct_customers_hll(sf_dir: str) -> pd.DataFrame:
    """Query entry: the HLL estimate over order customers, one row
    (m, zeros, max_rho, estimate).  The oracle replays registers,
    dyadic harmonic sum and fixed-point alpha in SQL bit-for-bit."""
    import os

    ds = sized_read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )
    r = distinct_hll(ds, "o_custkey")
    return pd.DataFrame(
        {
            "m": pd.Series([r["m"]], dtype="int64"),
            "zeros": pd.Series([r["zeros"]], dtype="int64"),
            "max_rho": pd.Series([r["max_rho"]], dtype="int64"),
            "estimate": pd.Series([r["estimate"]], dtype="int64"),
        }
    )


# --------------------------------------------------------------------- #
# Bloom filter (mergeable membership sketch for join pre-filtering)      #
# --------------------------------------------------------------------- #
BLOOM_BITS = 1 << 20  # 128 KB per partial; fp(k=2) ~ 0.1% at 17k keys, ~3% at 100k


def bloom_partial(values: pd.Series, m_bits: int = BLOOM_BITS) -> np.ndarray:
    """Per-block Bloom bit array (two derived hash probes per value).
    Partials merge by OR -- a commutative monoid like the KMV sketch, so
    each block ships m/8 bytes to the driver regardless of block size.
    ``m_bits`` is rounded UP to a whole byte so build and probe always use
    the identical modulus (len(bits) * 8)."""
    m_bits = (m_bits + 7) // 8 * 8
    h = stable_hash64_series(values).astype(np.uint64)
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for probe in (h % m_bits, (h >> np.uint64(32)) % m_bits):
        p = probe.astype(np.int64)
        np.bitwise_or.at(bits, p // 8, (1 << (p % 8)).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, values: pd.Series) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (fp possible),
    False = DEFINITELY absent (the side bloom filtering is exact on)."""
    m_bits = len(bits) * 8
    h = stable_hash64_series(values).astype(np.uint64)
    out = np.ones(len(h), dtype=bool)
    for probe in (h % m_bits, (h >> np.uint64(32)) % m_bits):
        p = probe.astype(np.int64)
        out &= (bits[p // 8] & (1 << (p % 8)).astype(np.uint8)) != 0
    return out


def bloom_of(ds: rd.Dataset, column: str, m_bits: int = BLOOM_BITS) -> np.ndarray:
    """Distributed Bloom build: one pass, per-block partials OR-merged on
    the driver (O(blocks * m/8) bytes driver-side, never the keys)."""

    m_bits = (m_bits + 7) // 8 * 8  # same rounding as bloom_partial

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bits": [bloom_partial(df[column], m_bits)]})

    parts = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()["bits"]
    )
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for p in parts:
        bits |= np.asarray(p, dtype=np.uint8)
    return bits


# --------------------------------------------------------------------- #
# Weighted quantile sketch (mergeable, GK/KLL-lite)                      #
# --------------------------------------------------------------------- #
def quantile_sketch_partial(values: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-block quantile summary: if the block holds <= k values, ship
    them all with weight 1 (EXACT); otherwise ship k evenly-spaced order
    statistics, each carrying weight n/k.  A block's summary mis-ranks any
    query point by at most n/k, so a merge over all blocks is off by at
    most N/k_total ranks -- the simple mergeable-summary bound."""
    v = np.sort(np.asarray(values))
    n = len(v)
    if n <= k:
        return v, np.ones(n)
    idx = ((np.arange(k) + 0.5) * n / k).astype(np.int64)
    return v[idx], np.full(k, n / k)


def quantile_sketch_merge(
    partials: list[tuple[np.ndarray, np.ndarray]]
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate + re-sort weighted samples (weights just add -- the
    summary is a weighted multiset, a commutative monoid)."""
    if not partials:
        return np.array([]), np.array([])
    v = np.concatenate([p[0] for p in partials])
    w = np.concatenate([p[1] for p in partials])
    order = np.argsort(v, kind="stable")
    return v[order], w[order]


def quantile_sketch_query(sketch: tuple[np.ndarray, np.ndarray], q: float) -> float:
    """Weighted quantile_disc: the smallest value whose cumulative weight
    reaches ceil(q * W).  NaN on an empty sketch; the target is clamped to
    the total weight so float drift in saturated weights (n/k sums) can
    never push it past the last element at q = 1."""
    v, w = sketch
    if len(v) == 0:
        return float("nan")
    cum = np.cumsum(w)
    target = min(max(1.0, np.ceil(q * cum[-1] - 1e-9)), cum[-1])
    return float(v[int(np.argmax(cum >= target))])


def quantiles_sketched(
    ds: rd.Dataset, column: str, qs: Sequence[float], k: int = 8192
) -> dict[float, float]:
    """Streaming quantiles with NO shuffle: per-block weighted summaries
    (<= k * 16 bytes each) merged on the driver -- the 100-TB companion to
    the exact value-histogram path (``relational.price_quantiles``), whose
    shuffle moves one row per DISTINCT value and so grows with the value
    domain.  Rank error bounded by N / k per block count."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # NULLs are ignored, matching SQL quantile_disc (the exact
        # companion's oracle semantics)
        v, w = quantile_sketch_partial(df[column].dropna().to_numpy(), k)
        return pd.DataFrame({"v": v, "w": w})

    parts = (
        ds.select_columns([column]).map_batches(partial, batch_format="pandas").to_pandas()
    )
    if len(parts) == 0:
        return {q: float("nan") for q in qs}
    sketch = quantile_sketch_merge([(parts["v"].to_numpy(), parts["w"].to_numpy())])
    return {q: quantile_sketch_query(sketch, q) for q in qs}
