"""High-cardinality grouped aggregation that scales.

Ray Data's built-in ``groupby().aggregate()`` / ``map_groups`` pay a
Python-level cost PER GROUP, which is pathological for high-cardinality
keys (profiling here: ~300 s CPU for a 95k-group aggregate of 100k rows).
The scalable pattern is to shuffle on a LOW-cardinality hash bucket of the
key and run the real aggregation VECTORIZED (pandas C speed) inside each
bucket:

    ds.add bucket = stable_hash(key) % B     (map_batches)
      .groupby("bucket")                     (shuffle on B values)
      .map_groups(vectorized pandas fn)      (B groups total)

Correctness: every row of a key lands in exactly one bucket, so any
per-key computation done inside the bucket is exact.  ``B`` bounds both
the shuffle fan-in and the per-task memory (bucket size ~ rows/B); skewed
keys only matter if a single KEY outweighs a bucket, which the combiner
stages upstream prevent.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

from ontology_time_machine_ray.functions.hashing import stable_hash64_series

DEFAULT_BUCKETS = 64


def np_dtype_map(schema) -> dict:
    """{column: numpy dtype | None} covering EVERY column of a Dataset
    schema (pyarrow- or pandas-block-backed) -- the currency of
    ``bucketed_join``'s ``left_schema``/``right_schema`` hints.  ``None``
    means "column exists but has no castable dtype" (nested/extension
    types): it still contributes the NAME, and the merge's dtype restore
    leaves it as-is."""
    import pyarrow as pa

    out = {}
    for name, typ in zip(schema.names, schema.types):
        if isinstance(typ, pa.DataType):
            try:
                out[name] = typ.to_pandas_dtype()
            except (NotImplementedError, pa.ArrowNotImplementedError):
                out[name] = None
        else:
            # PandasBlockSchema carries numpy dtypes (or None) directly
            out[name] = typ
    return out


_MIX_PRIME = 0x100000001B3  # FNV prime, used to mix multi-key hashes


def _with_bucket(df: pd.DataFrame, keys: Sequence[str], num_buckets: int) -> pd.DataFrame:
    # hash each key column DIRECTLY (hash_pandas_object is dtype-aware and
    # null-consistent) and mix -- no per-row string materialization.  The
    # old string-concat path cost ~half the wall time of shuffle-heavy
    # operators at the 20M-row scale (int64 -> string casts of every key).
    # Any assignment is correct as long as equal keys co-locate, which a
    # deterministic per-column hash guarantees.
    import numpy as np

    h = stable_hash64_series(df[keys[0]]).astype(np.uint64, copy=False)
    for k in keys[1:]:
        h = h * np.uint64(_MIX_PRIME) ^ stable_hash64_series(df[k]).astype(
            np.uint64, copy=False
        )
    return df.assign(_bucket=(h % num_buckets).astype("int64"))


def grouped_apply(
    ds,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = DEFAULT_BUCKETS,
    bucket_keys: Sequence[str] | None = None,
):
    """Apply ``fn`` (vectorized over a whole bucket; must itself respect
    the ``keys`` grouping) after co-locating each key into one bucket.

    ``bucket_keys`` may be a PREFIX/subset of the full grouping key when
    that subset already determines co-location (e.g. bucket triples by
    ``subj`` alone while deduping on ``(subj, pred, obj)``) -- this lets a
    downstream stage partitioned on the same subset ride the same shuffle.
    """
    keys = list(bucket_keys) if bucket_keys is not None else list(keys)

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(lambda df: _with_bucket(df, keys, num_buckets), batch_format="pandas")
        .groupby("_bucket")
        .map_groups(apply_bucket, batch_format="pandas")
    )


def grouped_aggregate(
    ds,
    keys: Sequence[str],
    named_aggs: dict[str, tuple[str, str]],
    num_buckets: int = DEFAULT_BUCKETS,
    bucket_keys: Sequence[str] | None = None,
):
    """Exact grouped aggregation for high-cardinality keys.

    ``named_aggs``: output column -> (input column, pandas agg name), e.g.
    ``{"n_events": ("value_c", "size"), "value_c": ("value_c", "sum")}``.
    ``bucket_keys`` (a subset of ``keys`` that already determines
    co-location, e.g. a unique key the others are functions of) narrows
    the shuffle key -- see grouped_apply.
    """
    keys = list(keys)

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False, sort=False).agg(
            **{out: pd.NamedAgg(col, how) for out, (col, how) in named_aggs.items()}
        )

    return grouped_apply(ds, keys, agg_bucket, num_buckets, bucket_keys=bucket_keys)


def bucketed_join(
    left,
    right,
    on: Sequence[str],
    how: str = "inner",
    num_buckets: int = DEFAULT_BUCKETS,
    salt: int = 1,
    left_schema: dict | None = None,
    right_schema: dict | None = None,
    post: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
):
    """Large x large hash join: both sides bucketed on the key, co-located
    by ONE shuffle on the union, merged vectorized inside each bucket.

    ``post``: optional per-bucket transform applied to the merged result
    INSIDE the join's exchange.  The bucket holds every row of every join
    key that hashes to it, so any per-``on``-key (or coarser function of
    ``on``) aggregation/filter/top-k is exact here -- riding the join's
    shuffle instead of paying a second one (the ``bucket_keys`` rationale
    of grouped_apply).  Must NOT group by columns that don't determine
    the bucket.  Not composable with ``salt > 1`` (a salted key's rows
    span sub-buckets).

    ``left_schema`` / ``right_schema``: optional ``{column: numpy dtype
    string}`` hints covering EVERY column of that side (keys included).
    Without a hint the side's ``Dataset.schema()`` is consulted -- which,
    for a lazy map/join output, EXECUTES its upstream pipeline just to
    learn the column names, and again at final consumption (Ray does not
    cache all-to-all results across partial executions).  A chain of N
    hinted joins executes each stage exactly once; unhinted, stage 1 runs
    ~N times (measured 23.6 s -> single-digit on the Q5 3-join star).

    The portable partitioned-hash-join pattern from the Ray guide: when
    neither side fits a broadcast, tag rows with their side, union the
    streams, shuffle once on ``hash(key) % B``, and run ``pandas.merge``
    per bucket.  Key skew is bounded by bucket size (rows/B).

    ``salt > 1`` handles the hot-key case where a SINGLE key outweighs a
    bucket: left rows are spread across ``salt`` sub-keys (round-robin --
    any assignment is correct, only the spread matters) and every right
    row is replicated to all ``salt`` sub-keys, so the hot key's work
    lands on ``salt`` buckets at the cost of a ``salt``x copy of the
    (small or pre-distinct'd) right side.  Results are identical for any
    ``salt``; semi/anti membership is unchanged because each left row
    still meets the full right key set at its own sub-key.

    ``how`` additionally accepts ``"semi"`` / ``"anti"``: left rows kept /
    dropped by key membership on the right (SQL EXISTS semantics: NULL
    keys never match).  The right side is reduced to its distinct keys
    inside each bucket, so duplicate right keys never multiply left rows
    and the right's payload columns are not shipped into the output
    (pre-project them away upstream for less shuffle).
    """
    on = list(on)
    assert salt == 1 or how in ("inner", "left", "semi", "anti"), (
        "salt>1 would duplicate unmatched right rows under outer/right "
        "(each replica is unmatched at its own sub-key)"
    )
    assert post is None or salt == 1, (
        "post runs per bucket, but salt>1 spreads one key's rows across "
        "sub-buckets -- a per-key post there would be partial, not exact"
    )
    if left_schema is not None:
        lnames, ldtypes = list(left_schema), dict(left_schema)
    else:
        lschema = left.schema()
        lnames, ldtypes = list(lschema.names), None
    if right_schema is not None:
        rnames, rdtypes = list(right_schema), dict(right_schema)
    else:
        rschema = right.schema()
        rnames, rdtypes = list(rschema.names), None
    lcols = [c for c in lnames if c not in on]
    rcols = [c for c in rnames if c not in on]
    assert not (set(lcols) & set(rcols)), "non-key columns must not collide"

    # the union NaN-fills each side's missing columns, which silently
    # floats integer columns; remember the declared dtypes so each side is
    # restored before the merge (an int64 key that became 3128.0 would
    # stringify differently downstream)
    if ldtypes is None:
        ldtypes = np_dtype_map(lschema)
    if rdtypes is None:
        rdtypes = np_dtype_map(rschema)

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            df = df.assign(_side=side)
            if salt > 1:
                if side == "l":
                    df = df.assign(_salt=(np.arange(len(df)) % salt).astype("int64"))
                else:
                    df = pd.concat(
                        [df.assign(_salt=s) for s in range(salt)], ignore_index=True
                    )
            return df.reindex(columns=all_cols + ["_side"])

        return fn

    join_cols = (on + ["_salt"]) if salt > 1 else on
    all_cols = join_cols + lcols + rcols

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # merge on join_cols (key + salt): each salted left row meets
        # exactly ONE replica of a matching right row, so no duplicates
        l = g[g["_side"] == "l"][join_cols + lcols].astype(
            {c: d for c, d in ldtypes.items() if d is not None and (c in on or c in lcols)}
        )
        r = g[g["_side"] == "r"][join_cols + rcols].astype(
            {c: d for c, d in rdtypes.items() if d is not None and (c in on or c in rcols)}
        )
        if how in ("semi", "anti"):
            keys = r[join_cols].dropna().drop_duplicates()
            hit = (
                l.merge(keys, on=join_cols, how="left", indicator=True)["_merge"]
                == "both"
            )
            # SQL EXISTS semantics: a NULL key never matches (pandas merge
            # would treat NaN == NaN), so null-keyed left rows are always
            # unmatched -- dropped by semi, kept by anti
            hit &= l[on].notna().all(axis=1).to_numpy()
            out = l[hit.to_numpy() if how == "semi" else (~hit).to_numpy()]
        else:
            out = l.merge(r, on=join_cols, how=how)
            if how != "inner":
                # pandas NaN-fills unmatched rows, upcasting int/bool
                # columns to float64 -- but ONLY in buckets that had an
                # unmatched row, so sibling blocks would disagree on the
                # column dtype and Arrow schema unification fails at the
                # next exchange.  Normalize: any fillable int/bool column
                # is float64 in EVERY bucket.
                fillable = (
                    rcols if how == "left"
                    else lcols if how == "right"
                    else lcols + rcols
                )
                casts = {}
                for c in fillable:
                    d = (rdtypes if c in rcols else ldtypes).get(c)
                    if d is not None and (
                        np.issubdtype(np.dtype(d), np.integer)
                        or np.dtype(d) == np.bool_
                    ):
                        casts[c] = "float64"
                if casts:
                    out = out.astype(casts)
        if salt > 1:
            out = out.drop(columns=["_salt"])
        return post(out) if post is not None else out

    return grouped_apply(both, join_cols, merge_bucket, num_buckets)


def grouped_head1(
    ds,
    keys: Sequence[str],
    order_by: Sequence[str],
    num_buckets: int = DEFAULT_BUCKETS,
    bucket_keys: Sequence[str] | None = None,
):
    """Deterministic first-row-per-key (the dedup primitive): rows sorted
    by ``keys + order_by``, first of each key kept -- all vectorized."""
    keys = list(keys)
    order_by = list(order_by)

    def first_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(keys + order_by, kind="stable")
            .drop_duplicates(keys, keep="first")
        )

    return grouped_apply(ds, keys, first_bucket, num_buckets, bucket_keys=bucket_keys)


def bloom_semi_anti_join(
    left,
    right,
    on: str,
    how: str = "semi",
    num_buckets: int = DEFAULT_BUCKETS,
    m_bits: int | None = None,
    left_schema: dict | None = None,
    right_schema: dict | None = None,
):
    """Bloom-prefiltered SEMI/ANTI join: the classic shuffle-volume
    optimization for sparse-overlap joins.

    The right side's keys are summarized into a mergeable Bloom filter
    (one streaming pass, per-block partials OR-merged on the driver --
    never the keys themselves), broadcast once, and probed vectorized on
    the left BEFORE the shuffle:

    * definitely-absent left rows (the Bloom's exact side) short-circuit:
      a semi join DROPS them with no shuffle at all, an anti join EMITS
      them directly into the output stream;
    * only the maybe-present residue (true matches + the false positives,
      ~0.1% at 17k right keys / ~3% at 100k with the default m_bits --
      size m_bits to the right side) goes through the exact in-bucket
      membership check, so false positives never reach the result --
      output is bit-identical to ``bucketed_join(how=...)``.

    Cost model: semi reads left once; anti reads left twice (the definite
    stream bypasses the exchange entirely) and the right twice (bloom
    build + join).  Scans are cheap streaming map work -- the point is to
    spare the EXPENSIVE all-to-all for rows that cannot match; pre-project
    and pre-distinct the right side upstream as usual.
    """
    assert how in ("semi", "anti")
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.sketch import (
        BLOOM_BITS,
        bloom_contains,
        bloom_of,
    )

    bits_ref = ray.put(bloom_of(right, on, m_bits or BLOOM_BITS))

    def split(keep_maybe: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            maybe = bloom_contains(cached_get(bits_ref), df[on])
            return df[maybe if keep_maybe else ~maybe]

        return fn

    maybe_side = left.map_batches(split(True), batch_format="pandas")
    # pass the schema hints through: without them bucketed_join calls
    # .schema() on BOTH lazy inputs, re-executing the (often expensive)
    # upstream pipelines once per consultation (see bucketed_join's
    # docstring for the measured cost)
    exact = bucketed_join(
        maybe_side, right, on=[on], how=how, num_buckets=num_buckets,
        left_schema=left_schema, right_schema=right_schema,
    )
    if how == "semi":
        return exact
    # align the bypass stream to the join output's column order (key
    # first) -- Ray unions blocks positionally, not by name
    lnames = list(left_schema) if left_schema is not None else list(left.schema().names)
    out_cols = [on] + [c for c in lnames if c != on]
    definite = left.map_batches(split(False), batch_format="pandas").map_batches(
        lambda df: df.reindex(columns=out_cols), batch_format="pandas"
    )
    return exact.union(definite)
