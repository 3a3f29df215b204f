"""Relational / analytical operators over the TPC-H-ish testdata tables.

These exercise the engine's generic dataflow machinery -- pruned reads,
vectorized batch transforms, partial-aggregate combiners before the
groupby shuffle, broadcast joins of small dimension tables, global sort /
top-k, and event-stream windowing -- the same machinery the KG pipeline is
built from (the reference's experiment pipeline shape: fetch -> extract ->
aggregate, ``experiments/*`` per SURVEY.md §3.3).

Numeric determinism: every float aggregate is computed over exact
cent-scaled int64s (a double sum's value depends on addition order, which
a distributed groupby does not fix; integer sums are associative), and
only derived back to a float at the end -- so results hash-match the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ontology_time_machine_ray.stages.groupagg import grouped_aggregate, grouped_apply


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    from ontology_time_machine_ray.sources.readers import sized_read_parquet

    return sized_read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# --------------------------------------------------------------------- #
# Q1-style grouped aggregate with a batch-local combiner                 #
# --------------------------------------------------------------------- #
def q1_lineitem(sf_dir: str) -> pd.DataFrame:
    """Pricing summary per (returnflag, linestatus) -- grouped sums over
    exact cent-scaled integers, pre-aggregated per batch so the shuffle
    moves O(groups) rows per block instead of O(rows)."""

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        rev_e4 = pc.multiply(price_c, pc.subtract(100, disc_c))
        tt = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "price_c": price_c,
                "rev_e4": rev_e4,
            }
        )
        return (
            tt.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("price_c", "sum"), ("rev_e4", "sum"), ("qty", "count")])
            .rename_columns(
                ["l_returnflag", "l_linestatus", "qty", "price_c", "rev_e4", "n"]
            )
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow")
    agg = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_c", alias_name="price_c"),
            Sum("rev_e4", alias_name="rev_e4"),
            Sum("n", alias_name="count_order"),
        )
        .to_pandas()
    )
    agg["sum_base_price"] = agg.pop("price_c") / 100.0
    agg["sum_disc_price"] = agg.pop("rev_e4") / 10000.0
    return agg[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
    ]


# --------------------------------------------------------------------- #
# global sort / top-k                                                    #
# --------------------------------------------------------------------- #
def topk_orders(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k orders by total price (deterministic o_orderkey tie-break).

    Per-batch partial top-k + driver merge of the (num_blocks x k)-row
    partials -- no global sort of the fact table for a constant k (the
    same pattern as ``ann_bruteforce`` / ``events_topk_users``)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(k)

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        partials.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


# --------------------------------------------------------------------- #
# broadcast join of small dimensions                                     #
# --------------------------------------------------------------------- #
def orders_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders |x| customer |x| nation, planned for the fact that CUSTOMER
    GROWS WITH THE CORPUS (sf100 ~ 15M keys -- a multi-GB dict if
    broadcast, the round-2 verdict's scale-killer): only the 25-row
    nation map is broadcast (reference's small-index pattern, J1).
    Orders are combined per batch to (c_custkey, n_orders, price_c)
    partials -- customer-key cardinality per block, far below the fact
    table -- which meet customer in ONE custkey-bucketed join (the same
    aggregate-before-join plan as ``brand_revenue``); driver input is
    bounded by blocks x 25 nation rows."""
    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def combine(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c_custkey": t["o_custkey"].to_numpy(),
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ).to_numpy(),
            }
        )
        return df.groupby("c_custkey", as_index=False).agg(
            n_orders=("price_c", "size"), price_c=("price_c", "sum")
        )

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        combine, batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # schema hints: without them the join consults .schema() on the lazy
    # partials, re-executing the whole orders scan+combine subplan
    joined = bucketed_join(
        partials, cust, on=["c_custkey"], how="left",
        left_schema={"c_custkey": "int64", "n_orders": "int64", "price_c": "int64"},
        right_schema={"c_custkey": "int64", "c_nationkey": "int64"},
    )

    def to_nation(df: pd.DataFrame) -> pd.DataFrame:
        names = df["c_nationkey"].map(cached_get(nation_ref)).fillna("UNKNOWN")
        return (
            df.assign(n_name=names)
            .groupby("n_name", as_index=False)
            .agg(n_orders=("n_orders", "sum"), price_c=("price_c", "sum"))
        )

    parts = joined.map_batches(to_nation, batch_format="pandas").to_pandas()
    agg = parts.groupby("n_name", as_index=False).agg(
        n_orders=("n_orders", "sum"), price_c=("price_c", "sum")
    )
    agg["n_orders"] = agg["n_orders"].astype("int64")
    agg["total_price"] = agg.pop("price_c") / 100.0
    return agg


#: ordered funnel stages (event_type values, in order).
FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(sf_dir: str) -> rd.Dataset:
    """Ordered funnel per user: earliest 'view', then earliest 'click'
    strictly after it, then earliest 'purchase' strictly after that --
    the product-analytics sequence-match query.  ONE user-bucketed
    shuffle of the three event types (columns pruned at the read, types
    filtered per batch); inside each bucket the stage chain is three
    vectorized merge+min passes, never a per-user Python loop."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"]).map_batches(
        lambda df: df[df["event_type"].isin(FUNNEL_STAGES)], batch_format="pandas"
    )

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = (
            g[g["event_type"] == FUNNEL_STAGES[0]]
            .groupby("user_id", as_index=False)
            .agg(t_view=("ts", "min"))
        )
        cur = v
        cols = {"t_view": None}
        for stage, col, prev in (
            (FUNNEL_STAGES[1], "t_click", "t_view"),
            (FUNNEL_STAGES[2], "t_purchase", "t_click"),
        ):
            ev = g.loc[g["event_type"] == stage, ["user_id", "ts"]].merge(
                cur[["user_id", prev]], on="user_id"
            )
            nxt = (
                ev[ev["ts"] > ev[prev]]
                .groupby("user_id", as_index=False)
                .agg(**{col: ("ts", "min")})
            )
            cur = cur.merge(nxt, on="user_id", how="left")
            cols[col] = None
        return cur[["user_id", *cols]]

    return grouped_apply(ds, ["user_id"], funnel_bucket)


def price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact discrete quantiles of o_totalprice (p25/p50/p75/p90).

    Scalable shape: a distributed value-histogram (bucketed count per
    distinct cent value -- the shuffle moves one row per distinct value)
    plus a driver-side cumulative walk over the small histogram.  Exact,
    unlike sketch quantiles, and hash-identical to SQL ``quantile_disc``.
    """
    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda df: df.assign(price_c=(df["o_totalprice"] * 100).round().astype("int64"))
        .groupby("price_c", as_index=False)
        .agg(n=("price_c", "size")),
        batch_format="pandas",
    )
    hist = grouped_aggregate(ds, ["price_c"], {"n": ("n", "sum")}).to_pandas()
    hist = hist.sort_values("price_c").reset_index(drop=True)
    cum = hist["n"].cumsum()
    total = int(cum.iloc[-1])
    rows = []
    for q in (0.25, 0.50, 0.75, 0.90):
        # quantile_disc: smallest value with cumulative count >= ceil(q * n)
        import math

        target = max(1, math.ceil(q * total))
        idx = int((cum >= target).idxmax())
        rows.append({"q": q, "price": hist["price_c"].iloc[idx] / 100.0})
    return pd.DataFrame(rows)


def events_retention(sf_dir: str) -> rd.Dataset:
    """Week-over-week retention: per ISO-ish epoch week, how many users
    were active and how many of them were also active the NEXT week --
    the standard cohort-retention aggregate.  Per-batch distinct
    (user, week) combiner, ONE user-bucketed pass that self-matches each
    user's week set against week+1 vectorized, then a tiny week rollup."""
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "user_id": df["user_id"],
                "week": (
                    df["ts"].astype("datetime64[ns]").astype("int64")
                    // (7 * 86_400_000_000_000)
                ).astype("int64"),
            }
        ).drop_duplicates(),
        batch_format="pandas",
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "week"])
        nxt = g.assign(week=g["week"] - 1)  # active in w+1, keyed back to w
        m = g.merge(nxt, on=["user_id", "week"], how="left", indicator=True)
        return (
            pd.DataFrame(
                {
                    "week": m["week"],
                    "retained": (m["_merge"] == "both").astype("int64"),
                }
            )
            .groupby("week", as_index=False)
            .agg(n_active=("retained", "size"), n_retained=("retained", "sum"))
        )

    parts = grouped_apply(ds, ["user_id"], per_user)
    return grouped_aggregate(
        parts,
        ["week"],
        {"n_active": ("n_active", "sum"), "n_retained": ("n_retained", "sum")},
    )


def price_quantiles_cont(sf_dir: str) -> pd.DataFrame:
    """INTERPOLATED quantiles (quantile_cont semantics: position
    q*(n-1), linear interpolation between the straddling values) from
    the same distributed value histogram as ``price_quantiles`` -- no
    global sort; the driver walks the small histogram twice per q.

    Determinism: the interpolation uses only IEEE +,-,*,/ (correctly
    rounded), and the SQL oracle restates the SAME formula explicitly
    (not the built-in aggregate), so the doubles match bit-for-bit."""
    import math

    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda df: df.assign(price_c=(df["o_totalprice"] * 100).round().astype("int64"))
        .groupby("price_c", as_index=False)
        .agg(n=("price_c", "size")),
        batch_format="pandas",
    )
    hist = (
        grouped_aggregate(ds, ["price_c"], {"n": ("n", "sum")})
        .to_pandas()
        .sort_values("price_c")
        .reset_index(drop=True)
    )
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])

    def value_at(rank0: int) -> int:  # 0-indexed rank -> cent value
        import numpy as np

        return int(hist["price_c"].iloc[int(np.searchsorted(cum, rank0 + 1))])

    rows = []
    for q in (0.25, 0.50, 0.75, 0.90):
        p = q * (total - 1)
        lo, hi = math.floor(p), math.ceil(p)
        a, b = value_at(lo), value_at(hi)
        rows.append({"q": q, "price": (a + (b - a) * (p - lo)) / 100.0})
    return pd.DataFrame(rows)


def distinct_customers(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT custkey) per order priority: batch-local
    distinct pairs first (combiner), then bucketed nunique."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"]).map_batches(
        lambda df: df.drop_duplicates(["o_orderpriority", "o_custkey"]),
        batch_format="pandas",
    )
    return grouped_apply(
        ds,
        ["o_orderpriority"],
        lambda g: g.drop_duplicates(["o_orderpriority", "o_custkey"])
        .groupby("o_orderpriority", as_index=False)
        .agg(n_customers=("o_custkey", "nunique"), ),
    ).to_pandas()


def sample_docs_hash(sf_dir: str) -> rd.Dataset:
    """Deterministic ~1/8 content-hash sample of documents: keep rows whose
    md5(text) starts with '0' or '1' -- reproducible across engines and
    partitionings (unlike seeded random sampling, whose result depends on
    block layout)."""
    from ontology_time_machine_ray.functions.hashing import content_md5_series
    from ontology_time_machine_ray.sources.readers import sized_read_parquet

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        fp = content_md5_series(df["text"].fillna(""))
        return df[fp.str[0].isin(["0", "1"])][["doc_id"]]

    return sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(pick, batch_format="pandas")


# --------------------------------------------------------------------- #
# event-stream windowing                                                 #
# --------------------------------------------------------------------- #
def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per user: count, exact value sum, and the
    JSON-props field sum (the reference's JSON log flattening, M16)."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "hour": df["ts"].dt.floor("h"),
                "value_c": (df["value"] * 100).round().astype("int64"),
                "k": df["props"].str.extract(r'"k":\s*(\d+)', expand=False).fillna("0").astype("int64"),
            }
        )
        # batch-local combiner before the shuffle
        return (
            out.groupby(["user_id", "hour"], as_index=False)
            .agg(n=("value_c", "size"), value_c=("value_c", "sum"), sum_k=("k", "sum"))
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "value", "props"]).map_batches(
        prep, batch_format="pandas"
    )
    # (user, hour) is HIGH-cardinality: bucketed-vectorized aggregation
    # (see groupagg.py), not the per-group accumulating groupby
    agg = grouped_aggregate(
        ds,
        ["user_id", "hour"],
        {
            "n_events": ("n", "sum"),
            "value_c": ("value_c", "sum"),
            "sum_k": ("sum_k", "sum"),
        },
    )
    # derive the float column inside the stream; the per-(user, hour)
    # result is corpus-scale, so it stays a Dataset end to end
    return agg.map_batches(
        lambda df: df.assign(sum_value=df.pop("value_c") / 100.0), batch_format="pandas"
    )


def order_lineitem_join(sf_dir: str) -> pd.DataFrame:
    """Large x large hash join (orders |x| lineitem on orderkey via ONE
    bucketed shuffle, pandas merge per bucket), then revenue per order
    priority.  The no-broadcast join path -- both sides are fact tables."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "rev_e4": pc.multiply(
                    pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()),
                    pc.subtract(
                        100, pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
                    ),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_join(orders, items, on=["o_orderkey"], how="inner")
    agg = grouped_aggregate(
        joined,
        ["o_orderpriority"],
        {"n_items": ("rev_e4", "size"), "rev_e4": ("rev_e4", "sum")},
    ).to_pandas()
    agg["revenue"] = agg.pop("rev_e4") / 10000.0
    return agg


#: Q3 parameters: market segment + the shipping cutoff date.
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"


def q3_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: top-10 unshipped-revenue orders for one market
    segment -- a THREE-table plan done with two key-bucketed shuffles and
    zero broadcasts (the segment's customer set grows with SF, so it is
    semi-joined, not collected; the orders_by_nation lesson).

    lineitem is batch-combined to (orderkey -> revenue) partials before
    its shuffle; the final top-10 is per-block partial top-10 + a
    bounded driver merge (blocks x 10 rows), not a global sort."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    cutoff = pd.Timestamp(Q3_CUTOFF)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda df: df.loc[df["c_mktsegment"] == Q3_SEGMENT, ["c_custkey"]].rename(
            columns={"c_custkey": "o_custkey"}
        ),
        batch_format="pandas",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(lambda df: df[df["o_orderdate"] < cutoff], batch_format="pandas")
    _ohints = {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderdate": "datetime64[us]",
        "o_orderpriority": "object",
    }
    o2 = bucketed_join(
        orders,
        cust,
        on=["o_custkey"],
        how="semi",
        left_schema=_ohints,
        right_schema={"o_custkey": "int64"},
    ).map_batches(
        lambda df: df[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        batch_format="pandas",
    )

    def item_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cutoff]
        rev = (df["l_extendedprice"] * 100).round().astype("int64") * (
            100 - (df["l_discount"] * 100).round().astype("int64")
        )
        return (
            pd.DataFrame({"o_orderkey": df["l_orderkey"], "rev_e4": rev})
            .groupby("o_orderkey", as_index=False)
            .agg(rev_e4=("rev_e4", "sum"))
        )

    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(item_partials, batch_format="pandas")

    def agg_top10(df: pd.DataFrame) -> pd.DataFrame:
        # rides the join's exchange (post hook): the bucket holds every
        # row of each orderkey, so the per-order sum is exact here, and
        # the bucket-local top-10 bounds what reaches the driver
        return (
            df.groupby(
                ["o_orderkey", "o_orderdate", "o_orderpriority"],
                as_index=False, sort=False,
            )
            .agg(rev_e4=("rev_e4", "sum"))
            .sort_values(["rev_e4", "o_orderkey"], ascending=[False, True])
            .head(10)
        )

    parts = bucketed_join(
        items,
        o2,
        on=["o_orderkey"],
        how="inner",
        left_schema={"o_orderkey": "int64", "rev_e4": "int64"},
        right_schema={k: v for k, v in _ohints.items() if k != "o_custkey"},
        post=agg_top10,
    ).to_pandas()
    top = (
        parts.sort_values(["rev_e4", "o_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    top["revenue"] = top.pop("rev_e4") / 10000.0
    return top[["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]]


Q5_REGION = "ASIA"
Q5_START = "1996-01-01"
Q5_END = "1997-01-01"


def q5_local_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the customer
    and the line's supplier sit in the SAME nation of one region -- the
    canonical 6-table star join.

    Distributed plan: nation+region (25/5 rows, the only genuinely
    fixed-size tables) broadcast as a nationkey set; customer and
    supplier GROW with SF so both are key-bucketed joins, never
    broadcast (the orders_by_nation lesson).  Three bucketed shuffles
    total -- custkey, orderkey, suppkey -- each preceded by a column
    prune or batch-local filter, with lineitem pre-combined to
    (orderkey, suppkey) partials before its shuffle.  The final
    aggregate is nation-grain (<= 25 rows) on the driver."""
    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    rkeys = set(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    name_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    def in_region_customers(df: pd.DataFrame) -> pd.DataFrame:
        keys = cached_get(name_ref)
        df = df[df["c_nationkey"].isin(keys)]
        return pd.DataFrame(
            {"o_custkey": df["c_custkey"], "c_nationkey": df["c_nationkey"]}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        in_region_customers, batch_format="pandas"
    )
    start, end = pd.Timestamp(Q5_START), pd.Timestamp(Q5_END)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda df: df.loc[
            (df["o_orderdate"] >= start) & (df["o_orderdate"] < end),
            ["o_orderkey", "o_custkey"],
        ],
        batch_format="pandas",
    )
    # schema hints on every join: the inputs are lazy map/join outputs, and
    # an unhinted join would execute them once per downstream schema() call
    # (the whole 3-join chain ran stage 1 three times -- 23.6 s -> ~7 s)
    o2 = bucketed_join(
        orders,
        cust,
        on=["o_custkey"],
        left_schema={"o_orderkey": "int64", "o_custkey": "int64"},
        right_schema={"o_custkey": "int64", "c_nationkey": "int32"},
    ).map_batches(lambda df: df[["o_orderkey", "c_nationkey"]], batch_format="pandas")

    def item_partials(df: pd.DataFrame) -> pd.DataFrame:
        rev = (df["l_extendedprice"] * 100).round().astype("int64") * (
            100 - (df["l_discount"] * 100).round().astype("int64")
        )
        return (
            pd.DataFrame(
                {
                    "o_orderkey": df["l_orderkey"],
                    "s_suppkey": df["l_suppkey"],
                    "rev_e4": rev,
                }
            )
            .groupby(["o_orderkey", "s_suppkey"], as_index=False)
            .agg(rev_e4=("rev_e4", "sum"))
        )

    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(item_partials, batch_format="pandas")
    li = bucketed_join(
        items,
        o2,
        on=["o_orderkey"],
        left_schema={"o_orderkey": "int64", "s_suppkey": "int64", "rev_e4": "int64"},
        right_schema={"o_orderkey": "int64", "c_nationkey": "int32"},
    ).map_batches(
        lambda df: df[["s_suppkey", "c_nationkey", "rev_e4"]], batch_format="pandas"
    )

    def in_region_suppliers(df: pd.DataFrame) -> pd.DataFrame:
        keys = cached_get(name_ref)
        df = df[df["s_nationkey"].isin(keys)]
        return pd.DataFrame(
            {"s_suppkey": df["s_suppkey"], "s_nationkey": df["s_nationkey"]}
        )

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        in_region_suppliers, batch_format="pandas"
    )
    j = bucketed_join(
        li,
        supp,
        on=["s_suppkey"],
        left_schema={"s_suppkey": "int64", "c_nationkey": "int32", "rev_e4": "int64"},
        right_schema={"s_suppkey": "int64", "s_nationkey": "int32"},
    )

    def local_partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_nationkey"] == df["s_nationkey"]]
        return (
            df.groupby("c_nationkey", as_index=False)
            .agg(rev_e4=("rev_e4", "sum"))
            .rename(columns={"c_nationkey": "n_nationkey"})
        )

    parts = j.map_batches(local_partials, batch_format="pandas").to_pandas()
    agg = parts.groupby("n_nationkey", as_index=False).agg(rev_e4=("rev_e4", "sum"))
    agg["n_name"] = agg.pop("n_nationkey").map(dict(zip(nat["n_nationkey"], nat["n_name"])))
    agg["revenue"] = agg.pop("rev_e4") / 10000.0
    return agg.sort_values("revenue", ascending=False).reset_index(drop=True)[
        ["n_name", "revenue"]
    ]


def events_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding (hopping) window aggregate: 1-hour windows every 30 min.

    Each event expands to its two covering windows inside ``map_batches``
    (window starts = the two half-hour marks in (ts-1h, ts]), then the
    usual bucketed grouped aggregate -- the streaming-shaped pattern where
    window assignment is a stateless row-local computation and only the
    aggregation shuffles."""

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        half = df["ts"].dt.floor("30min")
        value_c = (df["value"] * 100).round().astype("int64")
        out = pd.concat(
            [
                pd.DataFrame({"user_id": df["user_id"], "window_start": half, "value_c": value_c}),
                pd.DataFrame(
                    {"user_id": df["user_id"],
                     "window_start": half - pd.Timedelta(minutes=30),
                     "value_c": value_c}
                ),
            ],
            ignore_index=True,
        )
        # batch-local combiner
        return out.groupby(["user_id", "window_start"], as_index=False).agg(
            n=("value_c", "size"), value_c=("value_c", "sum")
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        expand, batch_format="pandas"
    )
    agg = grouped_aggregate(
        ds,
        ["user_id", "window_start"],
        {"n_events": ("n", "sum"), "value_c": ("value_c", "sum")},
    )
    return agg.map_batches(
        lambda df: df.assign(sum_value=df.pop("value_c") / 100.0), batch_format="pandas"
    )


def events_asof_join(sf_dir: str, events_ds: rd.Dataset | None = None) -> rd.Dataset:
    """Distributed AS-OF join between two event streams: for each
    ``purchase`` event, the same user's most recent ``click`` at or before
    it (inner: purchases with no prior click are dropped).

    The custom-operator pattern Ray Data lacks natively: co-partition both
    streams on the join key with ONE hash-bucket shuffle (``grouped_apply``
    on user_id), then run the vectorized backward-search
    (``pd.merge_asof(by=key, direction='backward')``) inside each bucket.
    Partitioning assumption: all rows of a key land in one bucket -- the
    same invariant every ``grouped_*`` stage documents.  Tie-break at equal
    timestamps: the click with the highest event_id wins (right side sorted
    by (ts, event_id); merge_asof keeps the last matching row)."""
    ev = events_ds or _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t["event_type"], value_set=pa.array(["purchase", "click"]))
        )

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"][["event_id", "user_id", "ts"]].sort_values(
            ["ts", "event_id"], kind="stable"
        )
        c = (
            g[g["event_type"] == "click"][["event_id", "user_id", "ts"]]
            .rename(columns={"event_id": "click_event_id"})
            .sort_values(["ts", "click_event_id"], kind="stable")
        )
        c = c.assign(click_ts=c["ts"])
        if len(p) == 0 or len(c) == 0:
            return pd.DataFrame(
                {
                    "purchase_event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "purchase_ts": pd.Series(dtype="datetime64[us]"),
                    "click_event_id": pd.Series(dtype="int64"),
                    "click_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
        out = pd.merge_asof(
            p,
            c[["user_id", "ts", "click_event_id", "click_ts"]],
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        out = out[out["click_event_id"].notna()]
        return pd.DataFrame(
            {
                "purchase_event_id": out["event_id"].astype("int64"),
                "user_id": out["user_id"].astype("int64"),
                "purchase_ts": out["ts"].astype("datetime64[us]"),
                "click_event_id": out["click_event_id"].astype("int64"),
                "click_ts": out["click_ts"].astype("datetime64[us]"),
            }
        )

    return grouped_apply(
        ev.map_batches(keep, batch_format="pyarrow"), ["user_id"], asof_bucket
    )


def events_range_join(sf_dir: str, events_ds: rd.Dataset | None = None) -> rd.Dataset:
    """Distributed RANGE join (interval containment) between two large
    streams: for each ``error`` event, the count of the same user's
    ``click`` events in the half-open window (error_ts - 5 min, error_ts].

    ONE scan + ONE hash-bucket shuffle on user_id (the asof-join's
    partitioning invariant: all rows of a key land in one bucket), then a
    vectorized prefix-count inside each bucket: clicks get a per-user
    cumulative rank in ts order, and two backward ``merge_asof`` probes at
    ``error_ts`` and ``error_ts - window`` turn the window count into a
    rank difference -- N(click <= hi) - N(click <= lo).  No row expansion,
    no pair materialization, no second aggregate.  If a single user ever
    outweighed a bucket, the fallback is window-grain quantization (emit
    probes to the two grains they overlap, equi-join on (user, grain));
    at the bucket sizes here the prefix-count path strictly dominates."""
    G_US = 5 * 60 * 1_000_000  # window length, microseconds
    ev = events_ds or _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t["event_type"], value_set=pa.array(["error", "click"]))
        )

    empty = pd.DataFrame(
        {
            "error_event_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "error_ts": pd.Series(dtype="datetime64[us]"),
            "n_recent_clicks": pd.Series(dtype="int64"),
        }
    )

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_err = g["event_type"].to_numpy() == "error"
        err = g[is_err]
        if len(err) == 0:
            return empty
        e = pd.DataFrame(
            {
                "error_event_id": err["event_id"].to_numpy(),
                "user_id": err["user_id"].to_numpy(),
                "error_us": err["ts"].astype("int64").to_numpy(),
            }
        ).sort_values("error_us", kind="stable")
        clk = g[~is_err]
        if len(clk) == 0:
            n = np.zeros(len(e), dtype=np.int64)
        else:
            c = (
                pd.DataFrame(
                    {
                        "user_id": clk["user_id"].to_numpy(),
                        "us": clk["ts"].astype("int64").to_numpy(),
                    }
                )
                .sort_values(["user_id", "us"], kind="stable")
                .reset_index(drop=True)
            )
            c["rank"] = c.groupby("user_id", sort=False).cumcount() + 1
            # merge_asof wants the on-key globally sorted; a stable re-sort
            # keeps tied (user, us) rows in increasing-rank order, so the
            # backward probe's "last match" is the max rank at that ts
            c = c.sort_values("us", kind="stable")
            hi = pd.merge_asof(
                e, c, left_on="error_us", right_on="us", by="user_id",
                direction="backward", allow_exact_matches=True,
            )["rank"].fillna(0).to_numpy()
            # constant shift preserves sort order, so the lo probe aligns
            # row-for-row with the hi probe; exact match at lo is SUBTRACTED
            # (click_us == error_us - G is outside the half-open window)
            e_lo = e.assign(lo_us=e["error_us"] - G_US)
            lo = pd.merge_asof(
                e_lo, c, left_on="lo_us", right_on="us", by="user_id",
                direction="backward", allow_exact_matches=True,
            )["rank"].fillna(0).to_numpy()
            n = (hi - lo).astype(np.int64)
        return pd.DataFrame(
            {
                "error_event_id": e["error_event_id"].astype("int64").to_numpy(),
                "user_id": e["user_id"].astype("int64").to_numpy(),
                "error_ts": e["error_us"].to_numpy().astype("datetime64[us]"),
                "n_recent_clicks": n,
            }
        )

    return grouped_apply(
        ev.map_batches(keep, batch_format="pyarrow"), ["user_id"], count_bucket
    )


def events_sessions(
    sf_dir: str, gap_minutes: int = 30, events_ds: rd.Dataset | None = None
) -> rd.Dataset:
    """Session windows (gap > 30 min starts a new session) per user.

    Ordering contract: rows are grouped per user and sorted by ts INSIDE
    the group (``map_groups``), so cross-block order never matters -- the
    streaming-shaped pattern from the Ray guide."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized gap-and-island over the whole bucket: a session starts
        # at a user change or a gap
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"] != g["user_id"].shift()
        gap_hit = (g["ts"] - g["ts"].shift()) > gap
        g = g.assign(_start=(new_user | gap_hit).astype("int64"))
        return g.groupby("user_id", as_index=False).agg(
            n_events=("_start", "size"), n_sessions=("_start", "sum")
        )

    return grouped_apply(
        events_ds
        if events_ds is not None
        else _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        ["user_id"],
        sessions_in_bucket,
    )


# --------------------------------------------------------------------- #
# windowed ranking / semi-anti joins / aggregate-before-join             #
# --------------------------------------------------------------------- #
def rank_parts_by_brand(sf_dir: str, n: int = 3) -> rd.Dataset:
    """Per-group top-n with rank (row_number() OVER (PARTITION BY brand
    ORDER BY price DESC, partkey)): the grouped-window counterpart to the
    global ``topk_orders``.

    Scale shape: a per-batch top-n combiner first (each batch keeps at
    most n rows per brand it has seen, so the shuffle carries
    <= n * brands * blocks rows, not the fact table), then one
    brand-bucketed pass assigns the final ranks vectorized."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["p_brand", "p_retailprice", "p_partkey"],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby("p_brand", sort=False)
            .head(n)
        )

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["p_brand", "p_retailprice", "p_partkey"],
            ascending=[True, False, True],
            kind="stable",
        )
        g = g.assign(rnk=g.groupby("p_brand", sort=False).cumcount() + 1)
        return g[g["rnk"] <= n][["p_brand", "rnk", "p_partkey", "p_retailprice"]]

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"]).map_batches(
        partial, batch_format="pandas"
    )
    return grouped_apply(ds, ["p_brand"], rank_bucket)


def customers_no_urgent_orders(sf_dir: str) -> rd.Dataset:
    """Distributed ANTI join: customers that never placed a 1-URGENT
    order (every customer in the fixture has SOME order, so the urgent
    predicate keeps the result non-trivial in both directions).

    The right side is filtered at the read and combined to batch-local
    distinct keys before the shuffle (a semi/anti join only needs key
    MEMBERSHIP, never payload), then ``bucketed_join(how='anti')``
    co-locates both sides with one hash shuffle and filters vectorized
    per bucket."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.filter(
                    pc.equal(t["o_orderpriority"], "1-URGENT")
                )["o_custkey"].unique()
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_join(cust, orders, on=["c_custkey"], how="anti")


def suppliers_with_returns(sf_dir: str) -> rd.Dataset:
    """Distributed SEMI join: suppliers that shipped at least one returned
    line item (l_returnflag = 'R').  Same membership-only pattern as the
    anti join, filtered at the read so only matching keys shuffle."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    returned = _read(sf_dir, "lineitem", ["l_suppkey", "l_returnflag"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.filter(pc.equal(t["l_returnflag"], "R"))[
                    "l_suppkey"
                ].unique()
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_join(supp, returned, on=["s_suppkey"], how="semi")


def brand_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue per part brand: the AGGREGATE-BEFORE-JOIN optimization.

    lineitem is batch-combined to (partkey -> n_items, rev) partials --
    part-key cardinality per block, orders of magnitude below the fact
    table -- and only those partials shuffle.  The shuffle is shared with
    the join: both sides land in the same partkey bucket, where the
    aggregate is finished, merged with ``part``, and pre-rolled to brand
    grain (a 7.5s three-shuffle plan collapsed to one 2.5s shuffle)."""
    items = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["l_partkey"],
                "rev_e4": pc.multiply(
                    pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64()),
                    pc.subtract(
                        100, pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
                    ),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    comb = items.map_batches(
        lambda df: df.groupby("p_partkey", as_index=False)
        .agg(n_items=("rev_e4", "size"), rev_e4=("rev_e4", "sum"))
        .assign(_side="l"),
        batch_format="pandas",
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda df: df.assign(_side="r"), batch_format="pandas"
    )
    cols = ["p_partkey", "n_items", "rev_e4", "p_brand", "_side"]

    # ONE partkey-bucketed shuffle co-locates the lineitem partials AND the
    # part rows; inside the bucket: finish the per-part aggregate, merge,
    # and pre-roll to brand grain, so the driver only sums
    # <= buckets x brands partial rows (three shuffles collapsed into one)
    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == "l"]
        la = (
            l[["p_partkey", "n_items", "rev_e4"]]
            .astype("int64")  # union NaN-fill floated them; exact restore
            .groupby("p_partkey", as_index=False)
            .agg(n_items=("n_items", "sum"), rev_e4=("rev_e4", "sum"))
        )
        r = g[g["_side"] == "r"][["p_partkey", "p_brand"]]
        m = la.merge(r, on="p_partkey", how="inner")
        return m.groupby("p_brand", as_index=False).agg(
            n_items=("n_items", "sum"), rev_e4=("rev_e4", "sum")
        )

    both = comb.map_batches(
        lambda df: df.reindex(columns=cols), batch_format="pandas"
    ).union(part.map_batches(lambda df: df.reindex(columns=cols), batch_format="pandas"))
    partials = grouped_apply(both, ["p_partkey"], bucket_fn).to_pandas()
    agg = partials.groupby("p_brand", as_index=False).agg(
        n_items=("n_items", "sum"), rev_e4=("rev_e4", "sum")
    )
    agg["revenue"] = agg.pop("rev_e4") / 10000.0
    return agg


def segment_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact PER-GROUP discrete quantiles (p50/p95 of account balance per
    market segment) via the grouped value-histogram: the shuffle moves one
    row per distinct (segment, cent-value) pair, then a driver-side
    cumulative walk over the small histogram picks quantile_disc values
    per segment.  The grouped counterpart to ``price_quantiles``."""
    import math

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"]).map_batches(
        lambda df: df.assign(bal_c=(df["c_acctbal"] * 100).round().astype("int64"))
        .groupby(["c_mktsegment", "bal_c"], as_index=False)
        .agg(n=("bal_c", "size")),
        batch_format="pandas",
    )
    hist = (
        grouped_aggregate(ds, ["c_mktsegment", "bal_c"], {"n": ("n", "sum")})
        .to_pandas()
        .sort_values(["c_mktsegment", "bal_c"], kind="stable")
    )
    rows = []
    for seg, g in hist.groupby("c_mktsegment", sort=True):
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["bal_c"].to_numpy()
        for q in (0.50, 0.95):
            target = max(1, math.ceil(q * total))
            rows.append(
                {
                    "c_mktsegment": seg,
                    "q": q,
                    "acctbal": vals[int(np.argmax(cum >= target))] / 100.0,
                }
            )
    return pd.DataFrame(rows)


def pivot_orders(sf_dir: str) -> pd.DataFrame:
    """PIVOT: order counts as a wide (priority x status) table.  The
    distributed shape is just the grouped aggregate with one count column
    per pivoted value (statuses are a small, known domain) -- the
    combiner makes each batch contribute one row per priority, and the
    final reshape is O(groups)."""
    statuses = ("O", "F", "P")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_orderpriority", as_index=False).agg(
            **{
                f"n_{s.lower()}": pd.NamedAgg(
                    "o_orderstatus", lambda v, s=s: int((v == s).sum())
                )
                for s in statuses
            }
        )
        return out

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]).map_batches(
        partial, batch_format="pandas"
    )
    return (
        grouped_aggregate(
            ds,
            ["o_orderpriority"],
            {f"n_{s.lower()}": (f"n_{s.lower()}", "sum") for s in statuses},
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )


def _finest_grain_qty(sf_dir: str) -> pd.DataFrame:
    """Distributed (returnflag, linestatus, sum_qty) base for ROLLUP and
    CUBE: combiner inside the batch, one small groupby -- the ONLY part
    that touches the fact table; both grouping-set queries derive every
    coarser level from this base on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )
        return (
            tt.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum")])
            .rename_columns(["l_returnflag", "l_linestatus", "qty"])
        )

    return (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty", alias_name="sum_qty"))
        .to_pandas()
    )


def rollup_lineitem(sf_dir: str) -> pd.DataFrame:
    """ROLLUP (grouping sets): quantity totals by (returnflag, linestatus),
    by returnflag, and grand total, NULL-marked like SQL ROLLUP.

    Scale shape: only the FINEST grouping runs distributed (combiner +
    groupby); the coarser levels are derived from that small base on the
    driver -- subtotals never rescan the fact table."""
    base = _finest_grain_qty(sf_dir)
    lvl1 = base.groupby("l_returnflag", as_index=False).agg(sum_qty=("sum_qty", "sum"))
    lvl1["l_linestatus"] = None
    total = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None], "sum_qty": [base["sum_qty"].sum()]}
    )
    out = pd.concat([base, lvl1, total], ignore_index=True)
    return out[["l_returnflag", "l_linestatus", "sum_qty"]].astype({"sum_qty": "int64"})


def events_window_funcs(sf_dir: str) -> rd.Dataset:
    """Per-key SQL window functions in one key-partitioned pass:
    row_number, lag-gap (microseconds since the user's previous event)
    and a running value sum, all OVER (PARTITION BY user_id ORDER BY ts,
    event_id).  One hash(user_id) bucket shuffle co-locates each user;
    inside the bucket everything is vectorized pandas (sort + groupby
    cumcount/shift/cumsum) -- never a per-row loop, never a global sort.
    Values are cent-scaled int64 so the running sum is associative and
    hash-exact vs the SQL window oracle."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        grp = g.groupby("user_id", sort=False)
        value_c = (g["value"] * 100.0).round().astype("int64")
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "event_id": g["event_id"].astype("int64"),
                "row_num": (grp.cumcount() + 1).astype("int64"),
                "gap_us": (g["ts"] - grp["ts"].shift(1))
                .dt.total_seconds()
                .mul(1_000_000)
                .round()
                .fillna(-1)
                .astype("int64"),
                "running_value_c": value_c.groupby(g["user_id"], sort=False)
                .cumsum()
                .astype("int64"),
            }
        )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return grouped_apply(ds, ["user_id"], per_bucket)


def cube_lineitem(sf_dir: str) -> pd.DataFrame:
    """CUBE (all grouping subsets): quantity totals for every subset of
    {returnflag, linestatus} -- the 2^k generalization of ROLLUP.  Same
    scale shape: only the finest grain runs distributed; all 2^k - 1
    coarser levels are derived from that small base on the driver and
    never rescan the fact table."""
    base = _finest_grain_qty(sf_dir)
    by_rf = base.groupby("l_returnflag", as_index=False).agg(sum_qty=("sum_qty", "sum"))
    by_rf["l_linestatus"] = None
    by_ls = base.groupby("l_linestatus", as_index=False).agg(sum_qty=("sum_qty", "sum"))
    by_ls["l_returnflag"] = None
    total = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None], "sum_qty": [base["sum_qty"].sum()]}
    )
    out = pd.concat([base, by_rf, by_ls, total], ignore_index=True)
    return out[["l_returnflag", "l_linestatus", "sum_qty"]].astype({"sum_qty": "int64"})


def customer_order_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER hash join: customers (custkey % 3 <> 0 slice) vs
    per-customer order counts.  Both single-sided populations occur
    naturally -- TPC-H leaves ~1/3 of customers orderless (left-only) and
    the slice removes some customers who do have orders (right-only) --
    so the query proves genuine outer semantics, not just a left join.
    One bucketed shuffle (both sides co-located on hash(custkey)), pandas
    outer merge per bucket; NULL payloads are coalesced to sentinels so
    the hash compare is engine-neutral, and a ``side`` column pins the
    provenance of every row."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join, grouped_aggregate

    def cust_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_custkey"] % 3 != 0]
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].astype("int64"),
                "acctbal_cents": (df["c_acctbal"] * 100.0).round().astype("int64"),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        cust_batch, batch_format="pandas"
    )
    # the %5 slice on the orders side manufactures LEFT-ONLY customers
    # (the synthetic corpus gives every customer orders, unlike TPC-H)
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda df: pd.DataFrame(
            {"c_custkey": df.loc[df["o_custkey"] % 5 != 0, "o_custkey"].astype("int64")}
        ),
        batch_format="pandas",
    )
    counts = grouped_aggregate(
        orders.map_batches(
            lambda df: df.groupby("c_custkey", as_index=False).agg(n=("c_custkey", "size")),
            batch_format="pandas",
        ),
        ["c_custkey"],
        {"n_orders": ("n", "sum")},
    )
    joined = bucketed_join(
        cust, counts, on=["c_custkey"], how="outer",
        left_schema={"c_custkey": "int64", "acctbal_cents": "int64"},
        right_schema={"c_custkey": "int64", "n_orders": "int64"},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        left_null = df["acctbal_cents"].isna()
        right_null = df["n_orders"].isna()
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].astype("int64"),
                "acctbal_cents": df["acctbal_cents"].fillna(-1).astype("int64"),
                "n_orders": df["n_orders"].fillna(0).astype("int64"),
                "side": pd.Series(
                    np.where(left_null, "right_only",
                             np.where(right_null, "left_only", "both")),
                    index=df.index, dtype="string",
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


#: (column, kind) pairs profiled by ``profile_lineitem``; kinds pin the
#: canonical VARCHAR encoding shared with the SQL oracle.
PROFILE_COLS = (
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_quantity", "cents"),
    ("l_shipdate", "epoch"),
)


def _profile_canonical(values: pd.Series, kind: str) -> pd.Series:
    """Canonical VARCHAR encoding per column kind: plain strings, or
    zero-padded integer cents / epoch seconds so the lexicographic
    min/max equals the numeric one and pandas and DuckDB agree
    bit-exactly (no float-formatting dependence)."""
    if kind == "str":
        return values.astype("object")
    if kind == "cents":
        ints = pd.Series(values, dtype="float64").mul(100).round().astype("int64")
    elif kind == "epoch":
        ints = values.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    else:
        raise ValueError(kind)
    if len(ints) and int(ints.min()) < 0:
        # zfill keeps the sign FIRST while SQL lpad pads before it, and
        # neither orders negatives numerically -- refuse loudly rather
        # than report a wrong min/max (negative measures need a biased
        # encoding, e.g. value + offset, chosen per column)
        raise ValueError(
            f"canonical {kind} encoding requires non-negative values "
            f"(got min {int(ints.min())})"
        )
    return ints.astype(str).str.zfill(12).astype("object")


def profile_lineitem(sf_dir: str) -> rd.Dataset:
    """Single-pass column profiling (the data-quality report every
    ingest pipeline runs): per profiled column -- row count, null count,
    exact distinct count, canonical min / max.

    Scale shape: a per-batch value-count combiner collapses each batch
    to (col_name, value, cnt) partials BOUNDED BY THE COLUMN'S
    CARDINALITY (never the row count), one (col, value)-bucketed
    aggregate merges them, and a column-bucketed rollup emits one row
    per column.  Shuffle volume is the distinct-value set; raw rows
    never leave the scan stage.  Columns with corpus-scale cardinality
    belong in the KMV path (``rel_distinct_sketch``) instead -- the
    exact profile is for the bounded-cardinality columns a real profile
    targets (flags, enums, dates, bounded measures)."""
    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
    )

    cols = [c for c, _ in PROFILE_COLS]
    ds = _read(sf_dir, "lineitem", columns=cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # nulls ride an explicit flag column (a None group KEY would be
        # silently dropped by pandas groupby's dropna default)
        out = []
        for col, kind in PROFILE_COLS:
            v = df[col]
            nulls = int(v.isna().sum())
            vc = _profile_canonical(v[v.notna()], kind).value_counts()
            out.append(
                pd.DataFrame(
                    {
                        "col_name": col,
                        "v": vc.index.astype("object"),
                        "is_null": np.int64(0),
                        "cnt": vc.to_numpy(dtype="int64"),
                    }
                )
            )
            if nulls:
                out.append(
                    pd.DataFrame(
                        {
                            "col_name": [col],
                            "v": [""],
                            "is_null": [np.int64(1)],
                            "cnt": [nulls],
                        }
                    )
                )
        return pd.concat(out, ignore_index=True)

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["col_name", "v", "is_null"],
        {"cnt": ("cnt", "sum")},
        bucket_keys=["col_name", "v"],
    )

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for col, sub in g.groupby("col_name", sort=False):
            null_mask = sub["is_null"] == 1
            vals = sub.loc[~null_mask, "v"]
            rows.append(
                {
                    "col_name": col,
                    "n_rows": int(sub["cnt"].sum()),
                    "n_null": int(sub.loc[null_mask, "cnt"].sum()),
                    "n_distinct": int(len(vals)),
                    "min_v": vals.min() if len(vals) else None,
                    "max_v": vals.max() if len(vals) else None,
                }
            )
        return pd.DataFrame(rows)

    return grouped_apply(counts, ["col_name"], rollup)


#: outlier threshold: flag events more than K standard deviations from
#: their user's mean value (integer-squared form, see events_outliers).
OUTLIER_K = 3


def events_outliers(sf_dir: str, k: int = OUTLIER_K) -> rd.Dataset:
    """Per-user statistical outlier detection -- flag events whose value
    sits more than k standard deviations from the user's own mean (the
    fraud/telemetry anomaly primitive).

    The z-score test runs ENTIRELY in integers: with cent-quantized
    values v, per-user n / sum(v) / sum(v^2),

        |v - mean| > k*sigma   <=>   (n*v - sum)^2 > k^2 * (n*sumsq - sum^2)

    (multiply through by n^2; var = (n*sumsq - sum^2)/n^2) -- no sqrt,
    no division, so pandas int64 and DuckDB BIGINT agree bit-exactly.

    Scale shape: ONE user-bucketed shuffle of the (pruned) events --
    unavoidable, since the flagged rows ARE events and each needs its
    user's full-stream statistics; inside the bucket the per-user
    (n, sum, sumsq) reduction and the flag test are single cython
    groupby/vector kernels.  Only flagged rows leave the bucket stage."""
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "v": df["value"].mul(100).round().astype("int64"),
            }
        ),
        batch_format="pandas",
    )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "value_c": pd.Series(dtype="int64")}
            )
        # int64 overflow guard, ALL bounds computed in Python ints BEFORE
        # the int64 arithmetic they protect (numpy wraps silently where
        # the SQL oracle errors loudly -- fail the same way it does):
        # v*v and its per-user sum first, then -- with the per-user maxima
        # known -- |d| = |n*v - s| and the k^2 * (n*sq - s^2) rhs.
        LIM = 1 << 62
        vmax = int(g["v"].abs().max())
        if vmax * vmax >= LIM or len(g) * vmax * vmax >= LIM:
            raise OverflowError(
                "events_outliers int64 range exceeded -- rescale the value "
                "unit (cents -> dollars) or shard users before the z-test"
            )
        # cython-path aggregates only (a Python lambda agg would run once
        # per user -- interpreter-bound at corpus-scale user cardinality)
        st = (
            g.assign(v2=g["v"] * g["v"])
            .groupby("user_id", as_index=False)
            .agg(n=("v", "size"), s=("v", "sum"), sq=("v2", "sum"))
        )
        nmax = int(st["n"].max())
        smax = int(st["s"].abs().max())
        sqmax = int(st["sq"].max())
        dbound = nmax * vmax + smax
        if dbound * dbound >= LIM or k * k * (nmax * sqmax + smax * smax) >= LIM:
            raise OverflowError(
                "events_outliers int64 range exceeded -- rescale the value "
                "unit (cents -> dollars) or shard users before the z-test"
            )
        m = g.merge(st, on="user_id")
        d = m["n"] * m["v"] - m["s"]
        lhs = d * d
        rhs = k * k * (m["n"] * m["sq"] - m["s"] * m["s"])
        out = m[lhs > rhs]
        return pd.DataFrame(
            {
                "event_id": out["event_id"],
                "user_id": out["user_id"],
                "value_c": out["v"],
            }
        )

    return grouped_apply(ds, ["user_id"], flag, bucket_keys=["user_id"])


#: Q18 parameters: orders whose total quantity exceeds the threshold.
Q18_MIN_QTY = 180
Q18_K = 20


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (large-volume customers): HAVING over FACT-SCALE
    groups -- sum lineitem quantity per order, keep orders above the
    threshold, attach order + customer attributes, top-k by price.

    Scale shape: a per-batch combiner pre-sums quantities per orderkey
    (order cardinality per block, not row cardinality), ONE
    orderkey-bucketed aggregate applies the HAVING filter in-bucket --
    only qualifying orders (a tiny fraction) continue.  Orders join the
    qualifiers orderkey-bucketed, customers custkey-bucketed (BOTH fact
    tables grow with SF -- nothing broadcasts), and the final top-k is
    per-block partials merged on the driver (blocks x k rows)."""
    from ontology_time_machine_ray.stages.groupagg import (
        bucketed_join,
        grouped_aggregate,
    )

    def combine(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy(),
            }
        )
        return df.groupby("l_orderkey", as_index=False).agg(qty=("qty", "sum"))

    partials = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        combine, batch_format="pyarrow"
    )
    big = grouped_aggregate(partials, ["l_orderkey"], {"sum_qty": ("qty", "sum")}).map_batches(
        lambda df: df[df["sum_qty"] > Q18_MIN_QTY].rename(
            columns={"l_orderkey": "o_orderkey"}
        ),
        batch_format="pandas",
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: pd.DataFrame(
            {
                "o_orderkey": t["o_orderkey"].to_numpy(),
                "c_custkey": t["o_custkey"].to_numpy(),
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ).to_numpy(),
            }
        ),
        batch_format="pyarrow",
    )
    j1 = bucketed_join(
        big,
        orders,
        on=["o_orderkey"],
        left_schema={"o_orderkey": "int64", "sum_qty": "int64"},
        right_schema={"o_orderkey": "int64", "c_custkey": "int64", "price_c": "int64"},
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = bucketed_join(
        j1,
        cust,
        on=["c_custkey"],
        left_schema={
            "o_orderkey": "int64",
            "sum_qty": "int64",
            "c_custkey": "int64",
            "price_c": "int64",
        },
        right_schema={"c_custkey": "int64", "c_name": "object"},
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["price_c", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(Q18_K)

    merged = j2.map_batches(topk, batch_format="pandas").to_pandas()
    out = topk(merged).reset_index(drop=True)
    return out[["c_name", "o_orderkey", "price_c", "sum_qty"]]


#: allowed lateness for the watermark accounting (seconds).
LATENESS_S = 300


def events_late_arrivals(sf_dir: str, lateness_s: int = LATENESS_S) -> rd.Dataset:
    """Streaming late-data accounting: per hourly event-time window,
    how many events arrived AFTER the per-user watermark had passed --
    the event-time-vs-processing-time bookkeeping every streaming
    ingest needs (what to send to the late-data side output).

    The arrival sequence is ``event_id`` with every 11th delivery
    DELAYED by 50 sequence slots (the fixture's event_id order tracks
    event time exactly, so an undelayed replay has no late data; the
    deterministic delay models the straggling deliveries real ingest
    sees).  The watermark at each arrival is the running max event-time
    of the user's PRIOR arrivals minus the allowed lateness, and an
    event is late iff its event time sits below that.  Epoch-second
    integers keep both engines bit-exact.

    Scale shape: ONE user-bucketed pass (sort by arrival within the
    bucket, vectorized cummax/shift -- the events_window_funcs
    machinery) emits per-(hour) combiner partials, and one
    vocabulary-scale hour-bucketed aggregate rolls them up; raw events
    never leave the first shuffle."""
    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
    )

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "t": df["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000,
            }
        ),
        batch_format="pandas",
    )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "hour": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "n_late": pd.Series([], dtype="int64"),
                }
            )
        # vectorized per-user running max of PRIOR arrivals: one sort,
        # two cython groupby kernels (cummax, shift) -- no user loop
        eid = g["event_id"].to_numpy()
        g = g.assign(arr=eid + 50 * (eid % 11 == 0))
        g = g.sort_values(["user_id", "arr", "event_id"], kind="stable")
        cm = g.groupby("user_id", sort=False)["t"].cummax()
        wm = cm.groupby(g["user_id"], sort=False).shift(1)
        late = (g["t"] + lateness_s < wm).fillna(False)
        f = pd.DataFrame(
            {"hour": g["t"].to_numpy() // 3600, "late": late.to_numpy().astype("int64")}
        )
        return f.groupby("hour", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum")
        )

    partials = grouped_apply(ds, ["user_id"], flag, bucket_keys=["user_id"])
    return grouped_aggregate(
        partials,
        ["hour"],
        {"n_events": ("n_events", "sum"), "n_late": ("n_late", "sum")},
    )


def cheapest_part(sf_dir: str) -> rd.Dataset:
    """Argmin-per-group WITH attribute recovery (the TPC-H Q2 core, at
    the grain this schema supports): for every (brand, size) the
    cheapest part, carrying its key/name -- NOT expressible as a plain
    grouped aggregate because non-grouped attributes must survive.

    Scale shape: ``grouped_head1`` -- per-batch local head-1 combiner,
    then one (brand, size)-bucketed vectorized head-1; ties break on
    p_partkey so the winner is unique and rerun-stable.  Price rides as
    exact cents."""
    from ontology_time_machine_ray.stages.groupagg import grouped_head1

    ds = _read(
        sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_size", "p_retailprice"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "p_brand": df["p_brand"],
                "p_size": df["p_size"].astype("int64"),
                "price_c": df["p_retailprice"].mul(100).round().astype("int64"),
                "p_partkey": df["p_partkey"].astype("int64"),
                "p_name": df["p_name"],
            }
        ),
        batch_format="pandas",
    )
    return grouped_head1(
        ds, keys=["p_brand", "p_size"], order_by=["price_c", "p_partkey"]
    )


def events_trends(sf_dir: str, min_run: int = 3) -> rd.Dataset:
    """Kleene+-style event TREND aggregation (the SASE / event-trend-
    aggregation pattern, cf. "Event Trend Aggregation Under Rich Event
    Matching Semantics", SIGMOD 2019): per user, the maximal strictly-
    increasing value runs in event-time order -- count of runs reaching
    ``min_run`` events and the longest run.  Trend aggregation avoids
    materializing the (exponentially many) sub-trends by aggregating
    maximal runs directly; here that collapses to ONE user-bucketed pass
    with a vectorized gap-and-island (a run starts at a user change or
    a non-increase), no per-event pattern automaton.

    Ordering contract: rows sort by (user, ts, event_id) inside the
    bucket, so cross-block order never matters."""

    def trends_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"] != g["user_id"].shift()
        rising = g["value"] > g["value"].shift()
        start = (new_user | ~rising).astype("int64")
        run_id = start.cumsum()
        runs = (
            g.assign(_run=run_id.to_numpy())
            .groupby(["user_id", "_run"], as_index=False)
            .agg(run_len=("event_id", "size"))
        )
        return runs.groupby("user_id", as_index=False).agg(
            n_trends=("run_len", lambda s: int((s >= min_run).sum())),
            max_run=("run_len", "max"),
        )

    out = grouped_apply(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        ["user_id"],
        trends_in_bucket,
    )
    return out.map_batches(
        lambda df: df.astype({"n_trends": "int64", "max_run": "int64"}),
        batch_format="pandas",
    )


def events_comovement(
    sf_dir: str, min_shared: int = 4, max_cell_users: int = 64
) -> rd.Dataset:
    """Distributed co-movement pattern detection (cf. "Real-time
    Distributed Co-Movement Pattern Detection on Streaming Trajectories",
    VLDB 2019, restated on the events stream): pairs of users co-present
    in the same (hour, event_type) cell at least ``min_shared`` times --
    the spatio-temporal-companion shape with the cell grid standing in
    for the trajectory snapshot partitioning.

    Scale shape: ONE cell-bucketed pass expands each cell's user set to
    unordered pairs with the shared vectorized index machinery
    (`graph.pairwise_within` -- no Python loop over cells), then one
    pair-bucketed count.  The quadratic hazard is a HOT CELL, not a hot
    user: cells with more than ``max_cell_users`` distinct users are
    dropped BEFORE expansion (a stampede cell carries no companionship
    signal; the cap is the df-cap idiom of the dup-pair family) -- so
    pair volume per cell is bounded by the cap squared."""
    from ontology_time_machine_ray.stages.graph import pairwise_within

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def to_cells(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hh": df["ts"].dt.floor("h"),
                "event_type": df["event_type"],
                "user_id": df["user_id"],
            }
        ).drop_duplicates()

    cells = ev.map_batches(to_cells, batch_format="pandas")

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["hh", "event_type", "user_id"])
        sizes = g.groupby(["hh", "event_type"])["user_id"].transform("size")
        g = g[sizes <= max_cell_users]
        return pairwise_within(g, ["hh", "event_type"], "user_id")

    pairs = grouped_apply(cells, ["hh", "event_type"], cell_pairs)
    counts = grouped_aggregate(
        pairs.map_batches(
            lambda df: df.groupby(["a", "b"], as_index=False).agg(n=("a", "size")),
            batch_format="pandas",
        ),
        ["a", "b"],
        {"n_shared": ("n", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["n_shared"] >= min_shared].rename(
            columns={"a": "user_a", "b": "user_b"}
        )
        return out.astype({"user_a": "int64", "user_b": "int64", "n_shared": "int64"})

    return counts.map_batches(finish, batch_format="pandas")


Q7_NATION_A = "NATION_11"
Q7_NATION_B = "NATION_20"
Q7_START = "1995-01-01"
Q7_END = "1997-01-01"


def q7_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: shipped revenue BETWEEN two nations per direction
    and year -- the bi-directional trade-volume join.

    Distributed plan (the q5 discipline): nation (25 rows) broadcasts as
    a name map; supplier and customer are pre-filtered streaming to the
    two nations of interest and then key-bucketed -- three bucketed
    shuffles total (suppkey, custkey, orderkey), with lineitem reduced
    to (orderkey, suppkey, year, rev) batch partials BEFORE its
    exchange and every join schema-hinted.  The final aggregate is
    (direction x year) grain on the driver.  Revenue is the exact
    cent x basis-point integer of q3/q5."""
    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    pick = nation[nation["n_name"].isin((Q7_NATION_A, Q7_NATION_B))]
    name_ref = ray.put(dict(zip(pick["n_nationkey"], pick["n_name"])))

    def items(df: pd.DataFrame) -> pd.DataFrame:
        start, end = pd.Timestamp(Q7_START), pd.Timestamp(Q7_END)
        df = df[(df["l_shipdate"] >= start) & (df["l_shipdate"] < end)]
        rev = (df["l_extendedprice"] * 100).round().astype("int64") * (
            100 - (df["l_discount"] * 100).round().astype("int64")
        )
        out = pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"],
                "s_suppkey": df["l_suppkey"],
                "l_year": df["l_shipdate"].dt.year.astype("int64"),
                "rev_e4": rev,
            }
        )
        return out.groupby(
            ["o_orderkey", "s_suppkey", "l_year"], as_index=False
        ).agg(rev_e4=("rev_e4", "sum"))

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(items, batch_format="pandas")

    def picked_suppliers(df: pd.DataFrame) -> pd.DataFrame:
        keys = cached_get(name_ref)
        df = df[df["s_nationkey"].isin(keys)]
        return pd.DataFrame(
            {"s_suppkey": df["s_suppkey"], "s_nationkey": df["s_nationkey"]}
        )

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        picked_suppliers, batch_format="pandas"
    )
    li2 = bucketed_join(
        li,
        supp,
        on=["s_suppkey"],
        left_schema={
            "o_orderkey": "int64",
            "s_suppkey": "int64",
            "l_year": "int64",
            "rev_e4": "int64",
        },
        right_schema={"s_suppkey": "int64", "s_nationkey": "int32"},
    ).map_batches(
        lambda df: df[["o_orderkey", "l_year", "rev_e4", "s_nationkey"]],
        batch_format="pandas",
    )

    def picked_customers(df: pd.DataFrame) -> pd.DataFrame:
        keys = cached_get(name_ref)
        df = df[df["c_nationkey"].isin(keys)]
        return pd.DataFrame(
            {"o_custkey": df["c_custkey"], "c_nationkey": df["c_nationkey"]}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        picked_customers, batch_format="pandas"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o2 = bucketed_join(
        orders,
        cust,
        on=["o_custkey"],
        left_schema={"o_orderkey": "int64", "o_custkey": "int64"},
        right_schema={"o_custkey": "int64", "c_nationkey": "int32"},
    ).map_batches(
        lambda df: df[["o_orderkey", "c_nationkey"]], batch_format="pandas"
    )
    j = bucketed_join(
        li2,
        o2,
        on=["o_orderkey"],
        left_schema={
            "o_orderkey": "int64",
            "l_year": "int64",
            "rev_e4": "int64",
            "s_nationkey": "int32",
        },
        right_schema={"o_orderkey": "int64", "c_nationkey": "int32"},
    )

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        # the two cross directions only (same-nation trade is not Q7)
        df = df[df["s_nationkey"] != df["c_nationkey"]]
        return df.groupby(
            ["s_nationkey", "c_nationkey", "l_year"], as_index=False
        ).agg(rev_e4=("rev_e4", "sum"))

    parts = j.map_batches(partials, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "supp_nation": pd.Series(dtype="object"),
                "cust_nation": pd.Series(dtype="object"),
                "l_year": pd.Series(dtype="int64"),
                "revenue": pd.Series(dtype="float64"),
            }
        )
    agg = parts.groupby(
        ["s_nationkey", "c_nationkey", "l_year"], as_index=False
    ).agg(rev_e4=("rev_e4", "sum"))
    names = dict(zip(pick["n_nationkey"], pick["n_name"]))
    agg["supp_nation"] = agg["s_nationkey"].map(names)
    agg["cust_nation"] = agg["c_nationkey"].map(names)
    agg["revenue"] = agg["rev_e4"] / 10000.0
    return (
        agg[["supp_nation", "cust_nation", "l_year", "revenue"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"], kind="stable")
        .reset_index(drop=True)
    )


Q14_START = "1995-06-01"
Q14_END = "1995-07-01"


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: the promo-type share of one ship-month's revenue.

    part GROWS with SF, so the type flag joins by ONE partkey-bucketed
    shuffle (never broadcast), with lineitem cut to the month and
    pre-combined to (partkey, rev) partials first; the result is a
    single row of exact integers -- cent x basis-point revenue for the
    promo side and the total, plus the share in integer ppm
    (promo * 1e6 // total), so the oracle compares BIGINTs only."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    start, end = pd.Timestamp(Q14_START), pd.Timestamp(Q14_END)

    def items(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_shipdate"] >= start) & (df["l_shipdate"] < end)]
        rev = (df["l_extendedprice"] * 100).round().astype("int64") * (
            100 - (df["l_discount"] * 100).round().astype("int64")
        )
        return (
            pd.DataFrame({"p_partkey": df["l_partkey"], "rev_e4": rev})
            .groupby("p_partkey", as_index=False)
            .agg(rev_e4=("rev_e4", "sum"))
        )

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(items, batch_format="pandas")
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "p_partkey": df["p_partkey"],
                "is_promo": (df["p_type"] == "PROMO").astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    j = bucketed_join(
        li,
        part,
        on=["p_partkey"],
        left_schema={"p_partkey": "int64", "rev_e4": "int64"},
        right_schema={"p_partkey": "int64", "is_promo": "int64"},
    )
    parts = j.map_batches(
        lambda df: pd.DataFrame(
            {
                "promo_rev_e4": [int((df["rev_e4"] * df["is_promo"]).sum())],
                "total_rev_e4": [int(df["rev_e4"].sum())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    promo = int(parts["promo_rev_e4"].sum())
    total = int(parts["total_rev_e4"].sum())
    return pd.DataFrame(
        {
            "promo_rev_e4": pd.Series([promo], dtype="int64"),
            "total_rev_e4": pd.Series([total], dtype="int64"),
            "promo_ppm": pd.Series(
                [promo * 1_000_000 // total if total else 0], dtype="int64"
            ),
        }
    )


def q13_custdist(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers -- the double aggregation behind
    "how engaged is the customer base".

    Distributed plan: per-batch order counts by custkey (combiner), one
    custkey-bucketed LEFT join from the customer side (so customers
    with no orders survive with count 0), then the second aggregation
    runs at order-count grain -- a histogram, bounded by the max orders
    per customer, reduced via per-batch partials + a driver-side sum of
    a few dozen rows."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    counts = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda df: df.groupby("o_custkey", as_index=False).agg(
            c_count=("o_custkey", "size")
        ),
        batch_format="pandas",
    )
    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda df: pd.DataFrame({"o_custkey": df["c_custkey"]}),
        batch_format="pandas",
    )
    j = bucketed_join(
        cust,
        counts,
        on=["o_custkey"],
        how="left",
        left_schema={"o_custkey": "int64"},
        right_schema={"o_custkey": "int64", "c_count": "int64"},
        # per-key combine INSIDE the join's exchange: batch partials of
        # the same custkey sum here, so the bucket emits one row per
        # customer
        post=lambda df: df.fillna({"c_count": 0})
        .groupby("o_custkey", as_index=False)
        .agg(c_count=("c_count", "sum")),
    )
    hist = j.map_batches(
        lambda df: df.groupby("c_count", as_index=False).agg(
            custdist=("c_count", "size")
        ),
        batch_format="pandas",
    ).to_pandas()
    out = (
        hist.groupby("c_count", as_index=False)
        .agg(custdist=("custdist", "sum"))
        .astype({"c_count": "int64", "custdist": "int64"})
        .sort_values(["custdist", "c_count"], ascending=[False, False], kind="stable")
        .reset_index(drop=True)
    )
    return out


#: (brand, size_lo, size_hi, qty_lo, qty_hi) disjuncts for the Q19 shape.
Q19_TERMS = (
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#34", 1, 35, 20, 30),
)


def q19_discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of brand/size/
    quantity predicates -- the OR-of-conjunctions filter join.

    Distributed plan: the part side prefilters streaming to the union
    of the three brands (and tags each row with its term index), so the
    ONE partkey-bucketed shuffle moves only candidate parts and
    quantity-prefiltered lineitem partials; the per-term quantity
    windows evaluate vectorized inside the join's buckets.  Output is a
    single exact-integer revenue row."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    brands = {b: (slo, shi, qlo, qhi) for b, slo, shi, qlo, qhi in Q19_TERMS}
    qty_min = min(q[2] for q in brands.values())
    qty_max = max(q[3] for q in brands.values())

    def parts_side(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["p_brand"].isin(brands)]
        out = {
            "p_partkey": df["p_partkey"],
            "p_size": df["p_size"].astype("int64"),
            "p_brand": df["p_brand"],
        }
        return pd.DataFrame(out)

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        parts_side, batch_format="pandas"
    )

    def items(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["l_quantity"]
        df = df[(qty >= qty_min) & (qty <= qty_max)]
        rev = (df["l_extendedprice"] * 100).round().astype("int64") * (
            100 - (df["l_discount"] * 100).round().astype("int64")
        )
        return pd.DataFrame(
            {
                "p_partkey": df["l_partkey"],
                "l_quantity": df["l_quantity"].astype("int64"),
                "rev_e4": rev,
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(items, batch_format="pandas")

    def eval_terms(df: pd.DataFrame) -> pd.DataFrame:
        keep = pd.Series(False, index=df.index)
        for b, (slo, shi, qlo, qhi) in brands.items():
            keep |= (
                (df["p_brand"] == b)
                & (df["p_size"] >= slo)
                & (df["p_size"] <= shi)
                & (df["l_quantity"] >= qlo)
                & (df["l_quantity"] <= qhi)
            )
        return pd.DataFrame({"rev_e4": [int(df.loc[keep, "rev_e4"].sum())]})

    j = bucketed_join(
        li,
        part,
        on=["p_partkey"],
        left_schema={"p_partkey": "int64", "l_quantity": "int64", "rev_e4": "int64"},
        right_schema={"p_partkey": "int64", "p_size": "int64", "p_brand": "object"},
        post=eval_terms,
    )
    total = int(j.to_pandas()["rev_e4"].sum())
    return pd.DataFrame(
        {
            "revenue_e4": pd.Series([total], dtype="int64"),
            "revenue": pd.Series([total / 10000.0], dtype="float64"),
        }
    )
