"""Range-clustered table layout + pruned range reads.

The relational counterpart of the IVF index (similarity.py): cluster a
fact table into one parquet directory per VALUE RANGE of a clustering
column, boundaries drawn from the exact distributed value histogram, and
answer range predicates by reading ONLY the overlapping directories --
prune at the read, not a post-read filter.  This is the layout every
lakehouse range/Z-order clustering feature provides; at 100 TB the
difference between scanning 2/16 and 16/16 of the table is the whole
game.

Boundary derivation reuses the exact-histogram quantile pattern
(pipelines/relational.price_quantiles): one combiner pass + a
distinct-value-grain shuffle; the driver walks the small histogram.
"""

from __future__ import annotations

import json
import math
import os

import pandas as pd
import ray.data as rd

from ontology_time_machine_ray.sources.readers import sized_read_parquet

#: clustering buckets for the lineitem price layout.
N_RANGE_BUCKETS = 16
#: the benchmark range predicate (cents): covers ~2-3 of 16 buckets.
RANGE_LO_C = 3_000_000
RANGE_HI_C = 4_500_000


def _hist_boundaries(sf_dir: str, n_buckets: int) -> list[int]:
    """Equal-count bucket boundaries (cents, upper-exclusive) from the
    exact value histogram of l_extendedprice."""
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    ds = sized_read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    ).map_batches(
        lambda df: df.assign(
            price_c=(df["l_extendedprice"] * 100).round().astype("int64")
        )
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
    cum = hist["n"].cumsum()
    total = int(cum.iloc[-1])
    bounds = []
    for i in range(1, n_buckets):
        target = max(1, math.ceil(i / n_buckets * total))
        idx = int((cum >= target).idxmax())
        bounds.append(int(hist["price_c"].iloc[idx]))
    # strictly increasing (duplicate quantiles collapse a bucket to empty)
    return sorted(set(bounds))


def _publish_layout(staging: str, out_dir: str) -> str:
    """Atomically install a fully-built staging directory as the shared
    /tmp cache entry.  Concurrent first-builders each build into their own
    unique staging dir; the rename loser keeps the winner's directory
    (which carries its own ``_SUCCESS``) and discards its staging copy --
    a reader can therefore never observe half-written bucket files."""
    import shutil

    try:
        os.rename(staging, out_dir)
        return out_dir
    except OSError:
        if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
            shutil.rmtree(staging, ignore_errors=True)
            return out_dir
        # a crashed partial build occupies the slot: replace it
        shutil.rmtree(out_dir, ignore_errors=True)
        os.rename(staging, out_dir)
        return out_dir


def build_range_layout(
    sf_dir: str, n_buckets: int = N_RANGE_BUCKETS
) -> tuple[str, list[int]]:
    """Materialize the range-clustered layout: one directory per price
    range with a min/max manifest.  Cached in /tmp keyed by the input
    file identity (the IVF pattern -- a regenerated fixture can never
    serve a stale layout)."""
    import hashlib

    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    ident = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{n_buckets}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join("/tmp/otm_range_layout", ident)
    mpath = os.path.join(out_dir, "manifest.json")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        with open(mpath) as f:
            return out_dir, json.load(f)["bounds"]

    bounds = _hist_boundaries(sf_dir, n_buckets)
    import uuid

    staging = f"{out_dir}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(staging, exist_ok=True)
    barr = np.asarray(bounds, dtype=np.int64)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        price_c = (df["l_extendedprice"] * 100).round().astype("int64")
        return df.assign(
            price_c=price_c,
            bucket=np.searchsorted(barr, price_c.to_numpy(), side="right").astype(
                "int64"
            ),
        )

    assigned = sized_read_parquet(
        src, columns=["l_orderkey", "l_returnflag", "l_extendedprice"]
    ).map_batches(assign, batch_format="pandas")

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for bid, sub in g.groupby("bucket", sort=True):
            bdir = os.path.join(staging, f"range={int(bid):04d}")
            os.makedirs(bdir, exist_ok=True)
            sub.drop(columns=["bucket"]).to_parquet(
                os.path.join(bdir, "data.parquet"), index=False
            )
            out.append(
                {"bucket": int(bid), "rows": len(sub),
                 "min_c": int(sub["price_c"].min()), "max_c": int(sub["price_c"].max())}
            )
        return pd.DataFrame(out)

    stats = grouped_apply(assigned, ["bucket"], write_bucket).to_pandas()
    with open(os.path.join(staging, "manifest.json"), "w") as f:
        json.dump(
            {"bounds": bounds,
             "buckets": stats.sort_values("bucket").to_dict(orient="records")},
            f,
        )
    with open(os.path.join(staging, "_SUCCESS"), "w") as f:
        f.write(ident)
    return _publish_layout(staging, out_dir), bounds


def pruned_range_dirs(
    out_dir: str, bounds: list[int], lo_c: int, hi_c: int
) -> tuple[list[str], int]:
    """Directories overlapping [lo_c, hi_c] per the manifest, plus the
    total directory count (for prune-ratio assertions)."""
    import numpy as np

    barr = np.asarray(bounds, dtype=np.int64)
    lo_b = int(np.searchsorted(barr, lo_c, side="right"))
    hi_b = int(np.searchsorted(barr, hi_c, side="right"))
    all_dirs = sorted(
        d for d in os.listdir(out_dir) if d.startswith("range=")
    )
    keep = [
        os.path.join(out_dir, d)
        for d in all_dirs
        if lo_b <= int(d.split("=")[1]) <= hi_b
    ]
    return keep, len(all_dirs)


def range_layout_query(
    sf_dir: str, lo_c: int = RANGE_LO_C, hi_c: int = RANGE_HI_C
) -> rd.Dataset:
    """Per-returnflag count + exact cent sum over the price window,
    reading ONLY the overlapping range directories."""
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    out_dir, bounds = build_range_layout(sf_dir)
    dirs, _total = pruned_range_dirs(out_dir, bounds, lo_c, hi_c)
    if not dirs:
        return rd.from_pandas(
            pd.DataFrame(
                {"l_returnflag": pd.Series(dtype=object),
                 "n_rows": pd.Series(dtype="int64"),
                 "sum_price_c": pd.Series(dtype="int64")}
            )
        )
    ds = sized_read_parquet(
        [os.path.join(d, "data.parquet") for d in dirs],
        columns=["l_returnflag", "price_c"],
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["price_c"] >= lo_c) & (df["price_c"] <= hi_c)]
        return df.groupby("l_returnflag", as_index=False).agg(
            n_rows=("price_c", "size"), sum_price_c=("price_c", "sum")
        )

    return grouped_aggregate(
        ds.map_batches(agg, batch_format="pandas"),
        ["l_returnflag"],
        {"n_rows": ("n_rows", "sum"), "sum_price_c": ("sum_price_c", "sum")},
    )


# --------------------------------------------------------------------- #
# 2-D grid clustering (price x shipdate): multi-dimensional pruning      #
# --------------------------------------------------------------------- #
#: grid edge per dimension (GRID_B x GRID_B cells).
GRID_B = 8
#: the benchmark rectangle: price window x ship-date window.
GRID_DATE_LO = "1997-01-01"
GRID_DATE_HI = "1999-01-01"


def _day_number(ts: pd.Series) -> pd.Series:
    """Days since epoch (int64) -- the integer clustering coordinate for
    the date dimension (exact on both engines).  Normalized to ns first:
    parquet timestamps arrive as datetime64[us], and an int64 view of
    those is microseconds -- dividing by the ns-per-day constant without
    normalizing yields day numbers 1000x too small."""
    return (
        ts.astype("datetime64[ns]").astype("int64") // 86_400_000_000_000
    ).astype("int64")


def _grid_boundaries(sf_dir: str) -> tuple[list[int], list[int]]:
    """Equal-count boundaries per dimension from ONE fused histogram pass
    (both value histograms come out of the same read)."""
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    ds = sized_read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_shipdate"],
    ).map_batches(
        lambda df: pd.concat(
            [
                pd.DataFrame(
                    {"dim": 0,
                     "v": (df["l_extendedprice"] * 100).round().astype("int64")}
                ),
                pd.DataFrame({"dim": 1, "v": _day_number(df["l_shipdate"])}),
            ],
            ignore_index=True,
        )
        .groupby(["dim", "v"], as_index=False)
        .agg(n=("v", "size")),
        batch_format="pandas",
    )
    hist = (
        grouped_aggregate(ds, ["dim", "v"], {"n": ("n", "sum")})
        .to_pandas()
        .sort_values(["dim", "v"])
    )
    out = []
    for dim in (0, 1):
        h = hist[hist["dim"] == dim].reset_index(drop=True)
        cum = h["n"].cumsum()
        total = int(cum.iloc[-1])
        bounds = []
        for i in range(1, GRID_B):
            target = max(1, math.ceil(i / GRID_B * total))
            idx = int((cum >= target).idxmax())
            bounds.append(int(h["v"].iloc[idx]))
        out.append(sorted(set(bounds)))
    return out[0], out[1]


def build_grid_layout(sf_dir: str) -> tuple[str, list[int], list[int]]:
    """Materialize the (price-bucket, date-bucket) grid: one directory per
    CELL.  A rectangle query reads only the cells its ranges overlap --
    pruning in BOTH dimensions (what lakehouse Z-order clustering buys;
    with the cell as the partition unit the Z-curve's file-chunking is
    the identity, so the grid is the honest equivalent)."""
    import hashlib

    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    ident = hashlib.sha1(
        f"grid:{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{GRID_B}".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join("/tmp/otm_grid_layout", ident)
    mpath = os.path.join(out_dir, "manifest.json")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        with open(mpath) as f:
            m = json.load(f)
        return out_dir, m["pb"], m["db"]

    pb, db = _grid_boundaries(sf_dir)
    import uuid

    staging = f"{out_dir}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(staging, exist_ok=True)
    pbar = np.asarray(pb, dtype=np.int64)
    dbar = np.asarray(db, dtype=np.int64)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        price_c = (df["l_extendedprice"] * 100).round().astype("int64")
        day = _day_number(df["l_shipdate"])
        cell = (
            np.searchsorted(pbar, price_c.to_numpy(), side="right") * (GRID_B + 1)
            + np.searchsorted(dbar, day.to_numpy(), side="right")
        ).astype("int64")
        return df.assign(price_c=price_c, day=day, cell=cell)

    assigned = sized_read_parquet(
        src, columns=["l_returnflag", "l_extendedprice", "l_shipdate"]
    ).map_batches(assign, batch_format="pandas")

    def write_cell(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, sub in g.groupby("cell", sort=True):
            cdir = os.path.join(staging, f"cell={int(cid):04d}")
            os.makedirs(cdir, exist_ok=True)
            sub.drop(columns=["cell"]).to_parquet(
                os.path.join(cdir, "data.parquet"), index=False
            )
            out.append({"cell": int(cid), "rows": len(sub)})
        return pd.DataFrame(out)

    grouped_apply(assigned, ["cell"], write_cell).materialize()
    with open(os.path.join(staging, "manifest.json"), "w") as f:
        json.dump({"pb": pb, "db": db}, f)
    with open(os.path.join(staging, "_SUCCESS"), "w") as f:
        f.write(ident)
    return _publish_layout(staging, out_dir), pb, db


def pruned_grid_dirs(
    out_dir: str, pb: list[int], db: list[int],
    lo_c: int, hi_c: int, lo_day: int, hi_day: int,
) -> tuple[list[str], int]:
    """Cell directories overlapping the rectangle, plus the total count."""
    import numpy as np

    pbar = np.asarray(pb, dtype=np.int64)
    dbar = np.asarray(db, dtype=np.int64)
    p_lo = int(np.searchsorted(pbar, lo_c, side="right"))
    p_hi = int(np.searchsorted(pbar, hi_c, side="right"))
    d_lo = int(np.searchsorted(dbar, lo_day, side="right"))
    d_hi = int(np.searchsorted(dbar, hi_day, side="right"))
    all_dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("cell="))
    keep = []
    for d in all_dirs:
        cid = int(d.split("=")[1])
        pcell, dcell = divmod(cid, GRID_B + 1)
        if p_lo <= pcell <= p_hi and d_lo <= dcell <= d_hi:
            keep.append(os.path.join(out_dir, d))
    return keep, len(all_dirs)


def grid_layout_query(
    sf_dir: str,
    lo_c: int = RANGE_LO_C,
    hi_c: int = RANGE_HI_C,
    date_lo: str = GRID_DATE_LO,
    date_hi: str = GRID_DATE_HI,
) -> rd.Dataset:
    """Per-returnflag count + cent sum over a price x ship-date rectangle,
    reading ONLY the overlapping grid cells (2-D pruning)."""
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    out_dir, pb, db = build_grid_layout(sf_dir)
    lo_day = pd.Timestamp(date_lo).value // 86_400_000_000_000
    hi_day = pd.Timestamp(date_hi).value // 86_400_000_000_000 - 1  # exclusive hi
    dirs, _total = pruned_grid_dirs(out_dir, pb, db, lo_c, hi_c, lo_day, hi_day)
    if not dirs:
        return rd.from_pandas(
            pd.DataFrame(
                {"l_returnflag": pd.Series(dtype=object),
                 "n_rows": pd.Series(dtype="int64"),
                 "sum_price_c": pd.Series(dtype="int64")}
            )
        )
    ds = sized_read_parquet(
        [os.path.join(d, "data.parquet") for d in dirs],
        columns=["l_returnflag", "price_c", "day"],
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df[
            (df["price_c"] >= lo_c) & (df["price_c"] <= hi_c)
            & (df["day"] >= lo_day) & (df["day"] <= hi_day)
        ]
        return df.groupby("l_returnflag", as_index=False).agg(
            n_rows=("price_c", "size"), sum_price_c=("price_c", "sum")
        )

    return grouped_aggregate(
        ds.map_batches(agg, batch_format="pandas"),
        ["l_returnflag"],
        {"n_rows": ("n_rows", "sum"), "sum_price_c": ("sum_price_c", "sum")},
    )
