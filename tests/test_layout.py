"""Range-clustered layout: pruning completeness, actual prune ratio, and
layout integrity (union of directories == table)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from ontology_time_machine_ray.stages import layout


def test_range_layout_prunes_and_matches_full_scan(ray_session, sf_dir):
    shutil.rmtree("/tmp/otm_range_layout", ignore_errors=True)
    out_dir, bounds = layout.build_range_layout(sf_dir)
    dirs, total = layout.pruned_range_dirs(
        out_dir, bounds, layout.RANGE_LO_C, layout.RANGE_HI_C
    )
    assert 0 < len(dirs) < total, (len(dirs), total)  # real pruning happened

    got = (
        layout.range_layout_query(sf_dir)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    li = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    ).to_pandas()
    li["price_c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li = li[(li["price_c"] >= layout.RANGE_LO_C) & (li["price_c"] <= layout.RANGE_HI_C)]
    want = (
        li.groupby("l_returnflag", as_index=False)
        .agg(n_rows=("price_c", "size"), sum_price_c=("price_c", "sum"))
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_range_layout_union_is_whole_table(ray_session, sf_dir):
    out_dir, bounds = layout.build_range_layout(sf_dir)
    n = 0
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("range="):
            continue
        t = pq.read_table(os.path.join(out_dir, d, "data.parquet"))
        n += t.num_rows
        # every row inside its manifest range
        pc = t["price_c"].to_pandas()
        b = int(d.split("=")[1])
        lo = bounds[b - 1] if b > 0 else None
        hi = bounds[b] if b < len(bounds) else None
        # searchsorted(side="right") assignment: bounds[b-1] <= price < bounds[b]
        if lo is not None:
            assert (pc >= lo).all()
        if hi is not None:
            assert (pc < hi).all()
    total = pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
    assert n == total


def test_grid_layout_prunes_both_dimensions(ray_session, sf_dir):
    shutil.rmtree("/tmp/otm_grid_layout", ignore_errors=True)
    out_dir, pb, db = layout.build_grid_layout(sf_dir)
    lo_day = pd.Timestamp(layout.GRID_DATE_LO).value // 86_400_000_000_000
    hi_day = pd.Timestamp(layout.GRID_DATE_HI).value // 86_400_000_000_000 - 1
    dirs, total = layout.pruned_grid_dirs(
        out_dir, pb, db, layout.RANGE_LO_C, layout.RANGE_HI_C, lo_day, hi_day
    )
    assert 0 < len(dirs) < total
    # 2-D: strictly fewer cells than pruning on either dimension alone
    all_price, _ = layout.pruned_grid_dirs(
        out_dir, pb, db, layout.RANGE_LO_C, layout.RANGE_HI_C, -10**9, 10**9
    )
    all_date, _ = layout.pruned_grid_dirs(
        out_dir, pb, db, -10**9, 10**18, lo_day, hi_day
    )
    assert len(dirs) < len(all_price)
    assert len(dirs) < len(all_date)

    got = (
        layout.grid_layout_query(sf_dir)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    li = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice", "l_shipdate"],
    ).to_pandas()
    li["price_c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["day"] = layout._day_number(li["l_shipdate"])
    li = li[
        (li["price_c"] >= layout.RANGE_LO_C) & (li["price_c"] <= layout.RANGE_HI_C)
        & (li["day"] >= lo_day) & (li["day"] <= hi_day)
    ]
    want = (
        li.groupby("l_returnflag", as_index=False)
        .agg(n_rows=("price_c", "size"), sum_price_c=("price_c", "sum"))
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_publish_layout_race_and_crash_recovery(tmp_path):
    """The cache publish keeps a completed winner (discarding the loser's
    staging build) and replaces a crashed partial build."""
    from ontology_time_machine_ray.stages.layout import _publish_layout

    # loser path: out_dir already holds a COMPLETE build
    out = tmp_path / "ident1"
    out.mkdir()
    (out / "_SUCCESS").write_text("winner")
    staging = tmp_path / "ident1.build-abc"
    staging.mkdir()
    (staging / "_SUCCESS").write_text("loser")
    got = _publish_layout(str(staging), str(out))
    assert got == str(out)
    assert (out / "_SUCCESS").read_text() == "winner"
    assert not staging.exists()

    # crash path: out_dir holds a PARTIAL build (no _SUCCESS) -> replaced
    out2 = tmp_path / "ident2"
    out2.mkdir()
    (out2 / "data.parquet").write_text("partial garbage")
    staging2 = tmp_path / "ident2.build-def"
    staging2.mkdir()
    (staging2 / "_SUCCESS").write_text("fresh")
    got2 = _publish_layout(str(staging2), str(out2))
    assert got2 == str(out2)
    assert (out2 / "_SUCCESS").read_text() == "fresh"
    assert not (out2 / "data.parquet").exists()
