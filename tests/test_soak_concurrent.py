"""Round-5 hardening: (a) continuous-ingest soak with crash injection
across the update -> read --version -> vacuum lifecycle; (b) two
pipelines executing CONCURRENTLY under Ray's DEFAULT per-operator
resource reservation (the engine normally disables it -- context.py --
so this pins that an embedding application which keeps the default still
gets correct results from both datasets)."""

from __future__ import annotations

import os

import pandas as pd
import pytest


def _mk(lo, hi, doc):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "subj": [f"s{i % 40}" for i in range(lo, hi)],
            "pred": ["p"] * (hi - lo),
            "obj": [f"o{i % 60}" for i in range(lo, hi)],
            "doc_id": [doc] * (hi - lo),
        }
    )
    return rd.from_pandas(df), df


def _read_all(out_dir: str) -> pd.DataFrame:
    frames = []
    for part in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, part, "data.parquet")
        if part.startswith("part=") and os.path.exists(p):
            frames.append(pd.read_parquet(p))
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


KW = dict(
    num_partitions=8,
    config_hash="cfgSoak",
    key="subj",
    dedup_keys=["subj", "pred", "obj"],
    dedup_order=["doc_id"],
)
COLS = ["subj", "pred", "obj", "doc_id"]


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df[COLS].sort_values(COLS).reset_index(drop=True)


def test_soak_ingest_loop_with_crash_injection(ray_session, tmp_path):
    """Four update waves over a partitioned store; wave 2's delta stage
    hard-kills a worker once (within-run retry), wave 3 loses its
    lineage append (simulated driver death after the merge) and is
    re-applied to completion.  After every wave: the store equals the
    one-shot build of everything so far, every PRIOR version is still
    exactly time-travel readable, and the lineage version counter is
    monotone.  Then vacuum drops old versions: reading them must RAISE
    (never partial data) while the latest stays exact."""
    import json

    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        update_partitioned,
        vacuum_store,
        write_partitioned,
    )

    out = str(tmp_path / "store")
    base_ds, base_df = _mk(0, 60, "d0")
    write_partitioned(base_ds, out, **KW)
    cumulative = [base_df]  # python-side replay of what each version holds

    def expected_at(version: int) -> pd.DataFrame:
        df = pd.concat(cumulative[: version + 1], ignore_index=True)
        # keep-first under dedup_order=doc_id: sort then drop_duplicates
        df = df.sort_values(["subj", "pred", "obj", "doc_id"], kind="stable")
        return _sorted(df.drop_duplicates(["subj", "pred", "obj"]))

    crash_flag = str(tmp_path / "crashed_once")

    def maybe_crash(b: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(crash_flag):
            open(crash_flag, "w").close()
            os._exit(1)
        return b

    waves = [(40, 100, "d1"), (80, 150, "d2"), (120, 200, "d3"), (10, 70, "d4")]
    for i, (lo, hi, doc) in enumerate(waves, start=1):
        delta_ds, delta_df = _mk(lo, hi, doc)
        if i == 2:
            # wave 2: a worker dies mid-delta; Ray's retry must leave the
            # merge exact (no duplicated or lost delta rows)
            delta_ds = delta_ds.repartition(4).map_batches(
                maybe_crash, batch_format="pandas"
            )
        update_partitioned(delta_ds, out, **KW)
        if i == 2:
            assert os.path.exists(crash_flag), "crash branch must have run"
        if i == 3:
            # simulated driver death AFTER the partition merges landed but
            # BEFORE the lineage append: erase the record, then re-apply
            # the SAME delta -- recovery must be idempotent
            lpath = os.path.join(out, "_lineage.json")
            lin = json.load(open(lpath))
            lin["updates"] = lin["updates"][:-1]
            json.dump(lin, open(lpath, "w"))
            delta_again, _ = _mk(lo, hi, doc)
            update_partitioned(delta_again, out, **KW)
        cumulative.append(delta_df)

        # invariant 1: live store == one-shot build of all data so far
        pd.testing.assert_frame_equal(_sorted(_read_all(out)), expected_at(i))
        # invariant 2: every prior version still time-travel exact
        for v in range(i + 1):
            got_v = _sorted(read_store_asof(out, version=v).to_pandas())
            pd.testing.assert_frame_equal(got_v, expected_at(v))
        # invariant 3: lineage counter monotone == wave number
        lin = json.load(open(os.path.join(out, "_lineage.json")))
        assert len(lin["updates"]) == i

    n_waves = len(waves)
    vacuum_store(out, keep_versions=1)
    # latest still exact...
    pd.testing.assert_frame_equal(
        _sorted(read_store_asof(out, version=n_waves).to_pandas()),
        expected_at(n_waves),
    )
    # ...and vacuumed versions RAISE instead of returning partial data
    for v in range(n_waves - 1):
        with pytest.raises(Exception):
            read_store_asof(out, version=v)


def test_concurrent_pipelines_under_default_reservation(ray_session, tmp_path):
    """Two datasets executed concurrently from two threads, with Ray's
    DEFAULT op_resource_reservation_enabled=True (the setting the
    reservation mechanism exists to protect): both must complete and
    both results must be exact.  Finding recorded in BASELINE.md round-5
    notes either way."""
    import threading

    import ray.data as rd
    from ray.data import DataContext

    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    ctx = DataContext.get_current()
    prev = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = True
    try:
        import numpy as np

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 40, 30_000).astype(np.int64),
                "v": rng.randint(0, 100, 30_000).astype(np.int64),
            }
        )
        want_agg = (
            df.groupby("k", as_index=False)
            .agg(s=("v", "sum"))
            .sort_values("k")
            .reset_index(drop=True)
        )

        results: dict = {}
        errors: list = []

        def run_agg():
            try:
                got = (
                    grouped_aggregate(
                        rd.from_pandas(df).repartition(8),
                        ["k"],
                        {"s": ("v", "sum")},
                    )
                    .to_pandas()
                    .sort_values("k")
                    .reset_index(drop=True)
                )
                results["agg"] = got
            except Exception as e:  # surfaced below
                errors.append(e)

        def run_map():
            try:
                ds = rd.range(50_000, override_num_blocks=8).map_batches(
                    lambda b: pd.DataFrame({"x": b["id"] * 2}),
                    batch_format="pandas",
                )
                results["map_sum"] = int(
                    ds.to_pandas()["x"].sum()
                )
            except Exception as e:
                errors.append(e)

        t1 = threading.Thread(target=run_agg)
        t2 = threading.Thread(target=run_map)
        t1.start(); t2.start()
        t1.join(timeout=300); t2.join(timeout=300)
        assert not t1.is_alive() and not t2.is_alive(), "concurrent run hung"
        assert not errors, errors
        pd.testing.assert_frame_equal(
            results["agg"].astype({"s": "int64"}), want_agg.astype({"s": "int64"})
        )
        assert results["map_sum"] == sum(range(50_000)) * 2
    finally:
        ctx.op_resource_reservation_enabled = prev
