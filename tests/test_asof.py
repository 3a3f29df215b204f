"""As-of join: distributed result vs an exhaustive per-row oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _brute_asof(df: pd.DataFrame) -> set[tuple]:
    """O(n^2) reference: for each purchase, the same user's click with the
    max (ts, event_id) among clicks with ts <= purchase ts."""
    out = set()
    p = df[df["event_type"] == "purchase"]
    c = df[df["event_type"] == "click"]
    for _, row in p.iterrows():
        cand = c[(c["user_id"] == row["user_id"]) & (c["ts"] <= row["ts"])]
        if len(cand) == 0:
            continue
        win = cand.sort_values(["ts", "event_id"]).iloc[-1]
        out.add((int(row["event_id"]), int(win["event_id"])))
    return out


def test_events_range_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from ontology_time_machine_ray.pipelines.relational import events_range_join

    rng = np.random.RandomState(5)
    n = 800
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 10, n).astype(np.int64),
            # dense seconds around grain boundaries: many events share the
            # 5-min grain edge, exercising the two-grain probe + the exact
            # half-open (ts-5m, ts] predicate incl. boundary equality
            "ts": base + pd.to_timedelta(rng.randint(0, 1200, n), unit="s"),
            "event_type": rng.choice(["error", "click", "view"], n),
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = events_range_join("unused", events_ds=rd.from_pandas(df)).to_pandas()

    errs = df[df["event_type"] == "error"]
    clicks = df[df["event_type"] == "click"]
    want = {}
    for _, e in errs.iterrows():
        m = clicks[
            (clicks["user_id"] == e["user_id"])
            & (clicks["ts"] > e["ts"] - pd.Timedelta(minutes=5))
            & (clicks["ts"] <= e["ts"])
        ]
        want[int(e["event_id"])] = len(m)
    have = dict(zip(got["error_event_id"].astype(int), got["n_recent_clicks"].astype(int)))
    assert have == want


def test_events_asof_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from ontology_time_machine_ray.pipelines.relational import events_asof_join

    rng = np.random.RandomState(3)
    n = 600
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 12, n).astype(np.int64),
            # coarse second resolution FORCES ts ties, exercising the
            # (ts, event_id) tie-break on both sides
            "ts": base + pd.to_timedelta(rng.randint(0, 300, n), unit="s"),
            "event_type": rng.choice(["purchase", "click", "view"], n),
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = events_asof_join("unused", events_ds=rd.from_pandas(df)).to_pandas()
    pairs = {
        (int(a), int(b))
        for a, b in zip(got["purchase_event_id"], got["click_event_id"])
    }
    assert pairs == _brute_asof(df)
    # carried timestamps are the joined rows' own timestamps
    ts_by_id = dict(zip(df["event_id"], df["ts"]))
    for _, r in got.iterrows():
        assert r["purchase_ts"] == ts_by_id[r["purchase_event_id"]]
        assert r["click_ts"] == ts_by_id[r["click_event_id"]]
