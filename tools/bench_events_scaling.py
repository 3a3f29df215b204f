"""Secondary scaling evidence: the event-stream operator family (as-of
join, range join, sessionization) at two parallelism levels on a 20M-row
stream -- shows the N-vs-4N behavior generalizes beyond the headline
kg_build.  Usage::

    PYTHONPATH=/root/repo python tools/bench_events_scaling.py            # both levels
    PYTHONPATH=/root/repo python tools/bench_events_scaling.py --one 8    # child mode

Prints one JSON line; numbers go to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SRC = os.environ.get("OTM_EVENTS_SRC", "/root/testdata/sf0.1/events.parquet")
BIG_DIR = "/tmp/otm_events_big"
REPLICAS = int(os.environ.get("OTM_EVENTS_REPLICAS", "200"))
CPUS = tuple(int(x) for x in os.environ.get("OTM_SCALING_CPUS", "8,32").split(","))


def ensure_big() -> str:
    """Deterministic 20M-row stream: the sf0.1 events table replicated with
    a user_id offset per replica (each replica keeps its users' exact
    per-user event sequences, so join/session semantics are realistic)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(BIG_DIR, "_SUCCESS")
    st = os.stat(SRC)
    # source identity (size + mtime_ns) in the tag, like build_ivf_index:
    # a regenerated fixture or a REPLICAS change can never serve stale data
    tag = f"{SRC}:{st.st_size}:{st.st_mtime_ns}:{REPLICAS}"
    if os.path.exists(marker) and open(marker).read() == tag:
        return BIG_DIR
    shutil.rmtree(BIG_DIR, ignore_errors=True)  # no stale part files survive
    os.makedirs(BIG_DIR, exist_ok=True)
    t = pq.read_table(SRC, columns=["event_id", "ts", "user_id", "event_type"])
    n_users = 1 + int(pa.compute.max(t["user_id"]).as_py())
    n_events = len(t)
    per_file = max(1, REPLICAS // 16)
    import numpy as np

    uid = t["user_id"].to_numpy()
    eid = t["event_id"].to_numpy()
    fidx = 0
    for start in range(0, REPLICAS, per_file):
        reps = []
        for r in range(start, min(start + per_file, REPLICAS)):
            reps.append(
                pa.table(
                    {
                        "event_id": pa.array(eid + r * n_events),
                        "ts": t["ts"],
                        "user_id": pa.array(uid + r * n_users),
                        "event_type": t["event_type"],
                    }
                )
            )
        pq.write_table(pa.concat_tables(reps), os.path.join(BIG_DIR, f"part-{fidx:03d}.parquet"))
        fidx += 1
    with open(marker, "w") as f:
        f.write(tag)
    return BIG_DIR


def run_one(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ontology_time_machine_ray.context import tune_data_context

    tune_data_context()
    import ray.data as rd

    from ontology_time_machine_ray.pipelines import relational

    paths = sorted(
        os.path.join(BIG_DIR, f) for f in os.listdir(BIG_DIR) if f.endswith(".parquet")
    )
    out: dict = {"num_cpus": ncpu}
    ds = rd.read_parquet(paths)
    # warm the worker pool + page cache untimed
    ds.map_batches(lambda t: t, batch_format="pyarrow").count()
    for name, fn in (
        ("range_join", relational.events_range_join),
        ("asof_join", relational.events_asof_join),
        ("sessions", relational.events_sessions),
    ):
        best = None
        for _ in range(2):  # min-of-2 steady state, like bench.py
            ev = rd.read_parquet(paths)
            if name == "sessions":
                ev = ev.select_columns(["event_id", "user_id", "ts"])
            t0 = time.time()
            n = fn("unused", events_ds=ev).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            out[f"{name}_rows"] = n
        out[name] = round(best, 2)
    ray.shutdown()
    return out



def main() -> None:
    ensure_big()
    if "--one" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--one") + 1])
        print(json.dumps(run_one(ncpu)))
        return
    results = {}
    for ncpu in CPUS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(ncpu)],
            capture_output=True, text=True, check=True,
            env=dict(os.environ, PYTHONPATH="/root/repo"),
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    lo, hi = CPUS
    summary = {
        "metric": "events_scaling",
        "replicas": REPLICAS,
        "cpus": list(CPUS),
        "levels": results,
    }
    for name in ("range_join", "asof_join", "sessions"):
        eff = (results[lo][name] / results[hi][name]) / (hi / lo)
        summary[f"{name}_efficiency"] = round(eff, 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
