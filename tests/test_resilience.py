"""Fault tolerance: a worker process dying mid-stage must not kill the
pipeline -- Ray reschedules the lost task and the result is exact.  (The
cross-RUN resume story is tested separately in test_writers_resume.py;
this pins the within-run retry the 100-TB design leans on.)"""

from __future__ import annotations

import os


def test_pipeline_survives_worker_crash(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    flag = str(tmp_path / "crashed_once")

    def maybe_crash(df: pd.DataFrame) -> pd.DataFrame:
        # the first task to run hard-kills its worker process (a system
        # failure, like an OOM-killed executor); the shared flag file makes
        # every retry and every later task succeed
        if not os.path.exists(flag):
            open(flag, "w").close()
            os._exit(1)
        return df

    ds = rd.range(10_000, override_num_blocks=8).map_batches(
        maybe_crash, batch_format="pandas"
    )
    assert ds.count() == 10_000
    assert os.path.exists(flag), "the crash branch must actually have run"


def test_groupagg_exact_after_crash(ray_session, tmp_path):
    """The bucketed shuffle's result is bit-identical when an upstream
    task was retried (no duplicated or lost partials)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    flag = str(tmp_path / "crashed_once")
    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 50, 20_000).astype(np.int64),
            "v": rng.randint(0, 100, 20_000).astype(np.int64),
        }
    )

    def maybe_crash(b: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(flag):
            open(flag, "w").close()
            os._exit(1)
        return b

    ds = rd.from_pandas(df).repartition(8).map_batches(
        maybe_crash, batch_format="pandas"
    )
    got = (
        grouped_aggregate(ds, ["k"], {"s": ("v", "sum"), "n": ("v", "size")})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"s": "int64", "n": "int64"}), want.astype({"s": "int64", "n": "int64"})
    )
