"""Transitive closure: driver BFS fast path vs distributed path doubling."""

from __future__ import annotations

import pandas as pd
import pytest

EDGES = pd.DataFrame(
    {
        "a": ["a", "b", "c", "x", "y", "p", "q"],
        "b": ["b", "c", "d", "y", "x", "q", "p"],  # chain a->b->c->d, cycles x<->y p<->q
    }
)

WANT = {
    ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "d"),
    ("c", "d"),
    ("x", "y"), ("x", "x"), ("y", "x"), ("y", "y"),
    ("p", "q"), ("p", "p"), ("q", "p"), ("q", "q"),
}


@pytest.mark.parametrize("limit", [None, 0], ids=["driver-bfs", "distributed-doubling"])
def test_transitive_closure_paths_agree(ray_session, limit):
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import transitive_closure

    kw = {} if limit is None else {"small_edges_limit": limit}
    out = transitive_closure(rd.from_pandas(EDGES), **kw).to_pandas()
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert got == WANT


def test_cli_smoke(ray_session, sf_dir, tmp_path):
    """The __main__ CLI builds a store end-to-end inside this session."""
    from ontology_time_machine_ray.__main__ import main

    out = str(tmp_path / "store")
    assert main(["--sf-dir", sf_dir, "--out", out, "--no-canonical"]) == 0
    import os

    assert os.path.exists(os.path.join(out, "_lineage.json"))
