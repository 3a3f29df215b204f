"""Connected components: driver fast path vs distributed star rounds."""

from __future__ import annotations

import pandas as pd
import pytest


EDGES = pd.DataFrame(
    {
        "u": ["a", "b", "x", "h1", "h2", "h3", "q", "q"],
        "v": ["b", "c", "y", "hub", "hub", "hub", "r", "r"],  # dup edge too
    }
)

WANT = {
    "b": "a", "c": "a",          # chain a-b-c
    "y": "x",                     # pair
    "h2": "h1", "h3": "h1", "hub": "h1",  # star
    "r": "q",                     # pair with duplicate edge
}


@pytest.mark.parametrize("limit", [None, 0], ids=["driver-fast-path", "distributed-star"])
def test_connected_components_paths_agree(ray_session, limit):
    import ray.data as rd

    from ontology_time_machine_ray.stages.canonicalize import connected_components

    kw = {} if limit is None else {"small_graph_limit": limit}
    out = connected_components(rd.from_pandas(EDGES), **kw).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == WANT
