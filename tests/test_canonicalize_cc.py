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


def test_nonconvergence_raises(ray_session):
    """A partially-contracted mapping must never be emitted silently:
    an impossible round budget raises instead."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.canonicalize import connected_components

    # long path graph so one star round cannot finish
    edges = pd.DataFrame(
        {"u": [f"n{i:03d}" for i in range(40)],
         "v": [f"n{i + 1:03d}" for i in range(40)]}
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_pandas(edges), max_rounds=1, small_graph_limit=0)


def test_partitioned_rewrite_matches_broadcast(ray_session):
    """Forcing broadcast_limit=0 must route through the bucketed-join
    fallback and produce the identical canonical triple set."""
    import ray.data as rd

    from ontology_time_machine_ray.schema import OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.canonicalize import canonicalize_triples

    triples = pd.DataFrame(
        {
            "subj": ["a", "b", "x", "c", "b"],
            "pred": [OWL_SAME_AS, OWL_SAME_AS, RDF_TYPE, RDF_TYPE, RDF_TYPE],
            "obj": ["b", "c", "a", "Klass", "Klass"],
            "doc_id": ["d1", "d2", "d3", "d4", "d5"],
            "ontology_version": ["v1"] * 5,
            "format": ["ttl"] * 5,
        }
    )

    def run(**kw):
        out = canonicalize_triples(rd.from_pandas(triples), **kw).to_pandas()
        return set(map(tuple, out[["subj", "pred", "obj"]].itertuples(index=False)))

    assert run(broadcast_limit=0) == run()
