"""Iterative graph operators: transitive closure over dependency edges.

The reference ships a dormant dependency-manifest resolver
(``tests/dependency.ttl``; commented-out walk at proxy_logic.py:276-307,
J5).  Realized here as a distributed TRANSITIVE CLOSURE by path doubling:
each round joins the reach relation with itself (``bucketed_join`` -- one
shuffle), unions + dedups, and stops when the pair count is stable.  Path
doubling converges in O(log diameter) rounds; cycles terminate naturally
because the reach set is finite and monotone.
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd

from ontology_time_machine_ray.stages.groupagg import bucketed_join, grouped_apply

#: below this edge count the driver-side BFS fast path runs (same hybrid
#: sizing rationale as canonicalize.SMALL_GRAPH_LIMIT -- manifests are
#: vocabulary-scale).
SMALL_EDGES_LIMIT = int(os.environ.get("OTM_SMALL_EDGES_LIMIT", "100000"))


def _distinct_pairs(ds):
    return grouped_apply(ds, ["a", "b"], lambda g: g.drop_duplicates(["a", "b"]))


def _driver_closure(edges: pd.DataFrame) -> pd.DataFrame:
    adj: dict[str, set] = {}
    for a, b in zip(edges["a"], edges["b"]):
        adj.setdefault(a, set()).add(b)
    out_a, out_b = [], []
    for start in adj:
        seen: set = set()
        frontier = set(adj[start])
        while frontier:
            seen |= frontier
            nxt = set()
            for x in frontier:
                nxt |= adj.get(x, set())
            frontier = nxt - seen
        for x in sorted(seen):
            out_a.append(start)
            out_b.append(x)
    return pd.DataFrame({"a": out_a, "b": out_b})


def transitive_closure(edges_ds, max_rounds: int = 16, small_edges_limit: int | None = None):
    """Dataset[(a, b)] -> Dataset[(a, b)] = all pairs with a path a -> b.

    Pairs like (x, x) appear exactly when x lies on a cycle (same
    semantics as the recursive-SQL UNION closure).
    """
    if small_edges_limit is None:
        small_edges_limit = SMALL_EDGES_LIMIT
    reach = _distinct_pairs(edges_ds).materialize()
    if reach.count() <= small_edges_limit:
        return rd.from_pandas(_driver_closure(reach.to_pandas()))
    prev = -1
    for _ in range(max_rounds):
        n = reach.count()
        if n == prev:
            break
        prev = n
        right = reach.map_batches(
            lambda df: df.rename(columns={"a": "b", "b": "c"}), batch_format="pandas"
        )
        doubled = bucketed_join(reach, right, on=["b"], how="inner").map_batches(
            lambda df: pd.DataFrame({"a": df["a"], "b": df["c"]}), batch_format="pandas"
        )
        reach = _distinct_pairs(reach.union(doubled)).materialize()
    return reach


def dependency_closure(dependencies_path: str, edges_ds=None) -> pd.DataFrame:
    """(ontology_id, dep_id) transitive dependency pairs.

    ``edges_ds`` overrides the parquet source with any Dataset of
    (ontology_id, depends_on) rows -- e.g. the Turtle-manifest reader
    (sources.readers.read_dependency_ttl)."""
    src = edges_ds if edges_ds is not None else rd.read_parquet(dependencies_path)
    edges = src.map_batches(
        lambda df: df.rename(columns={"ontology_id": "a", "depends_on": "b"}),
        batch_format="pandas",
    )
    out = transitive_closure(edges).to_pandas()
    return (
        out.rename(columns={"a": "ontology_id", "b": "dep_id"})
        .sort_values(["ontology_id", "dep_id"])
        .reset_index(drop=True)
    )
