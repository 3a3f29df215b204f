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


#: fixed-point scale for PageRank: ranks are int64 nano-units, so every
#: platform (numpy, pandas, DuckDB SQL) computes bit-identical values and
#: the driver's exact-equality oracle can check the iteration.
PR_NANO = 1_000_000_000
#: damping 0.85 as an exact integer fraction (85 / 100)
PR_D_NUM, PR_D_DEN = 85, 100


def _driver_pagerank(edges: pd.DataFrame, iters: int) -> pd.DataFrame:
    import numpy as np

    names = sorted(set(edges["src"]) | set(edges["dst"]))
    pos = {v: i for i, v in enumerate(names)}
    si = edges["src"].map(pos).to_numpy()
    di = edges["dst"].map(pos).to_numpy()
    deg = np.bincount(si, minlength=len(names)).astype(np.int64)
    r = np.full(len(names), PR_NANO, dtype=np.int64)
    base = (PR_D_DEN - PR_D_NUM) * PR_NANO // PR_D_DEN
    for _ in range(iters):
        share = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        sums = np.zeros(len(names), dtype=np.int64)
        np.add.at(sums, di, share[si])
        r = base + (PR_D_NUM * sums) // PR_D_DEN
    return pd.DataFrame({"node": names, "rank_nanos": r})


def pagerank(edges_ds, iters: int = 5) -> rd.Dataset:
    """Distributed PageRank over Dataset[(src, dst)] edges.

    The honest multi-node shape: out-degrees and the edge table (with the
    source degree attached) are computed ONCE and pinned; each iteration
    is one bucketed hash join (ranks onto edges by src), one dst-bucketed
    sum, and one left join back onto the node set -- all key-partitioned,
    no driver-side graph state.  Convention: rank(v) = (1 - d) +
    d * sum_{u->v} rank(u) / outdeg(u); dangling mass is dropped.
    Parallel edges contribute once (the edge set is dedup'd), ranks
    start at 1.

    Arithmetic is FIXED-POINT int64 (``rank_nanos`` = rank * 1e9, floor
    division everywhere, damping as the exact fraction 85/100) so the
    distributed path, the driver fast path, the pytest numpy reference
    and the unrolled DuckDB oracle all produce bit-identical values --
    this is what lets an "iterative, not SQL-expressible" float algorithm
    have a full exact-hash SQL oracle.  Overflow headroom: total mass is
    ~n * 1e9, so 85 * sum stays inside int64 up to ~10^8 nodes; beyond
    that the scale constant must shrink (documented, not silent).
    """
    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
        grouped_head1,
    )

    edges = grouped_apply(
        edges_ds, ["src", "dst"], lambda g: g.drop_duplicates(["src", "dst"])
    ).materialize()  # pinned: re-read every iteration
    if edges.count() <= SMALL_EDGES_LIMIT:
        # driver fast path (same hybrid sizing as transitive_closure):
        # identical convention, vectorized groupby instead of 5 x 2
        # distributed shuffles for a vocabulary-scale graph
        return rd.from_pandas(_driver_pagerank(edges.to_pandas(), iters))
    deg = grouped_aggregate(
        edges.map_batches(
            lambda df: df.groupby("src", as_index=False).agg(deg=("dst", "size")),
            batch_format="pandas",
        ),
        ["src"],
        {"deg": ("deg", "sum")},
    )
    # edge table with source out-degree attached, computed once
    e2 = bucketed_join(edges, deg, on=["src"], how="inner").materialize()

    both = edges.map_batches(
        lambda df: pd.DataFrame({"node": pd.concat([df["src"], df["dst"]])}),
        batch_format="pandas",
    )
    nodes = grouped_head1(both, keys=["node"], order_by=["node"]).materialize()
    ranks = nodes.map_batches(
        lambda df: df.assign(rank_nanos=PR_NANO), batch_format="pandas"
    ).materialize()
    base = (PR_D_DEN - PR_D_NUM) * PR_NANO // PR_D_DEN

    for _ in range(iters):
        r_src = ranks.map_batches(
            lambda df: pd.DataFrame({"src": df["node"], "r": df["rank_nanos"]}),
            batch_format="pandas",
        )
        contrib = bucketed_join(e2, r_src, on=["src"], how="inner").map_batches(
            lambda df: pd.DataFrame(
                {"dst": df["dst"], "share": df["r"] // df["deg"]}
            ),
            batch_format="pandas",
        )
        sums = grouped_aggregate(contrib, ["dst"], {"s": ("share", "sum")}).map_batches(
            lambda df: pd.DataFrame({"node": df["dst"], "s": df["s"]}),
            batch_format="pandas",
        )
        # dangling-in nodes (no in-edges) get s = 0 via an ANTI join +
        # union rather than a left join: a pandas left join floats the
        # int64 sum column to carry NaN, silently rounding sums above
        # 2^53 -- the anti/union path keeps every value int64 end-to-end,
        # preserving the documented ~1e8-node exactness headroom
        no_in = bucketed_join(nodes, sums, on=["node"], how="anti").map_batches(
            lambda df: pd.DataFrame({"node": df["node"]}).assign(s=0),
            batch_format="pandas",
        )
        ranks = (
            sums.union(no_in)
            .map_batches(
                lambda df: pd.DataFrame(
                    {
                        "node": df["node"],
                        "rank_nanos": base
                        + (PR_D_NUM * df["s"].astype("int64")) // PR_D_DEN,
                    }
                ),
                batch_format="pandas",
            )
            .materialize()  # iteration barrier: PageRank is inherently synchronous
        )
    return ranks


def dependency_pagerank(dependencies_path: str, iters: int = 5) -> pd.DataFrame:
    """PageRank over the dependency manifest.  Fixed-point int64 output
    (``rank_nanos``) -- exactly reproducible by the unrolled SQL oracle."""
    edges = rd.read_parquet(dependencies_path).map_batches(
        lambda df: pd.DataFrame(
            {"src": df["ontology_id"], "dst": df["depends_on"]}
        ),
        batch_format="pandas",
    )
    out = pagerank(edges, iters=iters).to_pandas()
    out["rank_nanos"] = out["rank_nanos"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)
