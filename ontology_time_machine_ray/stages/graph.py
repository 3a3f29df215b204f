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
        doubled = bucketed_join(
            reach,
            right,
            on=["b"],
            how="inner",
            left_schema={"a": "object", "b": "object"},
            right_schema={"b": "object", "c": "object"},
        ).map_batches(
            lambda df: pd.DataFrame({"a": df["a"], "b": df["c"]}), batch_format="pandas"
        )
        reach = _distinct_pairs(reach.union(doubled)).materialize()
    return reach


def _driver_closure_depth(edges: pd.DataFrame, max_rounds: int) -> pd.DataFrame:
    """BFS per start node with hop counting -- the vocabulary-scale fast
    path of closure_with_depth (min path length per reachable pair)."""
    adj: dict[str, set] = {}
    for a, b in zip(edges["a"], edges["b"]):
        adj.setdefault(a, set()).add(b)
    out_a, out_b, out_d = [], [], []
    for start in adj:
        seen: dict[str, int] = {}
        frontier = set(adj[start])
        depth = 1
        while frontier and depth <= max_rounds:
            for x in frontier:
                seen.setdefault(x, depth)
            nxt = set()
            for x in frontier:
                nxt |= adj.get(x, set())
            frontier = {x for x in nxt if x not in seen}
            depth += 1
        for x in sorted(seen):
            out_a.append(start)
            out_b.append(x)
            out_d.append(seen[x])
    return pd.DataFrame(
        {"a": out_a, "b": out_b, "depth": pd.Series(out_d, dtype="int64")}
    )


def closure_with_depth(
    edges_ds, max_rounds: int = 16, small_edges_limit: int | None = None
):
    """Dataset[(a, b)] -> Dataset[(a, b, depth)]: every pair with a path
    a -> b, annotated with the MINIMUM hop count (rdfs11-style transitive
    closure with provenance depth -- e.g. how far apart two classes sit
    in a subsumption hierarchy).

    Distributed shape: synchronous BFS by frontier expansion -- per round
    ONE bucketed join (frontier x edges, key-partitioned on the meeting
    column) plus ONE anti join against the reach set (new pairs only;
    BFS level order makes first-discovery == min depth).  Shuffle volume
    per round is the frontier, which shrinks as the reach saturates;
    nothing broadcasts and no driver graph state exists beyond the loop
    counter.  Cycles terminate naturally (a node already reached is never
    re-entered).  Unlike transitive_closure's path doubling (O(log D)
    rounds, no depths), BFS costs O(D) rounds but yields exact min
    depths; ontology class hierarchies are shallow, so D is small.

    Below ``small_edges_limit`` edges the whole computation collapses to
    one driver-side BFS (the hybrid sizing rationale of
    transitive_closure; the distributed path is pytest-forced with the
    limit at 0)."""
    if small_edges_limit is None:
        small_edges_limit = SMALL_EDGES_LIMIT
    edges = _distinct_pairs(edges_ds).materialize()
    if edges.count() <= small_edges_limit:
        return rd.from_pandas(_driver_closure_depth(edges.to_pandas(), max_rounds))

    reach = edges.map_batches(
        lambda df: df.assign(depth=pd.Series(1, index=df.index, dtype="int64")),
        batch_format="pandas",
    ).materialize()
    frontier = reach
    for depth in range(2, max_rounds + 1):
        ext = bucketed_join(
            frontier.map_batches(
                lambda df: pd.DataFrame({"a": df["a"], "m": df["b"]}),
                batch_format="pandas",
            ),
            edges.map_batches(
                lambda df: pd.DataFrame({"m": df["a"], "b": df["b"]}),
                batch_format="pandas",
            ),
            on=["m"],
            how="inner",
            left_schema={"a": "object", "m": "object"},
            right_schema={"m": "object", "b": "object"},
        ).map_batches(
            lambda df: df[["a", "b"]].drop_duplicates(), batch_format="pandas"
        )
        fresh = bucketed_join(
            _distinct_pairs(ext),
            reach.map_batches(lambda df: df[["a", "b"]], batch_format="pandas"),
            on=["a", "b"],
            how="anti",
            left_schema={"a": "object", "b": "object"},
            right_schema={"a": "object", "b": "object"},
        ).materialize()
        if fresh.count() == 0:
            break
        d = depth
        frontier = fresh.map_batches(
            lambda df, _d=d: df.assign(depth=pd.Series(_d, index=df.index, dtype="int64")),
            batch_format="pandas",
        ).materialize()
        reach = reach.union(frontier).materialize()
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


# --------------------------------------------------------------------- #
# Triangle counting + degree stats (ontology co-mention graph)           #
# --------------------------------------------------------------------- #
def pairwise_within(g: pd.DataFrame, keys: list, item: str) -> pd.DataFrame:
    """Fully vectorized unordered-pair expansion within each ``keys``
    group (no Python loop over groups -- the pattern behind co-mention
    edges and co-movement cells): dedup (keys, item), sort, compute each
    element's distance to its group-segment end, and build the (i, j)
    index arrays with repeat/cumsum; the sorted order makes a < b hold
    by construction.  Returns columns (a, b); caller dedups if group
    multiplicity matters."""
    import numpy as np

    # dtype-consistent empty frame: an object-dtype empty block next to
    # int64 pair blocks would promote the whole column on concat
    empty = pd.DataFrame({"a": g[item].iloc[:0], "b": g[item].iloc[:0]})
    d = g.drop_duplicates(keys + [item]).sort_values(keys + [item], kind="stable")
    n = len(d)
    if n == 0:
        return empty
    vals = d[item].to_numpy()
    same = np.ones(n - 1, dtype=bool) if n > 1 else np.array([], dtype=bool)
    for k in keys:
        col = d[k].to_numpy()
        same &= col[1:] == col[:-1]
    change = np.flatnonzero(~same) + 1
    seg_starts = np.concatenate(([0], change))
    seg_ends = np.concatenate((change, [n]))
    end_per_elem = np.repeat(seg_ends, seg_ends - seg_starts)
    pos = np.arange(n)
    runs = end_per_elem - pos - 1  # pairs each element opens
    total = int(runs.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(pos, runs)
    run_starts = np.concatenate(([0], np.cumsum(runs)[:-1]))
    j_idx = np.arange(total) - np.repeat(run_starts, runs) + i_idx + 1
    return pd.DataFrame({"a": vals[i_idx], "b": vals[j_idx]})


def cooccurrence_edges(mentions_ds) -> rd.Dataset:
    """Distinct undirected edges (a < b) between ontologies co-mentioned
    in the same document.  Per-doc pair expansion is bounded by the
    per-doc distinct-mention count (a handful); edge dedup is one grouped
    pass on the edge key."""
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    mo = mentions_ds.map_batches(
        lambda df: df.loc[df["ontology_id"].notna(), ["doc_id", "ontology_id"]]
        .drop_duplicates()  # per-batch combiner; the real dedup is per doc group
        .reset_index(drop=True),
        batch_format="pandas",
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        return pairwise_within(g, ["doc_id"], "ontology_id").drop_duplicates()

    e = grouped_apply(mo, ["doc_id"], pairs)
    return grouped_apply(e, ["a", "b"], lambda g: g.drop_duplicates(["a", "b"]))


#: below this edge count the triangle count runs as ONE driver-side
#: vectorized pass (same hybrid rationale as SMALL_GRAPH_LIMIT above:
#: co-mention graphs live at the ontology-vocabulary scale).  The
#: distributed path is exercised by pytest with the limit forced to 0.
SMALL_TRIANGLE_EDGES = 200_000


def _driver_triangles(e: pd.DataFrame) -> pd.DataFrame:
    """Vectorized pandas mirror of the distributed plan (id-ordered
    wedge closure; each triangle counted once as x<y<z)."""
    deg = (
        pd.concat([e["a"], e["b"]])
        .rename("node")
        .to_frame()
        .groupby("node", as_index=False)
        .agg(degree=("node", "size"))
    )
    # wedge x-(y=b)-z with x<y<z by construction (a<b on both edges),
    # closed by the (x, z) edge
    w = e.merge(e.rename(columns={"a": "b", "b": "z"}), on="b")
    tri = w.merge(e.rename(columns={"b": "z"}), on=["a", "z"])
    tn = (
        pd.concat([tri["a"], tri["b"], tri["z"]])
        .rename("node")
        .to_frame()
        .groupby("node", as_index=False)
        .agg(triangles=("node", "size"))
    )
    out = deg.merge(tn, on="node", how="left")
    out["triangles"] = out["triangles"].fillna(0).astype("int64")
    out["degree"] = out["degree"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def triangle_stats(edges_ds, small_edges_limit: int | None = None) -> rd.Dataset:
    """(node, degree, triangles) over an undirected edge set (a < b).

    Degree-oriented triangle counting (the standard distributed plan:
    Suri & Vassilvitskii 2011 "Counting Triangles and the Curse of the
    Last Reducer"): edges are oriented from the (degree, id)-smaller
    endpoint to the larger, so every node's out-degree is O(sqrt(m)) and
    the wedge expansion at hub nodes is bounded; a wedge (y, z) closes
    iff the oriented edge y->z exists (one bucketed join).  Each triangle
    is generated exactly once, so per-node counts need no dedup.

    Below ``small_edges_limit`` edges the whole computation collapses to
    one vectorized driver pass (the co-mention graph is vocabulary-scale)."""
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import (
        bucketed_join,
        grouped_aggregate,
        grouped_apply,
    )

    limit = SMALL_TRIANGLE_EDGES if small_edges_limit is None else small_edges_limit
    edges = edges_ds.materialize()  # reused three times below
    if edges.count() <= limit:
        return rd.from_pandas(_driver_triangles(edges.to_pandas()))

    deg = grouped_aggregate(
        edges.map_batches(
            lambda df: pd.DataFrame({"node": pd.concat([df["a"], df["b"]])})
            .groupby("node", as_index=False)
            .agg(d=("node", "size")),
            batch_format="pandas",
        ),
        ["node"],
        {"degree": ("d", "sum")},
    ).materialize()

    da = deg.map_batches(
        lambda df: df.rename(columns={"node": "a", "degree": "deg_a"}),
        batch_format="pandas",
    )
    db = deg.map_batches(
        lambda df: df.rename(columns={"node": "b", "degree": "deg_b"}),
        batch_format="pandas",
    )
    with_deg = bucketed_join(
        bucketed_join(
            edges,
            da,
            on=["a"],
            left_schema={"a": "object", "b": "object"},
            right_schema={"a": "object", "deg_a": "int64"},
        ),
        db,
        on=["b"],
        left_schema={"a": "object", "b": "object", "deg_a": "int64"},
        right_schema={"b": "object", "deg_b": "int64"},
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # rank = (degree, node id); orient low -> high
        a_first = (df["deg_a"] < df["deg_b"]) | (
            (df["deg_a"] == df["deg_b"]) & (df["a"] < df["b"])
        )
        return pd.DataFrame(
            {
                "src": np.where(a_first, df["a"], df["b"]),
                "dst": np.where(a_first, df["b"], df["a"]),
                "deg_dst": np.where(a_first, df["deg_b"], df["deg_a"]).astype("int64"),
            }
        )

    oriented = with_deg.map_batches(orient, batch_format="pandas").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for x, sub in g.groupby("src", sort=False):
            if len(sub) < 2:
                continue
            sub = sub.sort_values(["deg_dst", "dst"])
            nb = sub["dst"].to_numpy()
            ia, ib = np.triu_indices(len(nb), k=1)
            out.append(pd.DataFrame({"x": x, "src": nb[ia], "dst": nb[ib]}))
        if not out:
            return pd.DataFrame(
                {"x": pd.Series(dtype=object), "src": pd.Series(dtype=object),
                 "dst": pd.Series(dtype=object)}
            )
        return pd.concat(out, ignore_index=True)

    w = grouped_apply(oriented, ["src"], wedges)
    tri = bucketed_join(
        w,
        oriented.map_batches(lambda df: df[["src", "dst"]], batch_format="pandas"),
        on=["src", "dst"],
        how="semi",
        left_schema={"x": "object", "src": "object", "dst": "object"},
        right_schema={"src": "object", "dst": "object"},
    )

    tcount = grouped_aggregate(
        tri.map_batches(
            lambda df: pd.DataFrame(
                {"node": pd.concat([df["x"], df["src"], df["dst"]])}
            )
            .groupby("node", as_index=False)
            .agg(t=("node", "size")),
            batch_format="pandas",
        ),
        ["node"],
        {"triangles": ("t", "sum")},
    )

    out = bucketed_join(
        deg,
        tcount,
        on=["node"],
        how="left",
        left_schema={"node": "object", "degree": "int64"},
        right_schema={"node": "object", "triangles": "int64"},
    )

    return out.map_batches(
        lambda df: df.assign(
            triangles=df["triangles"].fillna(0).astype("int64"),
            degree=df["degree"].astype("int64"),
        ),
        batch_format="pandas",
    )


def label_propagation(edges_ds, rounds: int = 2) -> rd.Dataset:
    """Synchronous majority-vote label propagation (Raghavan et al. 2007)
    over distinct undirected edges (a < b): Dataset[(node, label)].

    Deterministic variant: every node starts labelled with its own id;
    each round it adopts the label most frequent among its NEIGHBOURS'
    current labels, ties broken by lexicographically smallest label
    (nodes here always have >= 1 neighbour -- they exist only as edge
    endpoints).  ``rounds`` is a CAP with changed-count convergence
    detection (the ``kcore`` fixpoint pattern): the synchronous update
    is a deterministic function of the current labelling, so a round
    that changes nothing is idempotent -- early exit equals running all
    ``rounds`` and the unrolled SQL oracle stays exact, it only saves
    shuffles.

    Scale shape: per round ONE bucketed join co-locates each neighbour's
    current label with the edge endpoint, then ONE node-bucketed pass
    counts votes and takes the argmax vectorized in-bucket.  Labels are
    checkpointed per round (vocabulary-scale, the BFS-frontier pattern);
    driver state is the loop counter.  Below ``SMALL_EDGES_LIMIT`` edges
    the same vote runs as a driver-side vectorized loop (the hybrid
    sizing rationale of transitive_closure/pagerank -- co-mention graphs
    live at the ontology-vocabulary scale; the distributed path is
    pytest-forced with the limit at 0).
    """
    from ontology_time_machine_ray.stages.groupagg import bucketed_join, grouped_apply

    und = edges_ds.map_batches(
        lambda df: pd.concat(
            [df[["a", "b"]], df.rename(columns={"a": "b", "b": "a"})[["a", "b"]]],
            ignore_index=True,
        ),
        batch_format="pandas",
    ).materialize()  # consumed twice per round (node set is implicit in it)

    if und.count() <= SMALL_EDGES_LIMIT:
        e = und.to_pandas()
        lab = pd.Series(
            {n: n for n in pd.unique(e["a"])}, dtype="object"
        )
        for _ in range(rounds):
            v = pd.DataFrame({"a": e["a"], "label": e["b"].map(lab)})
            c = v.groupby(["a", "label"], as_index=False).size()
            c = c.sort_values(
                ["a", "size", "label"], ascending=[True, False, True], kind="stable"
            ).drop_duplicates("a")
            new = pd.Series(c["label"].to_numpy(), index=c["a"].to_numpy())
            converged = new.reindex(lab.index).equals(lab)
            lab = new
            if converged:
                break
        return rd.from_pandas(
            pd.DataFrame({"node": lab.index, "label": lab.to_numpy()})
        )

    labels = grouped_apply(
        und.map_batches(
            lambda df: pd.DataFrame({"node": df["a"]}).drop_duplicates(),
            batch_format="pandas",
        ),
        ["node"],
        lambda g: g.drop_duplicates(),
    ).map_batches(
        lambda df: df.assign(label=df["node"]), batch_format="pandas"
    ).materialize()

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["a", "label"], as_index=False).size()
        c = c.sort_values(
            ["a", "size", "label"], ascending=[True, False, True], kind="stable"
        ).drop_duplicates("a")
        return pd.DataFrame({"node": c["a"], "label": c["label"]})

    for r in range(rounds):
        nb = bucketed_join(
            und,
            labels.map_batches(
                lambda df: df.rename(columns={"node": "b"}), batch_format="pandas"
            ),
            on=["b"],
            left_schema={"a": "object", "b": "object"},
            right_schema={"b": "object", "label": "object"},
        )
        new_labels = grouped_apply(
            nb.map_batches(lambda df: df[["a", "label"]], batch_format="pandas"),
            ["a"],
            vote,
        ).materialize()
        if r == rounds - 1 or r == 0:
            # last round: a probe could not save anything.  First round:
            # convergence is impossible (labels start as self-ids and a
            # node's vote comes only from its neighbours, so every new
            # label is some neighbour's id != the node's own) -- for the
            # common rounds=2 the probe therefore never runs at all.
            labels = new_labels
            continue
        # changed-count convergence probe: one node-bucketed join of the
        # two VOCABULARY-scale labellings, one tiny count per block to
        # the driver -- never the corpus
        diff = bucketed_join(
            new_labels,
            labels.map_batches(
                lambda df: df.rename(columns={"label": "prev"}),
                batch_format="pandas",
            ),
            on=["node"],
            left_schema={"node": "object", "label": "object"},
            right_schema={"node": "object", "prev": "object"},
        )
        changed = int(
            diff.map_batches(
                lambda df: pd.DataFrame(
                    {"n": [int((df["label"] != df["prev"]).sum())]}
                ),
                batch_format="pandas",
            )
            .to_pandas()["n"]
            .sum()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def kcore(edges_ds, k: int = 2, rounds: int = 3) -> rd.Dataset:
    """k-core decomposition by iterative peel (Seidman 1983): drop nodes
    with degree < k, remove their incident edges, repeat; after at most
    ``rounds`` rounds emit the surviving nodes with their in-core degree.

    Fixed ``rounds`` keeps the operator SQL-replayable (one unrolled
    level per round, the label_propagation precedent); peeling stops
    EARLY when a round removes nothing -- the peel is monotone, so a
    fixpoint at round r equals the round-R result and early exit never
    changes the output, it only saves shuffles.

    Scale shape: per round ONE node-bucketed degree aggregate plus two
    bucketed semi-joins (endpoint membership); the survivor set stays
    bucketed -- nothing broadcasts, per-round shuffle volume is the
    surviving edge set, strictly shrinking.  Below ``SMALL_EDGES_LIMIT``
    the peel runs as a driver-side vectorized loop (co-mention graphs
    are ontology-vocabulary scale; the distributed path is pytest-forced
    with the limit at 0).
    """
    from ontology_time_machine_ray.stages.groupagg import (
        bucketed_join,
        grouped_aggregate,
    )

    und = edges_ds.map_batches(
        lambda df: pd.concat(
            [df[["a", "b"]], df.rename(columns={"a": "b", "b": "a"})[["a", "b"]]],
            ignore_index=True,
        ),
        batch_format="pandas",
    ).materialize()

    if und.count() <= SMALL_EDGES_LIMIT:
        e = und.to_pandas()
        for _ in range(rounds):
            deg = e.groupby("a").size()
            keep = set(deg[deg >= k].index)
            if len(keep) == len(deg):
                break
            e = e[e["a"].isin(keep) & e["b"].isin(keep)]
            if e.empty:
                break
        deg = e.groupby("a").size()
        out = deg[deg >= k]
        return rd.from_pandas(
            pd.DataFrame(
                {"node": out.index.to_numpy(), "degree": out.to_numpy(dtype="int64")}
            )
        )

    n_nodes = None
    for _ in range(rounds):
        deg = grouped_aggregate(und, ["a"], {"degree": ("b", "size")})
        surv = deg.map_batches(
            lambda df: df.loc[df["degree"] >= k, ["a"]], batch_format="pandas"
        ).materialize()
        n_surv = surv.count()
        if n_nodes is not None and n_surv == n_nodes:
            break  # fixpoint: nothing peeled this round
        n_nodes = n_surv
        und = bucketed_join(
            bucketed_join(
                und,
                surv,
                on=["a"],
                how="semi",
                left_schema={"a": "object", "b": "object"},
                right_schema={"a": "object"},
            ),
            surv.map_batches(
                lambda df: df.rename(columns={"a": "b"}), batch_format="pandas"
            ),
            on=["b"],
            how="semi",
            left_schema={"a": "object", "b": "object"},
            right_schema={"b": "object"},
        ).materialize()  # checkpoint: the next round consumes it twice

    final = grouped_aggregate(und, ["a"], {"degree": ("b", "size")})
    return final.map_batches(
        lambda df: pd.DataFrame(
            {
                "node": df.loc[df["degree"] >= k, "a"],
                "degree": df.loc[df["degree"] >= k, "degree"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def bfs_from_seeds(
    edges_ds,
    seeds,
    max_rounds: int = 16,
    small_edges_limit: int | None = None,
) -> rd.Dataset:
    """Multi-source seeded BFS: Dataset[(node, depth)] -- the minimum
    hop count from ANY seed along directed edges, seeds at depth 0 (the
    "neighborhood of these entities" traversal a KG consumer runs after
    a lookup).  Unlike ``closure_with_depth`` (all-pairs) the work is
    proportional to the REACHABLE region only: per round ONE bucketed
    join (frontier x edges on the meeting column) + ONE anti join
    against the visited set; shuffle volume is the frontier, which
    shrinks as the region saturates, and the loop exits early at the
    fixpoint (empty frontier).  The seed set is query-literal -- driver
    -small by definition -- and the only driver state is the loop
    counter + the per-round empty check.  Below ``small_edges_limit``
    the whole traversal is one driver BFS (the hybrid sizing rationale
    of transitive_closure; the distributed path is pytest-forced with
    the limit at 0)."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join

    seeds = sorted(set(seeds))
    if not seeds:
        raise ValueError("bfs_from_seeds needs >= 1 seed")
    if small_edges_limit is None:
        small_edges_limit = SMALL_EDGES_LIMIT
    edges = _distinct_pairs(edges_ds).materialize()
    if edges.count() <= small_edges_limit:
        df = edges.to_pandas()
        adj: dict[str, set] = {}
        for a, b in zip(df["a"], df["b"]):
            adj.setdefault(a, set()).add(b)
        dist = {s: 0 for s in seeds}
        frontier = list(seeds)
        for depth in range(1, max_rounds + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = depth
                        nxt.append(v)
            if not nxt:
                break
            frontier = nxt
        out = pd.DataFrame(
            {"node": list(dist), "depth": pd.Series(list(dist.values()), dtype="int64")}
        )
        return rd.from_pandas(out.sort_values("node").reset_index(drop=True))

    visited = rd.from_pandas(
        pd.DataFrame({"node": seeds, "depth": pd.Series(0, index=range(len(seeds)), dtype="int64")})
    ).materialize()
    frontier = visited
    for depth in range(1, max_rounds + 1):
        ext = bucketed_join(
            frontier.map_batches(
                lambda df: pd.DataFrame({"m": df["node"]}), batch_format="pandas"
            ),
            edges.map_batches(
                lambda df: pd.DataFrame({"m": df["a"], "node": df["b"]}),
                batch_format="pandas",
            ),
            on=["m"],
            left_schema={"m": "object"},
            right_schema={"m": "object", "node": "object"},
        ).map_batches(
            lambda df: df[["node"]].drop_duplicates(), batch_format="pandas"
        )
        new = bucketed_join(
            grouped_apply(ext, ["node"], lambda g: g.drop_duplicates()),
            visited.map_batches(lambda df: df[["node"]], batch_format="pandas"),
            on=["node"],
            how="anti",
            left_schema={"node": "object"},
            right_schema={"node": "object"},
        ).map_batches(
            lambda df, depth=depth: df.assign(
                depth=pd.Series(depth, index=df.index, dtype="int64")
            ),
            batch_format="pandas",
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited


def _walk_adjacency(edges: pd.DataFrame) -> pd.DataFrame:
    """Indexed adjacency (a, idx, b, deg): neighbors sorted, idx their
    rank -- the lookup table a deterministic walk addresses."""
    d = edges.drop_duplicates(["a", "b"]).sort_values(["a", "b"], kind="stable")
    d = d.assign(
        idx=d.groupby("a").cumcount().astype("int64"),
        deg=d.groupby("a")["b"].transform("size").astype("int64"),
    )
    return d[["a", "idx", "b", "deg"]]


def _walk_choice(walk_id: pd.Series, step: int, node: pd.Series,
                 deg: pd.Series, seed: str):
    """Deterministic neighbor index: md5_64(seed:walk:step:node) % deg --
    the md5-replay idiom (bit-identical to the SQL oracle's UBIGINT
    cast), vectorized through the per-process DuckDB digest."""
    import numpy as np

    from ontology_time_machine_ray.functions.hashing import md5_hash64_series

    key = seed + ":" + walk_id.astype(str) + ":" + str(step) + ":" + node.astype(str)
    h = md5_hash64_series(key)
    return (h % deg.to_numpy().astype(np.uint64)).astype("int64")


def random_walks(
    edges_ds,
    walks_per_node: int = 2,
    length: int = 4,
    seed: str = "w",
    small_edges_limit: int | None = None,
) -> rd.Dataset:
    """Deterministic random-walk corpus over directed edges -- the
    DeepWalk/node2vec graph-ML data-prep step, rerun/partitioning-
    invariant by construction: from every node with out-edges,
    ``walks_per_node`` walks of up to ``length`` hops; the hop taken at
    step s of walk w from node u is neighbor ``md5_64(f"{seed}:{w}:{s}:
    {u}") % deg(u)`` of u's lexicographically sorted neighbor list (a
    pure row function -- no RNG state, so the corpus is identical under
    any partitioning and replayable as an unrolled SQL oracle).  Walks
    stop early at sink nodes.  Output: (walk_id, step, node) rows --
    step 0 is the start -- ready for skip-gram windowing.

    Distributed shape: the adjacency (a, idx, b, deg) pins once (one
    node-bucketed rank pass); each step is ONE bucketed join of the
    walk frontier against it on (node, idx) -- the frontier computes
    its own idx vectorized BEFORE the join, so fan-out per state is 1,
    never degree.  Shuffle volume per step = the live frontier; the
    driver holds the loop counter.  Below ``small_edges_limit`` the
    walk runs as a driver loop over the same vectorized helpers."""
    import numpy as np  # noqa: F811 -- local for the worker closures

    if walks_per_node < 1 or length < 1:
        raise ValueError("walks_per_node and length must be >= 1")
    edges = _distinct_pairs(edges_ds).materialize()
    if small_edges_limit is None:
        small_edges_limit = SMALL_EDGES_LIMIT

    if edges.count() <= small_edges_limit:
        adj = _walk_adjacency(edges.to_pandas())
        nbr = adj.set_index(["a", "idx"])["b"]
        deg = adj.drop_duplicates("a").set_index("a")["deg"]
        starts = sorted(adj["a"].unique())
        frames = []
        state = pd.DataFrame(
            {
                "walk_id": [f"{n}:{w}" for n in starts for w in range(walks_per_node)],
                "node": [n for n in starts for _ in range(walks_per_node)],
            }
        )
        frames.append(state.assign(step=np.int64(0)))
        for s in range(1, length + 1):
            d = deg.reindex(state["node"]).to_numpy()
            alive = ~pd.isna(d)
            state = state[alive]
            if not len(state):
                break
            dv = pd.Series(d[alive], index=state.index, dtype="int64")
            idx = _walk_choice(state["walk_id"], s, state["node"], dv, seed)
            nxt = nbr.reindex(
                pd.MultiIndex.from_arrays([state["node"].to_numpy(), idx])
            ).to_numpy()
            state = pd.DataFrame(
                {"walk_id": state["walk_id"].to_numpy(), "node": nxt}
            )
            frames.append(state.assign(step=np.int64(s)))
        out = pd.concat(frames, ignore_index=True)[["walk_id", "step", "node"]]
        return rd.from_pandas(
            out.sort_values(["walk_id", "step"], kind="stable").reset_index(drop=True)
        )

    adj = grouped_apply(
        edges, ["a"], lambda g: _walk_adjacency(g)
    ).materialize()
    # ONE node-bucketed distinct makes the degree table safe against
    # block splitting (Ray splits a map_groups output block past
    # target_max_block_size, which could cut a node's adjacency across
    # batches -- a per-batch dedup would then emit duplicate deg rows
    # and every frontier join through them would fan out); the start
    # set reuses the same globally-distinct rows, so no extra exchange
    deg_tbl = grouped_apply(
        adj.map_batches(
            lambda df: df.drop_duplicates("a")[["a", "deg"]].rename(
                columns={"a": "node"}
            ),
            batch_format="pandas",
        ),
        ["node"],
        lambda g: g.drop_duplicates("node"),
    ).materialize()

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        reps = pd.concat(
            [df.assign(_w=w) for w in range(walks_per_node)], ignore_index=True
        )
        return pd.DataFrame(
            {
                "walk_id": reps["node"].astype(str) + ":" + reps["_w"].astype(str),
                "node": reps["node"],
            }
        )

    state = deg_tbl.map_batches(expand, batch_format="pandas").materialize()
    outputs = [
        state.map_batches(
            lambda df: df.assign(step=pd.Series(0, index=df.index, dtype="int64")),
            batch_format="pandas",
        )
    ]
    st_schema = {"walk_id": "object", "node": "object"}
    for s in range(1, length + 1):
        with_deg = bucketed_join(
            state,
            deg_tbl,
            on=["node"],
            left_schema=st_schema,
            right_schema={"node": "object", "deg": "int64"},
        )

        def pick(df: pd.DataFrame, s=s) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {"walk_id": pd.Series(dtype=object),
                     "node": pd.Series(dtype=object),
                     "idx": pd.Series(dtype="int64")}
                )
            idx = _walk_choice(df["walk_id"], s, df["node"], df["deg"], seed)
            return pd.DataFrame(
                {"walk_id": df["walk_id"], "node": df["node"], "idx": idx}
            )

        chosen = with_deg.map_batches(pick, batch_format="pandas")
        state = bucketed_join(
            chosen,
            adj.map_batches(
                lambda df: df[["a", "idx", "b"]].rename(columns={"a": "node"}),
                batch_format="pandas",
            ),
            on=["node", "idx"],
            left_schema={"walk_id": "object", "node": "object", "idx": "int64"},
            right_schema={"node": "object", "idx": "int64", "b": "object"},
        ).map_batches(
            lambda df: pd.DataFrame({"walk_id": df["walk_id"], "node": df["b"]}),
            batch_format="pandas",
        ).materialize()
        if state.count() == 0:
            break
        outputs.append(
            state.map_batches(
                lambda df, s=s: df.assign(
                    step=pd.Series(s, index=df.index, dtype="int64")
                ),
                batch_format="pandas",
            )
        )
    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out.map_batches(
        lambda df: df[["walk_id", "step", "node"]], batch_format="pandas"
    )


def walk_skipgrams(walks_ds, window: int = 2) -> rd.Dataset:
    """Skip-gram co-occurrence counts over a walk corpus -- the actual
    training input a node-embedding run consumes: for every walk, all
    (center, context) position pairs within ``window`` hops (excluding
    self-position), aggregated to (center, context, n_pairs).

    Shape: walks are SHORT by construction (<= length+1 rows), so the
    within-walk pair expansion is a bounded self-merge inside ONE
    walk-bucketed pass; the only other exchange is the (center, context)
    count -- two shuffles end to end, nothing quadratic in the corpus."""
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    if window < 1:
        raise ValueError("window must be >= 1")

    def grams(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["walk_id", "step", "node"]].merge(
            g[["walk_id", "step", "node"]].rename(
                columns={"step": "cstep", "node": "context"}
            ),
            on="walk_id",
        )
        d = (m["cstep"] - m["step"]).abs()
        m = m[(d > 0) & (d <= window)]
        return pd.DataFrame({"center": m["node"], "context": m["context"]})

    pairs = grouped_apply(walks_ds, ["walk_id"], grams)
    return grouped_aggregate(
        pairs.map_batches(
            lambda df: df.groupby(["center", "context"], as_index=False).agg(
                n=("center", "size")
            ),
            batch_format="pandas",
        ),
        ["center", "context"],
        {"n_pairs": ("n", "sum")},
    )


def walk_negative_samples(
    walks_ds, window: int = 2, k: int = 3, seed: str = "neg1"
) -> rd.Dataset:
    """Deterministic negative sampling over the skip-gram pairs -- the
    other half of a word2vec-style node-embedding training input
    (Mikolov et al. 2013): for every distinct (center, context) pair,
    ``k`` negatives drawn uniformly from the walk-corpus vocabulary by
    md5 of ``'{seed}:{center}:{context}:{j}'`` mod |V|.  A negative can
    coincidentally equal the true context (trainers mask that case);
    NOT re-drawing keeps the draw a pure function both engines replay.

    Shape: the vocabulary is graph-node scale and broadcasts once
    (``ray.put``); sampling is one shuffle-free pass over the pair
    table (k-fold repeat + one batched md5 + one vectorized gather)."""
    import numpy as np
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.functions.hashing import md5_hash64_series

    if k < 1:
        raise ValueError("k must be >= 1")
    pairs = walk_skipgrams(walks_ds, window=window)
    # vocabulary: sorted distinct nodes of the walk corpus (node scale,
    # the engine-wide broadcast bound -- same discipline as centroids)
    vocab = np.array(
        sorted(
            pd.unique(walks_ds.select_columns(["node"]).to_pandas()["node"])
        ),
        dtype=object,
    )
    v_ref = ray.put(vocab)

    def negs(df: pd.DataFrame) -> pd.DataFrame:
        v = cached_get(v_ref)
        big_v = np.uint64(len(v))
        out = pd.DataFrame(
            {
                "center": np.repeat(df["center"].to_numpy(), k),
                "context": np.repeat(df["context"].to_numpy(), k),
                "sample_idx": np.tile(
                    np.arange(k, dtype=np.int64), len(df)
                ),
            }
        )
        key = (
            f"{seed}:"
            + out["center"].astype(str)
            + ":"
            + out["context"].astype(str)
            + ":"
            + out["sample_idx"].astype(str)
        )
        h = md5_hash64_series(key)
        out["negative"] = v[(h % big_v).astype(np.int64)]
        return out

    return pairs.map_batches(negs, batch_format="pandas")
