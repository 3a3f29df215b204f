"""Canonicalization: distributed union-find over owl:sameAs edges.

Connected components via the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SOCC'14
-- public literature): pure ``groupby + vectorized per-bucket transform``
rounds over the edge list, no driver-side graph, no per-round join.  The
per-center min/emit logic is vectorized with pandas ``groupby.transform``
inside hash buckets (see ``groupagg`` for why bucketed-vectorized beats
per-group accumulation).

Hybrid sizing: equivalence graphs are VOCABULARY-scale (entities that
appear in sameAs/equivalence assertions), not corpus-scale.  Below
``SMALL_GRAPH_LIMIT`` edges the rounds' fixed costs dwarf the work, so a
driver-side union-find computes the identical mapping; above it the
distributed star rounds run.  Both paths are tested against each other.

Skew handling (hub entities like the fixture's ``O000#C1`` star): the
final node -> component aggregation runs as an explicit SALTED two-phase
min -- ``groupby((node, salt)).min`` then ``groupby(node).min`` -- so a
hub whose edges all land on one reducer is first reduced in ``skew_salt``
parallel shards (SURVEY.md §4.2's mandatory hub-salting).

The final mapping is the SMALL side, so the triple rewrite is a broadcast
lookup inside ``map_batches`` (``ray.put`` once, read per actor) rather
than two corpus-wide shuffle joins; that assumption is asserted at
runtime (``MAX_BROADCAST_NODES``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ontology_time_machine_ray.functions.hashing import stable_hash64_series
from ontology_time_machine_ray.schema import OWL_EQUIVALENT_CLASS, OWL_SAME_AS
from ontology_time_machine_ray.stages.groupagg import grouped_apply

#: guard for the broadcast assumption (nodes in the equivalence graph);
#: overridable for bigger driver heaps via OTM_MAX_BROADCAST_NODES.
MAX_BROADCAST_NODES = int(os.environ.get("OTM_MAX_BROADCAST_NODES", "5000000"))

#: below this edge count the driver-side union-find fast path runs.
SMALL_GRAPH_LIMIT = int(os.environ.get("OTM_SMALL_GRAPH_LIMIT", "100000"))


def _empty_edges() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "u": pd.Series(dtype="string"),
            "v": pd.Series(dtype="string"),
            "ekey": pd.Series(dtype="int64"),
            "ekey2": pd.Series(dtype="int64"),
        }
    )


def _canonical_edges(df: pd.DataFrame) -> pd.DataFrame:
    """Orient (u > v), drop self-loops and batch-local duplicates."""
    if len(df) == 0:
        return _empty_edges()
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    hi = np.where(u > v, u, v)
    lo = np.where(u > v, v, u)
    out = pd.DataFrame({"u": hi, "v": lo})
    out = out[out["u"] != out["v"]].drop_duplicates()
    if len(out) == 0:
        return _empty_edges()
    # convergence checksum: two independent 31-bit folds of the edge hash
    # whose int64 sums are overflow-safe; together with the edge count the
    # equality proxy has ~2^-62 collision probability per round pair
    h = stable_hash64_series(out["u"].str.cat(out["v"], sep="\x1f")).astype("uint64")
    ekey = (h % np.uint64(2**31)).astype("int64")
    ekey2 = ((h >> np.uint64(33)) % np.uint64(2**31)).astype("int64")
    return out.assign(ekey=ekey, ekey2=ekey2)


def _large_star_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized large-star over all centers in one bucket: connect every
    strictly-larger neighbour of c to min(N(c) ∪ {c})."""
    m_n = g.groupby("center")["other"].transform("min")
    m = np.minimum(m_n, g["center"])
    mask = g["other"] > g["center"]
    out = pd.DataFrame({"u": g["other"][mask].to_numpy(), "v": m[mask].to_numpy()})
    if len(out) == 0:
        return pd.DataFrame({"u": pd.Series(dtype="string"), "v": pd.Series(dtype="string")})
    return out


def _small_star_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized small-star: for each center c (the LARGER endpoint of its
    edges), connect c and all smaller neighbours to min(N(c))."""
    m = g.groupby("center")["other"].transform("min")
    # neighbours != m  ->  (neighbour, m)
    mask = g["other"] != m
    part1 = pd.DataFrame({"u": g["other"][mask].to_numpy(), "v": m[mask].to_numpy()})
    # each center once ->  (center, min)
    firsts = g.groupby("center", as_index=False)["other"].min()
    part2 = pd.DataFrame({"u": firsts["center"].to_numpy(), "v": firsts["other"].to_numpy()})
    out = pd.concat([part1, part2], ignore_index=True)
    if len(out) == 0:
        return pd.DataFrame({"u": pd.Series(dtype="string"), "v": pd.Series(dtype="string")})
    return out


def _sym(ds):
    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "center": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                "other": np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()]),
            }
        )

    return ds.map_batches(both_dirs, batch_format="pandas")


def _driver_union_find(edges: pd.DataFrame) -> pd.DataFrame:
    """Small-graph fast path: textbook union-find, min IRI as root.
    Output contract matches the star rounds: one (node, component) row per
    NON-ROOT node."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(edges["u"], edges["v"]):
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        if rv < ru:
            ru, rv = rv, ru
        parent[rv] = ru
    rows = [(x, find(x)) for x in parent]
    out = pd.DataFrame(rows, columns=["node", "component"])
    return out[out["node"] != out["component"]].sort_values("node").reset_index(drop=True)


def connected_components(edges_ds, max_rounds: int = 12, salt_mod: int = 8,
                         small_graph_limit: int | None = None):
    """Dataset[(u, v)] -> Dataset[(node, component)] (non-root nodes)."""
    if small_graph_limit is None:
        small_graph_limit = SMALL_GRAPH_LIMIT
    edges = edges_ds.map_batches(_canonical_edges, batch_format="pandas").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series(dtype="string"), "component": pd.Series(dtype="string")})
        )
    if n_edges <= small_graph_limit:
        return ray.data.from_pandas(_driver_union_find(edges.to_pandas()))

    from ray.data.aggregate import Count, Sum

    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        large = grouped_apply(_sym(edges), ["center"], _large_star_bucket)
        renamed = large.map_batches(
            lambda df: df.rename(columns={"u": "center", "v": "other"}),
            batch_format="pandas",
        )
        small = grouped_apply(renamed, ["center"], _small_star_bucket)
        edges = small.map_batches(_canonical_edges, batch_format="pandas").materialize()
        stats = edges.aggregate(
            Sum("ekey", alias_name="s"), Sum("ekey2", alias_name="s2"), Count(alias_name="n")
        )
        sig = (stats["s"], stats["s2"], stats["n"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # a partially-contracted mapping is silently WRONG -- refuse to
        # emit it (ADVICE: raise rather than return garbage components)
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "star rounds; raise max_rounds (graph diameter exceeds the "
            "doubling budget)"
        )

    # node -> component via salted two-phase min (hub-safe)
    def _partial_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(salt=(stable_hash64_series(df["v"]) % salt_mod).astype("int64"))
        return df.groupby(["u", "salt"], as_index=False)["v"].min()

    partial = edges.map_batches(_partial_min, batch_format="pandas")
    mapping = grouped_apply(
        partial,
        ["u"],
        lambda g: g.groupby("u", as_index=False)["v"].min(),
    )
    return mapping.map_batches(
        lambda df: df.rename(columns={"u": "node", "v": "component"}),
        batch_format="pandas",
    )


def sameas_edges(triples_ds):
    """Extract equivalence edges from the triple stream (owl:sameAs; the
    reference's dormant dependency graph, proxy_logic.py:276-307, is the
    nearest analog of edge-typed ontology relations)."""

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(t["pred"], value_set=pa.array([OWL_SAME_AS, OWL_EQUIVALENT_CLASS]))
        f = t.filter(mask)
        return pa.table({"u": f["subj"], "v": f["obj"]})

    return triples_ds.map_batches(pick, batch_format="pyarrow")


from ontology_time_machine_ray.functions.broadcast import cached_get as _cached_get


def make_rewriter(mapping_ref):
    """Task-based rewrite stage: the mapping is immutable broadcast state,
    so stateless tasks + a per-worker cached ``ray.get`` beat an actor
    pool here (no pool spin-up on the critical path)."""

    def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(mapping_ref)
        if not m:
            return batch
        batch = batch.copy()
        batch["subj"] = batch["subj"].map(lambda s: m.get(s, s))
        batch["obj"] = batch["obj"].map(lambda s: m.get(s, s))
        # equivalence edges whose endpoints merged are now self-loops: drop
        degenerate = batch["pred"].isin((OWL_SAME_AS, OWL_EQUIVALENT_CLASS)) & (
            batch["subj"] == batch["obj"]
        )
        return batch[~degenerate]

    return rewrite


def _drop_degenerate(batch: pd.DataFrame) -> pd.DataFrame:
    """Equivalence edges whose endpoints merged are now self-loops: drop."""
    degenerate = batch["pred"].isin((OWL_SAME_AS, OWL_EQUIVALENT_CLASS)) & (
        batch["subj"] == batch["obj"]
    )
    return batch[~degenerate]


def _canonicalize_partitioned(triples_ds, mapping_ds):
    """Rewrite via two bucketed hash joins (subj, then obj) for mappings
    too large to broadcast: each join co-locates triples and mapping rows
    on ``hash(key) % B`` and merges vectorized per bucket -- corpus and
    mapping both stay distributed."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join, np_dtype_map

    def rename(col_key: str, col_val: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"node": col_key, "component": col_val})

        return fn

    # one cheap schema fetch on the (materialized) triple store; step1
    # keeps the same columns/dtypes, so hinting j2 with it means the j1
    # sort barrier executes exactly once (schema() on a lazy join output
    # would re-run it just to learn the column names)
    t_dtypes = np_dtype_map(triples_ds.schema())
    m_subj = mapping_ds.map_batches(rename("subj", "_c_subj"), batch_format="pandas")
    j1 = bucketed_join(
        triples_ds,
        m_subj,
        on=["subj"],
        how="left",
        left_schema=t_dtypes,
        right_schema={"subj": "object", "_c_subj": "object"},
    )

    def apply_subj(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(subj=df["_c_subj"].fillna(df["subj"]))
        return df.drop(columns=["_c_subj"])

    step1 = j1.map_batches(apply_subj, batch_format="pandas")
    m_obj = mapping_ds.map_batches(rename("obj", "_c_obj"), batch_format="pandas")
    j2 = bucketed_join(
        step1,
        m_obj,
        on=["obj"],
        how="left",
        left_schema=t_dtypes,
        right_schema={"obj": "object", "_c_obj": "object"},
    )

    def apply_obj(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(obj=df["_c_obj"].fillna(df["obj"]))
        return _drop_degenerate(df.drop(columns=["_c_obj"]))

    return j2.map_batches(apply_obj, batch_format="pandas")


def canonicalize_with_mapping(triples_ds, mapping_ds,
                              broadcast_limit: int | None = None):
    """Rewrite the triple stream through a PRECOMPUTED (node, component)
    mapping Dataset: broadcast lookup when the mapping fits a worker,
    two bucketed joins otherwise.  Shared by the one-shot build and the
    incremental canonical update (which repairs the mapping first)."""
    if broadcast_limit is None:
        broadcast_limit = MAX_BROADCAST_NODES
    n_nodes = mapping_ds.count()
    if n_nodes == 0:
        return triples_ds
    if n_nodes > broadcast_limit:
        return _canonicalize_partitioned(triples_ds, mapping_ds)
    pdf = mapping_ds.to_pandas()
    mapping_ref = ray.put(dict(zip(pdf["node"], pdf["component"])))
    return triples_ds.map_batches(make_rewriter(mapping_ref), batch_format="pandas")


def canonicalize_triples(triples_ds, concurrency: int | None = None,
                         broadcast_limit: int | None = None):
    """Rewrite the triple stream through sameAs components; caller should
    re-dedup afterwards (rewrites can merge rows).

    Mapping <= ``broadcast_limit`` nodes: broadcast lookup inside
    ``map_batches`` (one corpus pass, no shuffle).  Above it: the
    partitioned-join fallback (two bucketed joins) -- degrades instead of
    dying when the equivalence graph outgrows a worker's heap."""
    mapping_ds = connected_components(sameas_edges(triples_ds)).materialize()
    return canonicalize_with_mapping(triples_ds, mapping_ds, broadcast_limit)
