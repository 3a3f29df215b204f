"""Canonicalization: distributed union-find over owl:sameAs edges.

Connected components are computed with the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SOCC'14 -- public literature), which needs ONLY
``groupby().map_groups`` rounds over the edge list: no driver-side graph,
no per-round join.  Each component's representative is its minimum IRI;
every triple's subj/obj is rewritten through the resulting mapping and the
store re-deduped (rewrites can collide).

Skew handling (hub entities like the fixture's ``O000#C1`` star): the
node -> component mapping aggregation runs as an explicit SALTED two-phase
min -- ``groupby((node, salt)).min`` then ``groupby(node).min`` -- so a
hub whose edges all land on one reducer is first reduced in ``skew_salt``
parallel shards (SURVEY.md §4.2's mandatory hub-salting).

The final mapping is the SMALL side (nodes appearing in equivalence edges
only, a vocabulary-scale table, not corpus-scale), so the rewrite is a
broadcast lookup inside ``map_batches`` (``ray.put`` once, read per actor)
rather than two corpus-wide shuffle joins.  If the equivalence graph ever
approached corpus scale, the rewrite would switch to a hash-partitioned
join on subj/obj; that assumption is asserted at runtime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ontology_time_machine_ray.functions.hashing import stable_hash64_series
from ontology_time_machine_ray.schema import OWL_SAME_AS

#: guard for the broadcast assumption (nodes in the equivalence graph).
MAX_BROADCAST_NODES = 5_000_000


def _empty_edges() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "u": pd.Series(dtype="string"),
            "v": pd.Series(dtype="string"),
            "ekey": pd.Series(dtype="int64"),
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
    # 31-bit folded key: its int64 sum is an overflow-safe convergence checksum
    ekey = (stable_hash64_series(out["u"].str.cat(out["v"], sep="\x1f")) % (2**31)).astype(
        "int64"
    )
    return out.assign(ekey=ekey)


def _large_star_group(g: pd.DataFrame) -> pd.DataFrame:
    """For center c with neighbors N over symmetric edges: connect every
    strictly-larger neighbor to min(N ∪ {c})."""
    c = g["center"].iloc[0]
    neigh = g["other"]
    m = min(neigh.min(), c)
    bigger = neigh[neigh > c]
    if len(bigger) == 0:
        return pd.DataFrame({"u": pd.Series(dtype="string"), "v": pd.Series(dtype="string")})
    return pd.DataFrame({"u": bigger.to_numpy(), "v": m})


def _small_star_group(g: pd.DataFrame) -> pd.DataFrame:
    """For center c over edges where c is the LARGER endpoint, connect c and
    all its smaller neighbors to the minimum."""
    c = g["center"].iloc[0]
    neigh = g["other"]
    m = neigh.min()
    nodes = pd.unique(np.append(neigh.to_numpy(), c))
    nodes = nodes[nodes != m]
    return pd.DataFrame({"u": nodes, "v": m})


def _sym(ds):
    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "center": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                "other": np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()]),
            }
        )

    return ds.map_batches(both_dirs, batch_format="pandas")


def connected_components(edges_ds, max_rounds: int = 12):
    """Dataset[(u, v)] -> Dataset[(node, component)].

    Alternating star rounds until the canonical edge set stabilizes
    (checksum aggregate as the convergence test -- a tiny global
    aggregate, not a materialization of the graph).
    """
    edges = edges_ds.map_batches(_canonical_edges, batch_format="pandas").materialize()
    if edges.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series(dtype="string"), "component": pd.Series(dtype="string")})
        )
    prev_sig = None
    for _ in range(max_rounds):
        large = (
            _sym(edges)
            .groupby("center")
            .map_groups(_large_star_group, batch_format="pandas")
        )
        renamed = large.map_batches(
            lambda df: df.rename(columns={"u": "center", "v": "other"}),
            batch_format="pandas",
        )
        small = renamed.groupby("center").map_groups(
            _small_star_group, batch_format="pandas"
        )
        edges = small.map_batches(_canonical_edges, batch_format="pandas").materialize()
        agg = edges.sum("ekey")
        n = edges.count()
        sig = (n, agg)
        if sig == prev_sig:
            break
        prev_sig = sig
    # node -> component via salted two-phase min (hub-safe)
    def _salt(df: pd.DataFrame, salt_mod: int = 8) -> pd.DataFrame:
        return df.assign(salt=(stable_hash64_series(df["v"]) % salt_mod).astype("int64"))

    partial = (
        edges.map_batches(_salt, batch_format="pandas")
        .groupby(["u", "salt"])
        .min("v")
    )
    mapping = partial.groupby("u").min("min(v)")
    return mapping.map_batches(
        lambda df: df.rename(columns={"u": "node", "min(min(v))": "component"}),
        batch_format="pandas",
    )


def sameas_edges(triples_ds):
    """Extract equivalence edges from the triple stream (owl:sameAs; the
    reference's dormant dependency graph, proxy_logic.py:276-307, is the
    nearest analog of edge-typed ontology relations)."""

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(t["pred"], OWL_SAME_AS)
        f = t.filter(mask)
        return pa.table({"u": f["subj"], "v": f["obj"]})

    return triples_ds.map_batches(pick, batch_format="pyarrow")


class CanonicalRewriter:
    """Actor-pool stage: rewrite subj/obj through the broadcast component
    mapping (state fetched once per actor in ``__init__``)."""

    def __init__(self, mapping_ref):
        self.mapping: dict[str, str] = ray.get(mapping_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = self.mapping
        if not m:
            return batch
        batch = batch.copy()
        batch["subj"] = batch["subj"].map(lambda s: m.get(s, s))
        batch["obj"] = batch["obj"].map(lambda s: m.get(s, s))
        # equivalence edges whose endpoints merged are now self-loops: drop
        degenerate = (batch["pred"] == OWL_SAME_AS) & (batch["subj"] == batch["obj"])
        return batch[~degenerate]


def canonicalize_triples(triples_ds, concurrency: int = 2):
    """Rewrite the triple stream through sameAs components; caller should
    re-dedup afterwards (rewrites can merge rows)."""
    edges = sameas_edges(triples_ds)
    mapping_ds = connected_components(edges)
    n_nodes = mapping_ds.count()
    assert n_nodes <= MAX_BROADCAST_NODES, (
        f"equivalence graph too large to broadcast ({n_nodes} nodes); "
        "switch the rewrite to a partitioned join"
    )
    if n_nodes == 0:
        return triples_ds
    pdf = mapping_ds.to_pandas()
    mapping = dict(zip(pdf["node"], pdf["component"]))
    mapping_ref = ray.put(mapping)
    return triples_ds.map_batches(
        CanonicalRewriter,
        fn_constructor_args=(mapping_ref,),
        batch_format="pandas",
        concurrency=concurrency,
    )
