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


#: min-depth expectations over EDGES: chain depths count hops; cycle
#: nodes reach themselves at the cycle length (2 here).
WANT_DEPTH = {
    ("a", "b"): 1, ("a", "c"): 2, ("a", "d"): 3,
    ("b", "c"): 1, ("b", "d"): 2,
    ("c", "d"): 1,
    ("x", "y"): 1, ("x", "x"): 2, ("y", "x"): 1, ("y", "y"): 2,
    ("p", "q"): 1, ("p", "p"): 2, ("q", "p"): 1, ("q", "q"): 2,
}


@pytest.mark.parametrize("limit", [None, 0], ids=["driver-bfs", "distributed-bfs"])
def test_closure_with_depth_paths_agree(ray_session, limit):
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import closure_with_depth

    kw = {} if limit is None else {"small_edges_limit": limit}
    out = closure_with_depth(rd.from_pandas(EDGES), **kw).to_pandas()
    got = {(a, b): int(d) for a, b, d in zip(out["a"], out["b"], out["depth"])}
    assert got == WANT_DEPTH


def test_closure_with_depth_round_cap(ray_session):
    """max_rounds truncates BFS depth (pairs beyond the cap are absent),
    on BOTH paths."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import closure_with_depth

    chain = pd.DataFrame({"a": ["n1", "n2", "n3"], "b": ["n2", "n3", "n4"]})
    for kw in ({}, {"small_edges_limit": 0}):
        out = closure_with_depth(rd.from_pandas(chain), max_rounds=2, **kw).to_pandas()
        got = {(a, b): int(d) for a, b, d in zip(out["a"], out["b"], out["depth"])}
        assert got == {
            ("n1", "n2"): 1, ("n2", "n3"): 1, ("n3", "n4"): 1,
            ("n1", "n3"): 2, ("n2", "n4"): 2,
        }


def test_cli_smoke(ray_session, sf_dir, tmp_path):
    """The __main__ CLI builds a store end-to-end inside this session."""
    from ontology_time_machine_ray.__main__ import main

    out = str(tmp_path / "store")
    assert main(["--sf-dir", sf_dir, "--out", out, "--no-canonical"]) == 0
    import os

    assert os.path.exists(os.path.join(out, "_lineage.json"))


def test_dependency_ttl_roundtrip(ray_session, sf_dir):
    """The Turtle manifest parses to exactly the parquet edge set."""
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.fixtures import ensure_fixtures
    from ontology_time_machine_ray.sources.readers import read_dependency_ttl

    paths = ensure_fixtures(sf_dir)
    ttl = read_dependency_ttl(paths.dependencies_ttl, paths.ontology_index)
    want = pq.read_table(paths.dependencies)
    got_pairs = set(zip(ttl["ontology_id"].to_pylist(), ttl["depends_on"].to_pylist()))
    want_pairs = set(zip(want["ontology_id"].to_pylist(), want["depends_on"].to_pylist()))
    assert got_pairs == want_pairs and len(ttl) == len(want)


def test_dependency_ttl_reference_shape(tmp_path):
    """Parser tolerates the reference manifest's multi-predicate ';' and
    owl:imports statements (tests/dependency.ttl shape)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.sources.readers import read_dependency_ttl

    idx = pa.table(
        {"ontology_id": ["A", "B", "C"],
         "iri": ["http://x.org/a", "http://x.org/b", "http://x.org/c"],
         "host": ["x.org"] * 3, "path": ["/a", "/b", "/c"]}
    )
    ipath = str(tmp_path / "idx.parquet")
    pq.write_table(idx, ipath)
    ttl = tmp_path / "m.ttl"
    ttl.write_text(
        "@prefix ex-version: <https://example.org/versioning/> .\n"
        "<http://x.org/a> owl:imports <http://x.org/b>, <http://x.org/c> ;\n"
        "    ex-version:snapshot <http://irrelevant.example/s> ;\n"
        "    ex-version:dependency <http://x.org/c> .\n"
        "<http://x.org/b> ex-version:snapshot <http://irrelevant.example/t> .\n"
    )
    out = read_dependency_ttl(str(ttl), ipath)
    pairs = set(zip(out["ontology_id"].to_pylist(), out["depends_on"].to_pylist()))
    assert pairs == {("A", "B"), ("A", "C")}


def test_pagerank_matches_numpy_reference(ray_session, monkeypatch):
    import numpy as np
    import ray.data as rd

    from ontology_time_machine_ray.stages import graph
    from ontology_time_machine_ray.stages.graph import pagerank

    # force the fully-distributed branch (driver fast path covers <= limit)
    monkeypatch.setattr(graph, "SMALL_EDGES_LIMIT", 0)

    rng = np.random.RandomState(13)
    n = 40
    src, dst = [], []
    for _ in range(160):
        a, b = rng.randint(0, n), rng.randint(0, n)
        if a != b:
            src.append(f"n{a}")
            dst.append(f"n{b}")
    edges = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    got = (
        pagerank(rd.from_pandas(edges), iters=5)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    # independent dense-matrix fixed-point reference (int64 nano-units,
    # floor division, damping = 85/100) -- must match BIT-EXACTLY
    names = sorted(set(edges["src"]) | set(edges["dst"]))
    pos = {v: i for i, v in enumerate(names)}
    m = len(names)
    adj = np.zeros((m, m), dtype=np.int64)
    for a, b in zip(edges["src"], edges["dst"]):
        adj[pos[a], pos[b]] = 1
    deg = adj.sum(axis=1)
    r = np.full(m, 1_000_000_000, dtype=np.int64)
    for _ in range(5):
        share = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        r = 150_000_000 + (85 * (adj.T @ share)) // 100
    assert got["node"].tolist() == names
    assert got["rank_nanos"].tolist() == r.tolist()
    # sanity: the fixed-point ranks approximate the float iteration
    rf = np.ones(m)
    degf = deg.astype(float)
    for _ in range(5):
        sharef = np.where(degf > 0, rf / np.maximum(degf, 1.0), 0.0)
        rf = 0.15 + 0.85 * (adj.T @ sharef)
    np.testing.assert_allclose(got["rank_nanos"].to_numpy() / 1e9, rf, atol=1e-6)


def test_triangle_stats_distributed_equals_driver(ray_session):
    """Force the distributed degree-oriented path (limit=0) and pin it to
    the driver fast path on a graph with a hub, disjoint triangles and a
    4-clique."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import _driver_triangles, triangle_stats

    edges = pd.DataFrame(
        [
            # 4-clique on a,b,c,d -> 4 triangles, 3 per node
            ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
            # disjoint triangle
            ("p", "q"), ("p", "r"), ("q", "r"),
            # hub h connected to many leaves (no triangles through leaves)
            *[("h", f"l{i:02d}") for i in range(20)],
            # one triangle through the hub
            ("h", "l00x"), ("l00x", "l01x"), ("h", "l01x"),
        ],
        columns=["a", "b"],
    )
    # normalize a < b
    swap = edges["a"] > edges["b"]
    edges.loc[swap, ["a", "b"]] = edges.loc[swap, ["b", "a"]].to_numpy()
    want = _driver_triangles(edges)
    assert want["triangles"].sum() == (4 + 1 + 1) * 3
    got = (
        triangle_stats(rd.from_pandas(edges), small_edges_limit=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["node", "degree", "triangles"]], want)


def test_cooccurrence_edges_distinct_and_ordered(ray_session, sf_dir):
    from ontology_time_machine_ray.pipelines.queries import _pipe
    from ontology_time_machine_ray.stages.graph import cooccurrence_edges

    e = cooccurrence_edges(_pipe(sf_dir).mentions()).to_pandas()
    assert (e["a"] < e["b"]).all()
    assert not e.duplicated(["a", "b"]).any()


def test_label_propagation_majority_and_ties(ray_session, monkeypatch):
    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.stages import graph
    from ontology_time_machine_ray.stages.graph import label_propagation

    # star around "z" plus a triangle: after round 1, z adopts the
    # smallest of its (all-distinct) neighbour labels; triangle members
    # vote among themselves
    edges = pd.DataFrame(
        {
            "a": ["a1", "a2", "a3", "t1", "t1", "t2"],
            "b": ["z", "z", "z", "t2", "t3", "t3"],
        }
    )
    out = (
        label_propagation(rd.from_pandas(edges), rounds=1)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    # z's neighbours {a1,a2,a3} all tie at count 1 -> smallest label a1
    assert out["z"] == "a1"
    # each triangle node sees the other two -> tie -> smallest
    assert out["t1"] == "t2" and out["t2"] == "t1" and out["t3"] == "t1"
    # spokes see only z
    assert out["a1"] == out["a2"] == out["a3"] == "z"

    # round 2 must equal manually propagating round-1 labels once more
    out2 = (
        label_propagation(rd.from_pandas(edges), rounds=2)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    und = pd.concat(
        [edges, edges.rename(columns={"a": "b", "b": "a"})], ignore_index=True
    )
    exp = {}
    for node, sub in und.groupby("a"):
        votes = sub["b"].map(out).value_counts()
        top = votes[votes == votes.max()].index.min()
        exp[node] = top
    assert out2 == exp

    # the distributed path (limit forced to 0) must match the driver path
    monkeypatch.setattr(graph, "SMALL_EDGES_LIMIT", 0)
    dist = (
        label_propagation(rd.from_pandas(edges), rounds=2)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert dist == out2


def test_label_propagation_convergence_detected(ray_session, monkeypatch):
    """``rounds`` is a cap with changed-count convergence: on a graph
    where 2 rounds is NOT enough (a long path -- labels move one hop per
    round), a large cap must land on the true fixpoint, equal to a
    Python replay run to convergence, and the early-exit must make a
    huge cap exactly as correct as the minimal sufficient one.  Both the
    driver fast path and the forced distributed path."""
    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.stages import graph
    from ontology_time_machine_ray.stages.graph import label_propagation

    # path n0-n1-...-n7: the min label creeps rightward one hop per round
    nodes = [f"n{i}" for i in range(8)]
    edges = pd.DataFrame({"a": nodes[:-1], "b": nodes[1:]})

    def replay(rounds_cap: int) -> dict:
        und = pd.concat(
            [edges, edges.rename(columns={"a": "b", "b": "a"})],
            ignore_index=True,
        )
        lab = {n: n for n in nodes}
        for _ in range(rounds_cap):
            new = {}
            for node, sub in und.groupby("a"):
                votes = sub["b"].map(lab).value_counts()
                new[node] = votes[votes == votes.max()].index.min()
            if new == lab:
                break
            lab = new
        return lab

    fix = replay(100)
    assert fix != replay(2)  # 2 rounds genuinely insufficient here

    got = (
        label_propagation(rd.from_pandas(edges), rounds=50)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert got == fix

    monkeypatch.setattr(graph, "SMALL_EDGES_LIMIT", 0)
    dist = (
        label_propagation(rd.from_pandas(edges), rounds=50)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert dist == fix


def test_bgp_match_hand_graph(ray_session):
    """BGP matcher over a hand graph: constants filter, shared variables
    join, repeated variables force in-pattern equality, and disconnected
    patterns are rejected."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "a", "b", "c", "loop", "x"],
                "pred": ["knows", "type", "type", "knows", "knows", "age"],
                "obj": ["b", "Person", "Person", "b", "loop", "x"],
            }
        )
    )
    # (?p type Person) & (?p knows ?q) & (?q type Person) -> only a knows b
    out = bgp_match(
        t,
        [
            ("?p", "knows", "?q"),
            ("?p", "type", "Person"),
            ("?q", "type", "Person"),
        ],
    ).to_pandas()
    assert out.to_dict("records") == [{"p": "a", "q": "b"}]

    # repeated variable: (?s knows ?s) matches only the self-loop
    out2 = bgp_match(t, [("?s", "knows", "?s")]).to_pandas()
    assert out2["s"].tolist() == ["loop"]

    # single pattern with variable predicate binds (pred, obj)
    out3 = bgp_match(t, [("a", "?r", "?o")]).to_pandas()
    assert sorted(map(tuple, out3[["r", "o"]].values.tolist())) == [
        ("knows", "b"),
        ("type", "Person"),
    ]

    with pytest.raises(ValueError, match="shares no variable"):
        bgp_match(t, [("?p", "knows", "?q"), ("?z", "type", "Person")])
    with pytest.raises(ValueError, match="binds no variables"):
        bgp_match(t, [("a", "knows", "b")])


def test_kcore_hand_graph_and_distributed_path(ray_session, monkeypatch):
    """2-core of a hand graph: triangle + pendant chain. The pendant
    chain peels away in cascading rounds; the triangle survives with
    degree 2. Driver and pytest-forced distributed paths agree, and
    extra rounds beyond the fixpoint change nothing."""
    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.stages import graph
    from ontology_time_machine_ray.stages.graph import kcore

    # triangle a-b-c plus chain c-d-e (d,e peel in 2 cascading rounds)
    edges = pd.DataFrame(
        {"a": ["a", "b", "a", "c", "d"], "b": ["b", "c", "c", "d", "e"]}
    )

    out = kcore(rd.from_pandas(edges), k=2, rounds=3).to_pandas()
    got = dict(zip(out["node"], out["degree"]))
    assert got == {"a": 2, "b": 2, "c": 2}

    # fixpoint: more rounds, same answer
    out2 = kcore(rd.from_pandas(edges), k=2, rounds=6).to_pandas()
    assert dict(zip(out2["node"], out2["degree"])) == got

    # distributed path (limit forced to 0) must match the driver path
    monkeypatch.setattr(graph, "SMALL_EDGES_LIMIT", 0)
    out3 = kcore(rd.from_pandas(edges), k=2, rounds=3).to_pandas()
    assert dict(zip(out3["node"], out3["degree"])) == got

    # k above the max degree: empty core
    out4 = kcore(rd.from_pandas(edges), k=3, rounds=3).to_pandas()
    assert len(out4) == 0


def test_bgp_optional_left_join_semantics(ray_session):
    """OPTIONAL patterns keep unmatched required rows with NULLs; a
    disconnected optional is rejected."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "b"],
                "pred": ["knows", "knows", "age"],
                "obj": ["b", "c", "41"],
            }
        )
    )
    out = (
        bgp_match(t, [("?p", "knows", "?q")], optional=[("?p", "age", "?age")])
        .to_pandas()
        .sort_values("p")
        .reset_index(drop=True)
    )
    assert out["p"].tolist() == ["a", "b"]
    assert pd.isna(out.loc[0, "age"])  # a has no age triple
    assert out.loc[1, "age"] == "41"

    with pytest.raises(ValueError, match="optional pattern"):
        bgp_match(t, [("?p", "knows", "?q")], optional=[("?z", "age", "?v")])

    # a variable bound by a PREVIOUS optional may not reappear in a later
    # optional (optional-on-optional scoping is not modeled) -- must be a
    # loud precondition error, not a join-internal assert
    with pytest.raises(ValueError, match="previous OPTIONAL"):
        bgp_match(
            t,
            [("?p", "knows", "?q")],
            optional=[("?p", "age", "?age"), ("?q", "age", "?age")],
        )


def test_bgp_minus_anti_join_semantics(ray_session):
    """MINUS groups remove required bindings with a compatible group
    match (anti-join algebra); a multi-pattern group is existential over
    its internal variables; disconnected and bare-pattern misuse error."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "c", "b", "c", "x"],
                "pred": ["knows", "knows", "knows", "age", "city", "lives"],
                "obj": ["b", "c", "d", "41", "rome", "rome"],
            }
        )
    )
    # drop knowers that have an age triple: removes (b knows c)
    out = (
        bgp_match(t, [("?p", "knows", "?q")], minus=[[("?p", "age", "?v")]])
        .to_pandas()
        .sort_values("p")
    )
    assert list(map(tuple, out[["p", "q"]].values)) == [("a", "b"), ("c", "d")]

    # multi-pattern group, existential over its internal variable ?w:
    # drop ?p whose city is lived in by anyone -> removes (c knows d)
    out2 = (
        bgp_match(
            t,
            [("?p", "knows", "?q")],
            minus=[[("?p", "city", "?cty"), ("?w", "lives", "?cty")]],
        )
        .to_pandas()
        .sort_values("p")
    )
    assert list(map(tuple, out2[["p", "q"]].values)) == [("a", "b"), ("b", "c")]

    # two independent groups compose (each its own anti join)
    out3 = bgp_match(
        t,
        [("?p", "knows", "?q")],
        minus=[[("?p", "age", "?v")], [("?p", "city", "?cty")]],
    ).to_pandas()
    assert list(map(tuple, out3[["p", "q"]].values)) == [("a", "b")]

    # negation composes with OPTIONAL (minus first, then left join)
    out4 = bgp_match(
        t,
        [("?p", "knows", "?q")],
        optional=[("?q", "age", "?age")],
        minus=[[("?p", "city", "?cty")]],
    ).to_pandas().sort_values("p").reset_index(drop=True)
    assert out4["p"].tolist() == ["a", "b"]
    # (a knows b): b has an age triple -> bound; (b knows c): c has none
    assert out4.loc[0, "age"] == "41" and pd.isna(out4.loc[1, "age"])

    with pytest.raises(ValueError, match="shares no variable with the required"):
        bgp_match(t, [("?p", "knows", "?q")], minus=[[("?z", "age", "?v")]])
    with pytest.raises(ValueError, match="bare pattern"):
        bgp_match(t, [("?p", "knows", "?q")], minus=[("?p", "age", "?v")])


def test_bgp_union_solution_mapping_semantics(ray_session):
    """UNION branches with different variables NULL-pad (SPARQL
    solution-mapping union); cross-branch duplicates collapse to set
    semantics; bare-pattern misuse errors."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_union

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "a", "c"],
                "pred": ["knows", "knows", "likes", "age"],
                "obj": ["b", "c", "b", "41"],
            }
        )
    )
    # heterogeneous branches: knows binds (p, q); age binds (p, years)
    out = (
        bgp_union(t, [[("?p", "knows", "?q")], [("?p", "age", "?years")]])
        .to_pandas()
        .sort_values(["p", "q"], na_position="last")
        .reset_index(drop=True)
    )
    assert sorted(out.columns) == ["p", "q", "years"]
    assert out["p"].tolist() == ["a", "b", "c"]
    assert out.loc[0, "q"] == "b" and pd.isna(out.loc[0, "years"])
    assert pd.isna(out.loc[2, "q"]) and out.loc[2, "years"] == "41"

    # same-schema branches: overlapping solutions dedup (a->b appears in
    # both knows and likes)
    out2 = bgp_union(
        t, [[("?p", "knows", "?q")], [("?p", "likes", "?q")]]
    ).to_pandas()
    assert len(out2) == 2
    assert sorted(map(tuple, out2[["p", "q"]].values)) == [("a", "b"), ("b", "c")]

    with pytest.raises(ValueError, match="bare pattern"):
        bgp_union(t, [("?p", "knows", "?q")])
    with pytest.raises(ValueError, match="empty group list"):
        bgp_union(t, [])


def test_construct_template_instantiation(ray_session):
    """CONSTRUCT instantiates each template pattern once per solution,
    distinct over the output graph; variable-dropping templates collapse
    duplicates; ground patterns emit (once) only when solutions exist;
    unbound template variables error."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import construct_triples

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "x"],
                "pred": ["knows", "knows", "age"],
                "obj": ["b", "c", "41"],
            }
        )
    )
    # symmetrize knows + tag subjects: 2 solutions x 2 template patterns,
    # minus the duplicate ground-free overlap = 4 distinct triples
    out = construct_triples(
        t,
        where=[("?p", "knows", "?q")],
        template=[("?q", "knows", "?p"), ("?p", "rdf:type", "Person")],
    ).to_pandas()
    got = sorted(map(tuple, out[["subj", "pred", "obj"]].values))
    assert got == [
        ("a", "rdf:type", "Person"),
        ("b", "knows", "a"),
        ("b", "rdf:type", "Person"),
        ("c", "knows", "b"),
    ]

    # variable-dropping template: both solutions instantiate the SAME
    # ground triple -> exactly one row survives the distinct
    out2 = construct_triples(
        t, where=[("?p", "knows", "?q")], template=[("g", "has", "members")]
    ).to_pandas()
    assert list(map(tuple, out2[["subj", "pred", "obj"]].values)) == [
        ("g", "has", "members")
    ]

    # zero solutions -> empty graph, even for ground templates
    out3 = construct_triples(
        t, where=[("?p", "hates", "?q")], template=[("g", "has", "members")]
    ).to_pandas()
    assert len(out3) == 0

    with pytest.raises(ValueError, match="not bound by the WHERE"):
        construct_triples(t, where=[("?p", "knows", "?q")], template=[("?z", "x", "y")])
    with pytest.raises(ValueError, match="empty template"):
        construct_triples(t, where=[("?p", "knows", "?q")], template=[])
    with pytest.raises(ValueError, match="not a triple"):
        construct_triples(t, where=[("?p", "knows", "?q")], template=[("?p", "x")])


def test_bgp_filter_pushdown_semantics(ray_session):
    """FILTER clauses: constant predicates prune inside the scans,
    var-var comparisons apply once both variables are bound; filter
    variables must come from the REQUIRED group; unknown ops and
    regex-with-variable-rhs error loudly."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "c", "a", "b", "c"],
                "pred": ["knows"] * 3 + ["type"] * 3,
                "obj": ["b", "c", "a", "Person", "Person", "Robot"],
            }
        )
    )
    base = [("?p", "knows", "?q"), ("?p", "type", "?tp")]

    # constant filter on ?tp prunes the second scan; var-var ?p < ?q
    # applies at the join -- matches a-knows-b (a<b, Person) only
    out = bgp_match(
        t,
        base,
        filters=[("?tp", "==", "Person"), ("?p", "<", "?q")],
    ).to_pandas()
    assert sorted(map(tuple, out[["p", "q"]].values.tolist())) == [("a", "b"), ("b", "c")]
    assert set(out["tp"]) == {"Person"}

    # string ops: suffix/prefix/contains/regex
    out2 = bgp_match(t, base, filters=[("?q", "suffix", "c")]).to_pandas()
    assert out2["q"].tolist() == ["c"]
    out3 = bgp_match(t, base, filters=[("?tp", "regex", "^Rob")]).to_pandas()
    assert out3["p"].tolist() == ["c"]

    # filter variable outside the required group -> loud error
    with pytest.raises(ValueError, match="not bound by the required"):
        bgp_match(t, base, filters=[("?zz", "==", "x")])
    # FILTER scopes to the required group, not OPTIONALs
    with pytest.raises(ValueError, match="not bound by the required"):
        bgp_match(
            t,
            [("?p", "knows", "?q")],
            optional=[("?p", "type", "?tp")],
            filters=[("?tp", "==", "Person")],
        )
    with pytest.raises(ValueError, match="unknown filter op"):
        bgp_match(t, base, filters=[("?p", "~~", "a")])
    with pytest.raises(ValueError, match="constant rhs"):
        bgp_match(t, base, filters=[("?p", "contains", "?q")])


def test_path_pairs_operators(ray_session):
    """Property-path algebra on a hand graph: leaf scan, inverse,
    sequence (with duplicate-path collapse), alternation, and the
    one-or-more closure incl. cycle endpoints; unknown operators and
    degenerate arities error."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import path_match, path_pairs

    def pairs(ds):
        df = ds.to_pandas()
        return sorted(map(tuple, df[["s", "o"]].values.tolist()))

    t = rd.from_pandas(
        pd.DataFrame(
            {
                # chain a-p->b-p->c, cycle c-p->a; q edge b-q->d; r edge a-r->d
                "subj": ["a", "b", "c", "b", "a"],
                "pred": ["p", "p", "p", "q", "r"],
                "obj": ["b", "c", "a", "d", "d"],
            }
        )
    )
    assert pairs(path_pairs(t, "p")) == [("a", "b"), ("b", "c"), ("c", "a")]
    assert pairs(path_pairs(t, ("inv", "q"))) == [("d", "b")]
    # seq p/q: a-p->b-q->d only
    assert pairs(path_pairs(t, ("seq", "p", "q"))) == [("a", "d")]
    # alt q|r, distinct endpoints
    assert pairs(path_pairs(t, ("alt", "q", "r"))) == [("a", "d"), ("b", "d")]
    # plus over the 3-cycle: every ordered pair incl. (x, x) on the cycle
    closure = pairs(path_pairs(t, ("plus", "p")))
    nodes = ["a", "b", "c"]
    assert closure == sorted((x, y) for x in nodes for y in nodes)
    # seq collapses duplicate derivations: (p|r)/(inv (p|r)) reaches d
    # from a via r and from b via q -- but (a, a) must appear ONCE
    dup = path_pairs(t, ("seq", ("alt", "q", "r"), ("inv", ("alt", "q", "r"))))
    df = dup.to_pandas()
    assert len(df) == len(df.drop_duplicates())

    # named projection
    named = path_match(t, ("seq", "p", "q"), s_name="x", o_name="y").to_pandas()
    assert named.columns.tolist() == ["x", "y"]

    # zero-length paths: the node universe is subjects-union-objects of
    # the WHOLE store (a, b, c, d -- d has no p edge at all), so p* and
    # p? both carry a 0-hop (d, d) endpoint
    universe = ["a", "b", "c", "d"]
    star = pairs(path_pairs(t, ("star", "p")))
    assert star == sorted(
        set((x, y) for x in nodes for y in nodes) | set((n, n) for n in universe)
    )
    opt = pairs(path_pairs(t, ("opt", "q")))
    assert opt == sorted([("b", "d")] + [(n, n) for n in universe])
    # cycle self-pairs from plus collapse into the zero-length pairs
    assert len(star) == len(set(star))

    with pytest.raises(ValueError, match="unknown path operator"):
        path_pairs(t, ("kleene", "p"))
    with pytest.raises(ValueError, match="needs >= 2"):
        path_pairs(t, ("seq", "p"))
    with pytest.raises(ValueError, match="needs >= 2"):
        path_pairs(t, ("alt", "p"))


def test_bgp_select_modifiers(ray_session):
    """GROUP BY + count/count_distinct/min/max, ORDER BY + LIMIT top-k,
    plain ORDER BY global sort, and the argument validation errors."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_select

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "c", "d", "a", "b"],
                "pred": ["in"] * 4 + ["likes"] * 2,
                "obj": ["g1", "g1", "g2", "g1", "x", "x"],
            }
        )
    )
    out = bgp_select(
        t,
        [("?m", "in", "?g")],
        group_by=["?g"],
        aggs={
            "n": ("count", "*"),
            "nd": ("count_distinct", "?m"),
            "lo": ("min", "?m"),
            "hi": ("max", "?m"),
        },
        order_by=[("n", "desc"), ("g", "asc")],
        limit=10,
    ).to_pandas()
    assert out.columns.tolist() == ["g", "n", "nd", "lo", "hi"]
    assert out.values.tolist() == [["g1", 3, 3, "a", "d"], ["g2", 1, 1, "c", "c"]]

    # LIMIT cuts after the global order
    top1 = bgp_select(
        t,
        [("?m", "in", "?g")],
        group_by=["?g"],
        aggs={"n": ("count", "*")},
        order_by=[("n", "asc")],
        limit=1,
    ).to_pandas()
    assert top1.values.tolist() == [["g2", 1]]

    # ORDER BY without LIMIT = global sort of the raw bindings
    ordered = bgp_select(
        t, [("?m", "in", "?g")], order_by=[("g", "desc"), ("m", "asc")]
    ).to_pandas()
    assert ordered["g"].tolist() == ["g2", "g1", "g1", "g1"]
    assert ordered["m"].tolist() == ["c", "a", "b", "d"]

    with pytest.raises(ValueError, match="require group_by"):
        bgp_select(t, [("?m", "in", "?g")], aggs={"n": ("count", "*")})
    with pytest.raises(ValueError, match="group_by without aggs"):
        bgp_select(t, [("?m", "in", "?g")], group_by=["?g"])
    with pytest.raises(ValueError, match="nondeterministic"):
        bgp_select(t, [("?m", "in", "?g")], limit=3)
    with pytest.raises(ValueError, match="unknown agg op"):
        bgp_select(t, [("?m", "in", "?g")], group_by=["?g"], aggs={"n": ("avg", "?m")})
    with pytest.raises(ValueError, match="is not bound"):
        bgp_select(t, [("?m", "in", "?g")], group_by=["?zz"], aggs={"n": ("count", "*")})
    with pytest.raises(ValueError, match="collides"):
        bgp_select(t, [("?m", "in", "?g")], group_by=["?g"], aggs={"m": ("count", "*")})
    with pytest.raises(ValueError, match="not in output"):
        bgp_select(
            t,
            [("?m", "in", "?g")],
            group_by=["?g"],
            aggs={"n": ("count", "*")},
            order_by=[("zz", "asc")],
            limit=1,
        )


def test_shacl_validate(ray_session):
    """Each constraint kind flags exactly its violators; a conforming
    store yields an empty report; bad specs error loudly."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.schema import RDF_TYPE
    from ontology_time_machine_ray.stages.shacl import validate

    C = "Cls"
    rows = [
        # typed focus nodes: f1 conforms, f2 has no name, f3 has two
        ("f1", RDF_TYPE, C), ("f2", RDF_TYPE, C), ("f3", RDF_TYPE, C),
        ("f1", "name", "ok-name"),
        ("f3", "name", "n1"), ("f3", "name", "N2"),  # N2 breaks ^[a-z] too
        # link targets: t1 typed, t2 untyped
        ("f1", "link", "t1"), ("f1", "link", "t2"),
        ("t1", RDF_TYPE, C), ("t1", "name", "tname"),
    ]
    t = rd.from_pandas(pd.DataFrame(rows, columns=["subj", "pred", "obj"]))
    shapes = [
        {
            "shape": "S",
            "target": ("class", C),
            "constraints": [
                ("minCount", "name", 1),
                ("maxCount", "name", 1),
                ("pattern", "name", "^[a-z]"),
            ],
        },
        {
            "shape": "L",
            "target": ("subjects_of", "link"),
            "constraints": [("class", "link", C)],
        },
    ]
    rep = validate(t, shapes).to_pandas()
    got = sorted(map(tuple, rep.values.tolist()))
    assert got == sorted(
        [
            ("f2", "S", "minCount(name,1)", "0"),
            ("f3", "S", "maxCount(name,1)", "2"),
            ("f3", "S", "pattern(name,^[a-z])", "N2"),
            ("f1", "L", "class(link,Cls)", "t2"),
        ]
    )
    # t1 (typed) never appears as a class-constraint violation value
    assert "t1" not in set(rep["value"])

    # conforming subset -> empty report with the full schema
    ok = rd.from_pandas(
        pd.DataFrame(
            [("f1", RDF_TYPE, C), ("f1", "name", "ok")],
            columns=["subj", "pred", "obj"],
        )
    )
    empty = validate(ok, [shapes[0]]).to_pandas()
    assert len(empty) == 0

    with pytest.raises(ValueError, match="unknown target"):
        validate(
            t,
            [{"shape": "X", "target": ("nodes", C),
              "constraints": [("minCount", "name", 1)]}],
        ).to_pandas()
    with pytest.raises(ValueError, match="unknown constraint"):
        validate(
            t,
            [{"shape": "X", "target": ("class", C),
              "constraints": [("exactly", "name", 1)]}],
        ).to_pandas()
    with pytest.raises(ValueError, match="no shapes"):
        validate(t, [])
    # malformed shapes fail upfront with a per-shape message, not the
    # misleading aggregate error: empty constraints list / typo'd key
    with pytest.raises(ValueError, match="no 'constraints'"):
        validate(t, [{"shape": "X", "target": ("class", C), "constraints": []}])
    with pytest.raises(ValueError, match="no 'constraints'"):
        validate(t, [{"shape": "X", "target": ("class", C),
                      "constraint": [("minCount", "name", 1)]}])


def test_bgp_auto_order_and_values(ray_session):
    """plan_pattern_order puts the most selective pattern first while
    keeping left-deep connectivity; order='auto' matches the given-order
    result and column contract; VALUES inner-joins an inline binding
    table with set semantics and loud errors."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import (
        bgp_match,
        plan_pattern_order,
        predicate_stats,
    )

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "c", "a", "b", "c", "a"],
                "pred": ["knows"] * 3 + ["type"] * 3 + ["rare"],
                "obj": ["b", "c", "a", "P", "P", "R", "z"],
            }
        )
    )
    stats = predicate_stats(t)
    assert stats == {"knows": 3, "type": 3, "rare": 1}

    # rare (1 row) goes first; 2-constant pattern beats predicate counts
    given = [("?p", "knows", "?q"), ("?p", "type", "?tp"), ("?p", "rare", "?z")]
    planned = plan_pattern_order(given, stats)
    assert planned[0] == ("?p", "rare", "?z")
    planned2 = plan_pattern_order(
        [("?p", "knows", "?q"), ("?p", "type", "P")], stats
    )
    assert planned2[0] == ("?p", "type", "P")
    # connectivity wins over raw selectivity: (?q type R) [est 3] must
    # precede disconnected-at-that-point alternatives
    planned3 = plan_pattern_order(
        [("?p", "rare", "?z"), ("?q", "knows", "?w"), ("?z", "knows", "?q")],
        stats,
    )
    assert planned3 == [
        ("?p", "rare", "?z"),
        ("?z", "knows", "?q"),
        ("?q", "knows", "?w"),
    ]

    base = bgp_match(t, given).to_pandas()
    auto = bgp_match(t, given, order="auto").to_pandas()
    assert auto.columns.tolist() == ["p", "q", "tp", "z"]  # given-order contract
    key = ["p", "q", "tp", "z"]
    assert sorted(map(tuple, base[key].values.tolist())) == sorted(
        map(tuple, auto[key].values.tolist())
    )

    # VALUES pins ?p; extra VALUES-only var joins in as a new column
    out = bgp_match(
        t,
        [("?p", "knows", "?q")],
        values=(["?p", "?lbl"], [("a", "A1"), ("a", "A1"), ("c", "C1")]),
    ).to_pandas()
    assert sorted(map(tuple, out[["p", "q", "lbl"]].values.tolist())) == [
        ("a", "b", "A1"),
        ("c", "a", "C1"),
    ]

    with pytest.raises(ValueError, match="UNDEF"):
        bgp_match(t, [("?p", "knows", "?q")], values=(["?p"], [(None,)]))
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(t, [("?p", "knows", "?q")], values=(["?zz"], [("a",)]))
    with pytest.raises(ValueError, match="must be a .variable"):
        bgp_match(t, [("?p", "knows", "?q")], values=(["p"], [("a",)]))
    with pytest.raises(ValueError, match="order must be"):
        bgp_match(t, [("?p", "knows", "?q")], order="fastest")


def test_bgp_ask_and_describe(ray_session):
    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_ask, describe_resource

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "a"],
                "pred": ["knows", "knows", "type"],
                "obj": ["b", "c", "P"],
            }
        )
    )
    assert bgp_ask(t, [("?p", "knows", "?q"), ("?q", "type", "P")]) is False
    assert bgp_ask(t, [("?p", "knows", "?q"), ("?p", "type", "P")]) is True
    # ASK composes with the full bgp_match keyword surface
    assert bgp_ask(t, [("?p", "knows", "?q")], filters=[("?q", "==", "zz")]) is False

    d = describe_resource(t, "b").to_pandas()
    assert sorted(map(tuple, d.values.tolist())) == [
        ("a", "knows", "b"),
        ("b", "knows", "c"),
    ]


def test_bgp_select_optional_scope_and_filter_types(ray_session):
    """Aggregation scopes to the required group (optional-only variables
    error loudly instead of silently NULL-mismatching SPARQL), and
    non-string filter terms get the documented ValueError."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_match, bgp_select

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["a", "b", "a"],
                "pred": ["in", "in", "type"],
                "obj": ["g1", "g1", "T"],
            }
        )
    )
    req = [("?m", "in", "?g")]
    opt = [("?m", "type", "?tp")]
    for bad in (
        dict(group_by=["?tp"], aggs={"n": ("count", "*")}),
        dict(group_by=["?g"], aggs={"nd": ("count_distinct", "?tp")}),
        dict(group_by=["?g"], aggs={"mn": ("min", "?tp")}),
    ):
        with pytest.raises(ValueError, match="only by an OPTIONAL"):
            bgp_select(t, req, optional=opt, **bad)
    with pytest.raises(ValueError, match="rhs must be a string"):
        bgp_match(t, req, filters=[("?g", "<", 5)])
    with pytest.raises(ValueError, match="lhs must be a .variable"):
        bgp_match(t, req, filters=[(5, "<", "?g")])


def test_triples_tagged_at_equals_per_coordinate_builds(ray_session, sf_dir):
    """The fused multi-coordinate linker pass (one actor pool, shared
    snapshot state, no per-coordinate dedup) yields exactly the same
    per-coordinate DISTINCT logical triples as K independent builds."""
    from ontology_time_machine_ray.pipelines.kg import KgPipeline

    ts = ("2019-06-01", "2021-06-01")
    p = KgPipeline.for_sf_dir(sf_dir)
    key = ["subj", "pred", "obj"]

    fused = p.triples_tagged_at(ts).to_pandas()
    for i, store in enumerate(p.triples_at(ts)):
        want = store.to_pandas()[key].drop_duplicates()
        got = fused[fused["coord"] == i][key].drop_duplicates()
        k = lambda df: sorted(map(tuple, df[key].itertuples(index=False)))
        assert k(got) == k(want), f"coordinate {i} ({ts[i]}) diverges"


@pytest.mark.parametrize("limit", [None, 0], ids=["driver-bfs", "distributed-bfs"])
def test_bfs_from_seeds_paths_agree(ray_session, limit):
    """Seeded BFS: min hop from ANY seed, seeds at depth 0, unreachable
    nodes absent, cycles terminate -- identical on both paths."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import bfs_from_seeds

    edges = pd.DataFrame(
        {
            # s1 -> a -> b -> c, cycle c -> a; s2 -> b; island x -> y
            "a": ["s1", "a", "b", "c", "s2", "x"],
            "b": ["a", "b", "c", "a", "b", "y"],
        }
    )
    kw = {} if limit is None else {"small_edges_limit": 0}
    out = bfs_from_seeds(rd.from_pandas(edges), ["s1", "s2"], **kw).to_pandas()
    got = {n: int(d) for n, d in zip(out["node"], out["depth"])}
    assert got == {"s1": 0, "s2": 0, "a": 1, "b": 1, "c": 2}

    with pytest.raises(ValueError, match=">= 1 seed"):
        bfs_from_seeds(rd.from_pandas(edges), [])


def test_bind_columns_expressions(ray_session):
    """BIND ops: value semantics (absent-needle -> ''), sequential
    scoping (later binds see earlier outputs), aggregate over a BIND
    output, and the validation errors."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_select

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["ns#a", "ns#b", "plain"],
                "pred": ["p", "p", "p"],
                "obj": ["X", "Y", "Z"],
            }
        )
    )
    out = bgp_select(
        t,
        [("?s", "p", "?o")],
        binds={
            "frag": ("strafter", "?s", "#"),
            "pre": ("strbefore", "?s", "#"),
            "lo": ("lcase", "?o"),
            "tagged": ("concat", "<", "?frag", ">"),  # sees earlier bind
            "n": ("strlen", "?s"),
            "fixed": ("replace", "?s", "^ns", "NS"),
        },
    ).to_pandas()
    by_s = out.set_index("s")
    assert by_s.loc["ns#a", "frag"] == "a" and by_s.loc["plain", "frag"] == ""
    assert by_s.loc["ns#a", "pre"] == "ns" and by_s.loc["plain", "pre"] == ""
    assert by_s.loc["ns#b", "lo"] == "y"
    assert by_s.loc["ns#a", "tagged"] == "<a>"
    assert int(by_s.loc["plain", "n"]) == 5
    assert by_s.loc["ns#a", "fixed"] == "NS#a"

    # aggregate over a BIND output (joins the required scope)
    agg = bgp_select(
        t,
        [("?s", "p", "?o")],
        binds={"frag": ("strafter", "?s", "#")},
        group_by=["?frag"],
        aggs={"cnt": ("count", "*")},
        order_by=[("frag", "asc")],
        limit=10,
    ).to_pandas()
    assert agg.values.tolist() == [["", 1], ["a", 1], ["b", 1]]

    for bad, msg in (
        ({"s": ("ucase", "?s")}, "collides"),
        ({"x": ("shout", "?s")}, "unknown BIND op"),
        ({"x": ("ucase", "?zz")}, "is not bound"),
        ({"x": ("ucase", "lit")}, "at least one arg"),
        ({"x": ("strafter", "?s", "?o")}, "literal needle"),
        ({"x": ("strlen", "?s", "?o")}, "takes 1..1"),
    ):
        with pytest.raises(ValueError, match=msg):
            bgp_select(t, [("?s", "p", "?o")], binds=bad)


def test_bind_literal_needles_and_scope(ray_session):
    """Review regressions pinned: multi-char needles are LITERAL (not
    regex), CONCAT stringifies numeric bind outputs, and a BIND over an
    OPTIONAL-only variable errors loudly."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_select

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["aXb-c", "aXb.a.b-z"],
                "pred": ["p", "p"],
                "obj": ["o1", "o2"],
            }
        )
    )
    out = bgp_select(
        t,
        [("?s", "p", "?o")],
        binds={
            "after": ("strafter", "?s", "a.b"),
            "before": ("strbefore", "?s", "a.b"),
            "n": ("strlen", "?o"),
            "m": ("strlen", "?s"),
            "nm": ("concat", "?n", "-", "?m"),
        },
    ).to_pandas().set_index("s")
    # 'a.b' is a LITERAL substring: absent in 'aXb-c'
    assert out.loc["aXb-c", "after"] == "" and out.loc["aXb-c", "before"] == ""
    assert out.loc["aXb.a.b-z", "after"] == "-z"
    assert out.loc["aXb.a.b-z", "before"] == "aXb."
    # numeric binds concatenate as decimal strings, not arithmetic
    assert out.loc["aXb-c", "nm"] == "2-5"

    with pytest.raises(ValueError, match="only by an OPTIONAL"):
        bgp_select(
            t,
            [("?s", "p", "?o")],
            optional=[("?s", "q", "?tp")],
            binds={"x": ("ucase", "?tp")},
        )


def test_bgp_select_sum_and_having(ray_session):
    """SUM over a numeric BIND output and HAVING post-aggregate filters;
    sum over a string variable and ungrouped having error loudly."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.stages.bgp import bgp_select

    t = rd.from_pandas(
        pd.DataFrame(
            {
                "subj": ["aa", "bbb", "cccc", "d"],
                "pred": ["in"] * 4,
                "obj": ["g1", "g1", "g2", "g2"],
            }
        )
    )
    out = bgp_select(
        t,
        [("?m", "in", "?g")],
        binds={"n": ("strlen", "?m")},
        group_by=["?g"],
        aggs={"total": ("sum", "?n"), "cnt": ("count", "*")},
        having=[("total", ">", 4)],
        order_by=[("g", "asc")],
        limit=10,
    ).to_pandas()
    # g1: 2+3=5 (kept), g2: 4+1=5 (kept); drop the threshold to prove it cuts
    assert out[["g", "total", "cnt"]].values.tolist() == [["g1", 5, 2], ["g2", 5, 2]]
    out2 = bgp_select(
        t,
        [("?m", "in", "?g")],
        binds={"n": ("strlen", "?m")},
        group_by=["?g"],
        aggs={"mx": ("max", "?m"), "total": ("sum", "?n")},
        having=[("mx", "suffix", "b"), ("total", ">=", 5)],
    ).to_pandas()
    assert out2["g"].tolist() == ["g1"]

    with pytest.raises(ValueError, match="sum needs a numeric"):
        bgp_select(t, [("?m", "in", "?g")], group_by=["?g"], aggs={"x": ("sum", "?m")})
    with pytest.raises(ValueError, match="having requires group_by"):
        bgp_select(t, [("?m", "in", "?g")], having=[("m", "==", "aa")])
    with pytest.raises(ValueError, match="unknown having op"):
        bgp_select(t, [("?m", "in", "?g")], group_by=["?g"],
                   aggs={"c": ("count", "*")}, having=[("c", "~", 1)])
    with pytest.raises(ValueError, match="having column"):
        bgp_select(t, [("?m", "in", "?g")], group_by=["?g"],
                   aggs={"c": ("count", "*")}, having=[("zz", ">", 1)])


@pytest.mark.parametrize("limit", [None, 0], ids=["driver", "distributed"])
def test_random_walks_paths_agree(ray_session, limit):
    """Deterministic walks: both paths identical, sinks terminate walks
    early, step 0 is the start, every hop follows an existing edge."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import random_walks

    edges = pd.DataFrame(
        {"a": ["a", "a", "b", "c", "x"], "b": ["b", "c", "c", "a", "y"]}
    )
    kw = {} if limit is None else {"small_edges_limit": 0}
    out = random_walks(rd.from_pandas(edges), walks_per_node=2, length=3, **kw).to_pandas()
    # both paths must be IDENTICAL (same md5 hop choices), not merely valid
    other = random_walks(
        rd.from_pandas(edges), walks_per_node=2, length=3,
        small_edges_limit=(0 if limit is None else None),
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["walk_id", "step", "node"]].itertuples(index=False)))
    assert key(out) == key(other)
    # starts: nodes with out-edges (a, b, c, x), 2 walks each at step 0
    step0 = out[out["step"] == 0]
    assert sorted(step0["node"]) == sorted(["a", "a", "b", "b", "c", "c", "x", "x"])
    # walks from x hit sink y at step 1 and stop
    x_walks = out[out["walk_id"].str.startswith("x:")]
    assert x_walks["step"].max() == 1 and set(x_walks[x_walks.step == 1]["node"]) == {"y"}
    # every consecutive (step, step+1) pair is an edge
    eset = set(zip(edges["a"], edges["b"]))
    for _, w in out.sort_values(["walk_id", "step"]).groupby("walk_id"):
        nodes = w["node"].tolist()
        for u, v in zip(nodes, nodes[1:]):
            assert (u, v) in eset

    with pytest.raises(ValueError, match="must be >= 1"):
        random_walks(rd.from_pandas(edges), walks_per_node=0)


def test_walk_skipgrams_window(ray_session):
    """Skip-gram pairs: window bound respected, self-position excluded,
    counts aggregate across walks; window validation errors."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import walk_skipgrams

    walks = pd.DataFrame(
        {
            "walk_id": ["w1"] * 3 + ["w2"] * 2,
            "step": [0, 1, 2, 0, 1],
            "node": ["a", "b", "c", "a", "b"],
        }
    )
    out = walk_skipgrams(rd.from_pandas(walks), window=1).to_pandas()
    got = {(c, x): int(n) for c, x, n in out[["center", "context", "n_pairs"]].values}
    # adjacent pairs only, both directions; (a,b) appears in both walks
    assert got == {("a", "b"): 2, ("b", "a"): 2, ("b", "c"): 1, ("c", "b"): 1}

    out2 = walk_skipgrams(rd.from_pandas(walks), window=2).to_pandas()
    got2 = {(c, x): int(n) for c, x, n in out2[["center", "context", "n_pairs"]].values}
    assert got2[("a", "c")] == 1 and got2[("c", "a")] == 1

    import pytest

    with pytest.raises(ValueError, match="window must be"):
        walk_skipgrams(rd.from_pandas(walks), window=0)
