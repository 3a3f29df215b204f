"""Basic-graph-pattern (BGP) matching over the (subj, pred, obj) store.

The SPARQL query core: a conjunction of triple patterns whose variables
must bind consistently, e.g.::

    ?cls  rdf:type     owl:Class .
    ?cls  owl:sameAs   ?peer .
    ?peer rdfs:isDefinedBy ?ont .

Reference semantics: the time machine serves ontology snapshots whose
consumers run exactly such conjunctive queries over the resolved triples
(``ontologytimemachine/utils/proxy_logic.py`` resolves the store this
matcher queries; the reference itself has no query engine -- this is the
query side a KG pipeline needs once triples exist).

Execution shape (Ray-Data-first):

* Each pattern compiles to a SCAN: one vectorized ``map_batches`` filter
  on the constant positions + a projection of the variable positions.
  Scans stream off the pinned triple store; constants prune INSIDE the
  batch with no Python row loop.
* Patterns join left-deep in the order given, each step ONE bucketed
  hash join (`groupagg.bucketed_join`) on the shared variables -- hash
  co-location, no broadcast: at 10^12 docs no binding table is small.
  Pattern order is the query plan; callers put the most selective
  pattern first (the classic heuristic a cost-based optimizer would
  automate).
* Because the store is distinct on (subj, pred, obj), every scan's
  binding relation is distinct, and joins on shared variables of
  distinct relations stay distinct -- so NO global dedup pass is needed;
  the result is exact without a terminal shuffle.

A pattern term starting with ``?`` is a variable; anything else is a
constant IRI.  Repeated variables within one pattern (e.g. ``(?x, p,
?x)``) become an in-batch equality filter.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from ontology_time_machine_ray.stages.groupagg import (
    bucketed_join,
    grouped_aggregate,
    grouped_apply,
)

_POS = ("subj", "pred", "obj")

#: FILTER operators -> vectorized pandas predicate on a string column.
#: Lexicographic comparisons match ANSI-SQL string collation on the
#: ASCII IRIs the store holds; contains/prefix/suffix/regex restate
#: SPARQL CONTAINS / STRSTARTS / STRENDS / REGEX.
_FILTER_OPS = {
    "==": lambda col, rhs: col == rhs,
    "!=": lambda col, rhs: col != rhs,
    "<": lambda col, rhs: col < rhs,
    "<=": lambda col, rhs: col <= rhs,
    ">": lambda col, rhs: col > rhs,
    ">=": lambda col, rhs: col >= rhs,
    "contains": lambda col, rhs: col.str.contains(rhs, regex=False, na=False),
    "prefix": lambda col, rhs: col.str.startswith(rhs).fillna(False),
    "suffix": lambda col, rhs: col.str.endswith(rhs).fillna(False),
    "regex": lambda col, rhs: col.str.contains(rhs, regex=True, na=False),
}


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _check_filters(filters: Sequence[Sequence[str]]):
    """Split FILTER clauses into const filters (var op constant), keyed
    by variable, and var-var comparisons.  Each clause is ``(lhs, op,
    rhs)`` with ``lhs`` a ``?variable``; ``rhs`` is a ``?variable`` only
    for comparison ops."""
    const_by_var: dict[str, list[tuple[str, str]]] = {}
    var_pairs: list[tuple[str, str, str]] = []
    for clause in filters:
        if len(clause) != 3:
            raise ValueError(f"filter {clause} is not (lhs, op, rhs)")
        lhs, op, rhs = clause
        if op not in _FILTER_OPS:
            raise ValueError(f"unknown filter op {op!r} (have {sorted(_FILTER_OPS)})")
        if not isinstance(lhs, str) or not _is_var(lhs):
            raise ValueError(f"filter {clause}: lhs must be a ?variable")
        if not isinstance(rhs, str):
            raise ValueError(
                f"filter {clause}: rhs must be a string (the store's terms "
                "are IRIs; compare lexicographically)"
            )
        if _is_var(rhs):
            if op in ("contains", "prefix", "suffix", "regex"):
                raise ValueError(
                    f"filter {clause}: {op} needs a constant rhs"
                )
            var_pairs.append((lhs[1:], op, rhs[1:]))
        else:
            const_by_var.setdefault(lhs[1:], []).append((op, rhs))
    return const_by_var, var_pairs


def _scan(
    triples,
    pattern: Sequence[str],
    const_filters: dict[str, list[tuple[str, str]]] | None = None,
):
    """Compile one triple pattern to a filtered, projected scan whose
    columns are the pattern's variable names (without the ``?``).

    ``const_filters`` (var -> [(op, constant)]) are FILTER clauses pushed
    DOWN into the scan: a single-variable constant predicate prunes rows
    before they ever reach a join, so the exchange ships only surviving
    bindings (classic selection pushdown -- the part of a cost-based
    optimizer this left-deep matcher hands to the caller)."""
    consts = [(pos, t) for pos, t in zip(_POS, pattern) if not _is_var(t)]
    vars_ = [(pos, t[1:]) for pos, t in zip(_POS, pattern) if _is_var(t)]
    if not vars_:
        raise ValueError(f"pattern {pattern} binds no variables")
    # repeated variable => in-pattern equality (e.g. (?x, p, ?x))
    seen: dict[str, str] = {}
    eq_pairs = []
    proj: list[tuple[str, str]] = []
    for pos, name in vars_:
        if name in seen:
            eq_pairs.append((seen[name], pos))
        else:
            seen[name] = pos
            proj.append((pos, name))
    pushed = []
    if const_filters:
        for pos, name in proj:
            for op, rhs in const_filters.get(name, ()):
                pushed.append((pos, op, rhs))

    def scan_batch(df: pd.DataFrame) -> pd.DataFrame:
        mask = pd.Series(True, index=df.index)
        for pos, value in consts:
            mask &= df[pos] == value
        for a, b in eq_pairs:
            mask &= df[a] == df[b]
        for pos, op, rhs in pushed:
            mask &= _FILTER_OPS[op](df[pos], rhs)
        sub = df[mask]
        return pd.DataFrame({name: sub[pos] for pos, name in proj})

    out_schema = {name: "object" for _, name in proj}
    return triples.map_batches(scan_batch, batch_format="pandas"), out_schema


def predicate_stats(triples) -> dict[str, int]:
    """Per-predicate triple counts -- the ONE statistic the auto planner
    uses.  Per-batch partial counts, summed on the driver: the result is
    vocabulary-sized (#predicates), never corpus-sized, so this is a
    legitimate broadcast-small statistic (compute once, reuse across
    queries against the same pinned store)."""
    parts = triples.map_batches(
        lambda df: df.groupby("pred", as_index=False).agg(n=("subj", "size")),
        batch_format="pandas",
    ).to_pandas()
    if not len(parts):
        return {}
    return parts.groupby("pred")["n"].sum().to_dict()


def plan_pattern_order(
    patterns: Sequence[Sequence[str]], stats: dict[str, int]
) -> list[Sequence[str]]:
    """Greedy selectivity-ordered join plan for a conjunctive BGP.

    Heuristic (the classic textbook one a cost-based optimizer refines):
    a pattern's estimated scan size is its predicate's triple count
    (whole-store size for a variable predicate), and every additional
    constant in subject/object position makes it strictly more
    selective.  Start from the globally most selective pattern, then
    repeatedly append the most selective pattern that shares a variable
    with the already-bound set -- the same left-deep connectivity
    ``bgp_match`` requires, now chosen by estimated cardinality instead
    of caller order.  A disconnected remainder keeps its given order so
    ``bgp_match`` raises its usual loud error."""
    total = sum(stats.values()) or 1

    def est(p) -> tuple[int, int]:
        s, pr, o = p
        base = stats.get(pr, 0) if not _is_var(pr) else total
        n_binding_consts = int(not _is_var(s)) + int(not _is_var(o))
        return (-n_binding_consts, base)

    remaining = sorted(range(len(patterns)), key=lambda i: (est(patterns[i]), i))
    ordered = [remaining.pop(0)]
    bound = set(_group_schema([patterns[ordered[0]]]))
    while remaining:
        connected = [
            i for i in remaining if set(_group_schema([patterns[i]])) & bound
        ]
        if not connected:
            ordered.extend(sorted(remaining))
            break
        nxt = min(connected, key=lambda i: (est(patterns[i]), i))
        remaining.remove(nxt)
        ordered.append(nxt)
        bound |= set(_group_schema([patterns[nxt]]))
    return [patterns[i] for i in ordered]


def bgp_match(
    triples,
    patterns: Sequence[Sequence[str]],
    optional: Sequence[Sequence[str]] = (),
    minus: Sequence[Sequence[Sequence[str]]] = (),
    filters: Sequence[Sequence[str]] = (),
    values: tuple[Sequence[str], Sequence[Sequence[str]]] | None = None,
    order: str = "given",
    stats: dict[str, int] | None = None,
):
    """Match a conjunction of triple patterns; returns a Dataset of the
    distinct variable bindings (one column per ``?variable``).

    ``values`` is a SPARQL VALUES clause ``(variables, rows)`` -- an
    inline binding table (query-literal, so driver-small by definition)
    inner-joined onto the required match on its shared variables; rows
    are deduplicated (set semantics), extra VALUES-only variables join
    in as new columns, and UNDEF is not supported (wildcard rows are a
    different join per defined-column subset -- callers union explicit
    VALUES instead).

    ``order="auto"`` replans the required patterns by estimated
    selectivity (``plan_pattern_order``) using per-predicate counts --
    ``stats`` if given, else one cheap counting pass over ``triples``
    (`predicate_stats`; vocabulary-sized, reusable).  Results are
    IDENTICAL to the given order (joins commute); only the intermediate
    sizes change.  Output columns stay in the GIVEN first-seen order
    either way.

    ``filters`` are SPARQL FILTER clauses over the REQUIRED group's
    variables, each ``(lhs, op, rhs)``: ``lhs`` a ``?variable``; ``op``
    one of ``== != < <= > >= contains prefix suffix regex`` (the last
    four restate CONTAINS / STRSTARTS / STRENDS / REGEX and need a
    constant rhs); ``rhs`` a constant or, for comparisons, another
    ``?variable``.  Execution is pushdown-planned, never a post-pass:
    a constant filter prunes INSIDE every scan that binds its variable
    (selection pushdown -- rows die before the first exchange), and a
    var-var comparison applies at the EARLIEST left-deep step where
    both variables are bound.  Per SPARQL group scoping, filters see
    the required group only -- a filter variable bound solely by an
    OPTIONAL clause is an error here (unbound-variable FILTERs, which
    SPARQL evaluates to error=false, are a caller bug this matcher
    surfaces loudly instead).

    ``optional`` patterns are SPARQL OPTIONAL clauses: each LEFT-joins
    onto the required match on its shared variables, so unmatched rows
    keep their required bindings with NULLs in the optional-only
    columns.  Each optional must share a variable with the REQUIRED
    prefix (optionals are independent of each other -- chained
    optional-on-optional scoping is not modeled).

    ``minus`` entries are SPARQL negation: each entry is a pattern GROUP
    (a list of patterns, even for a single one) matched as its own
    conjunctive BGP, then removed from the required bindings by ONE
    bucketed ANTI join on the shared variables -- rows for which a
    compatible group binding EXISTS are dropped.  Each group must share
    a variable with the required match: with shared variables SPARQL's
    MINUS and FILTER NOT EXISTS coincide, and the disconnected forms
    (MINUS = no-op, NOT EXISTS = all-or-nothing) are never the query a
    caller means, so they error loudly like a disconnected pattern.
    Negation applies to the REQUIRED match, before optionals (SPARQL
    group scoping), and the anti side ships only the shared columns.

    ``triples`` must be distinct on (subj, pred, obj) -- the deduped
    store guarantees it -- and should be ``materialize()``d by the
    caller when it feeds more than one pattern (it always does), else
    the lazy upstream would re-execute once per scan.
    """
    if not patterns:
        raise ValueError("empty pattern list")
    if order not in ("given", "auto"):
        raise ValueError(f"order must be 'given' or 'auto', not {order!r}")
    if order == "auto":
        if stats is None:
            stats = predicate_stats(triples)
        planned = plan_pattern_order(patterns, stats)
    else:
        planned = list(patterns)
    const_by_var, var_pairs = _check_filters(filters)
    required_schema = _group_schema(patterns)
    for v in const_by_var:
        if v not in required_schema:
            raise ValueError(
                f"filter variable ?{v} is not bound by the required patterns "
                "(FILTER scopes to the required group, not OPTIONALs)"
            )
    for a, _, b in var_pairs:
        for v in (a, b):
            if v not in required_schema:
                raise ValueError(
                    f"filter variable ?{v} is not bound by the required "
                    "patterns (FILTER scopes to the required group)"
                )

    def apply_var_pairs(ds, schema, pending):
        """Apply every pending var-var filter whose variables are all
        bound; returns (ds, still_pending)."""
        ready = [(a, op, b) for a, op, b in pending if a in schema and b in schema]
        if not ready:
            return ds, pending
        remaining = [p for p in pending if p not in ready]

        def fil(df: pd.DataFrame) -> pd.DataFrame:
            mask = pd.Series(True, index=df.index)
            for a, op, b in ready:
                mask &= _FILTER_OPS[op](df[a], df[b])
            return df[mask]

        return ds.map_batches(fil, batch_format="pandas"), remaining

    acc, acc_schema = _scan(triples, planned[0], const_by_var)
    acc, var_pairs = apply_var_pairs(acc, acc_schema, var_pairs)
    for pattern in planned[1:]:
        scan, scan_schema = _scan(triples, pattern, const_by_var)
        shared = [v for v in acc_schema if v in scan_schema]
        if not shared:
            raise ValueError(
                f"pattern {pattern} shares no variable with the prefix -- "
                "reorder patterns so each one connects (cartesian products "
                "are never the plan you want at store scale)"
            )
        acc = bucketed_join(
            acc,
            scan,
            on=shared,
            left_schema=acc_schema,
            right_schema=scan_schema,
        )
        acc_schema = {**acc_schema, **scan_schema}
        acc, var_pairs = apply_var_pairs(acc, acc_schema, var_pairs)
    if order == "auto" and list(planned) != list(patterns):
        # restore the documented output-column contract (given-order
        # first-seen) -- a projection, not a shuffle
        given_cols = list(required_schema)
        acc = acc.map_batches(
            lambda df, cols=tuple(given_cols): df.reindex(columns=list(cols)),
            batch_format="pandas",
        )
        acc_schema = {v: "object" for v in given_cols}
    if values is not None:
        names, rows = values
        vnames = []
        for v in names:
            if not _is_var(v):
                raise ValueError(f"VALUES name {v!r} must be a ?variable")
            vnames.append(v[1:])
        vdf = pd.DataFrame(list(rows), columns=vnames).astype("object")
        if vdf.isna().any().any():
            raise ValueError(
                "UNDEF (None) in VALUES is not supported -- union explicit "
                "VALUES clauses per defined-column subset instead"
            )
        vdf = vdf.drop_duplicates()
        shared = [v for v in vnames if v in acc_schema]
        if not shared:
            raise ValueError(
                "VALUES shares no variable with the required match -- a "
                "disconnected VALUES is a cartesian product"
            )
        import ray.data as rd

        acc = bucketed_join(
            acc,
            rd.from_pandas(vdf),
            on=shared,
            left_schema=acc_schema,
            right_schema={v: "object" for v in vnames},
        )
        acc_schema = {**acc_schema, **{v: "object" for v in vnames}}
    for group in minus:
        if group and isinstance(group[0], str):
            raise ValueError(
                f"minus entry {group} is a bare pattern -- each entry is a "
                "pattern GROUP; wrap it in a list: minus=[[pattern]]"
            )
        sub = bgp_match(triples, group)
        sub_schema: dict[str, str] = {}
        for pattern in group:
            for pos, term in zip(_POS, pattern):
                if _is_var(term):
                    sub_schema.setdefault(term[1:], "object")
        shared = [v for v in acc_schema if v in sub_schema]
        if not shared:
            raise ValueError(
                f"minus group {group} shares no variable with the required "
                "match -- a disconnected negation is either a no-op (MINUS) "
                "or all-or-nothing (NOT EXISTS); neither is ever the plan"
            )
        keys = sub.map_batches(
            lambda df, cols=tuple(shared): df[list(cols)].drop_duplicates(),
            batch_format="pandas",
        )
        acc = bucketed_join(
            acc,
            keys,
            on=shared,
            how="anti",
            left_schema=acc_schema,
            right_schema={v: "object" for v in shared},
        )
    required_vars = set(acc_schema)
    for pattern in optional:
        scan, scan_schema = _scan(triples, pattern)
        shared = [v for v in scan_schema if v in required_vars]
        if not shared:
            raise ValueError(
                f"optional pattern {pattern} shares no variable with the "
                "required match"
            )
        # optionals are independent of each other (docstring contract):
        # a variable bound by a PREVIOUS optional may not reappear here --
        # it would need optional-on-optional scoping, which this matcher
        # does not model.  Validate the precondition loudly instead of
        # letting the join trip over a duplicate non-key column.
        from_other_optional = [
            v for v in scan_schema if v in acc_schema and v not in required_vars
        ]
        if from_other_optional:
            raise ValueError(
                f"optional pattern {pattern} reuses variable(s) "
                f"{from_other_optional} bound by a previous OPTIONAL -- "
                "optional-on-optional scoping is not modeled; merge the "
                "two optionals into one pattern group or make the shared "
                "variable part of the required prefix"
            )
        acc = bucketed_join(
            acc,
            scan,
            on=shared,
            how="left",
            left_schema=acc_schema,
            right_schema=scan_schema,
        )
        acc_schema = {**acc_schema, **scan_schema}
    return acc


def _group_schema(group: Sequence[Sequence[str]]) -> dict[str, str]:
    """Variable columns a conjunctive pattern group binds, in first-seen
    order (matches bgp_match's output schema)."""
    schema: dict[str, str] = {}
    for pattern in group:
        for term in pattern:
            if _is_var(term):
                schema.setdefault(term[1:], "object")
    return schema


def bgp_union(triples, groups: Sequence[Sequence[Sequence[str]]]):
    """SPARQL UNION: each entry is a conjunctive pattern GROUP matched as
    its own BGP; the result is the set union of the branch solution
    mappings (SELECT DISTINCT semantics).

    Branches need NOT bind the same variables -- a variable absent from
    a branch is unbound (NULL) in that branch's rows, exactly SPARQL's
    solution-mapping union.  Each branch pads the missing columns with
    NULL in one vectorized pass, the branch Datasets union lazily (a
    metadata-only concat -- no data moves), and ONE bucketed distinct
    over all binding columns removes cross-branch duplicates.  The
    bucket hash (`hash_pandas_object`) is null-consistent, so rows equal
    up to NULLs co-locate; per-branch results are already distinct
    (store distinctness, see bgp_match), so the dedup shuffle carries
    only the final binding relation.
    """
    if not groups:
        raise ValueError("empty group list")
    if groups[0] and isinstance(groups[0][0], str):
        raise ValueError(
            f"union entry {groups[0]} is a bare pattern -- each entry is a "
            "pattern GROUP; wrap it in a list: groups=[[pattern, ...], ...]"
        )
    branches = [(bgp_match(triples, g), _group_schema(g)) for g in groups]
    all_vars: list[str] = []
    for _, schema in branches:
        for v in schema:
            if v not in all_vars:
                all_vars.append(v)

    def pad(df: pd.DataFrame, missing: tuple, order: tuple) -> pd.DataFrame:
        out = df.copy()
        for v in missing:
            out[v] = pd.Series(None, index=out.index, dtype=object)
        return out[list(order)]

    padded = []
    for branch, schema in branches:
        missing = tuple(v for v in all_vars if v not in schema)
        padded.append(
            branch.map_batches(
                lambda df, m=missing, o=tuple(all_vars): pad(df, m, o),
                batch_format="pandas",
            )
        )
    u = padded[0]
    for p in padded[1:]:
        u = u.union(p)
    return grouped_apply(u, all_vars, lambda g: g.drop_duplicates())


def construct_triples(
    triples,
    where: Sequence[Sequence[str]],
    template: Sequence[Sequence[str]],
):
    """SPARQL CONSTRUCT: match the ``where`` BGP, instantiate every
    ``template`` pattern once per solution, and return the resulting
    RDF graph as a distinct (subj, pred, obj) Dataset -- the
    entailment-materialization primitive a KG-construction pipeline runs
    (derive inverse edges, propagate types across sameAs, reify
    shortcuts) whose output lands back in the store's native shape.

    Execution: bindings stream out of bgp_match; ONE vectorized
    map_batches pass emits all template instantiations (len(template)
    column projections per batch -- constants become scalar columns,
    no row loop); distinct solutions can instantiate the SAME triple
    (the template drops variables), so one bucketed distinct on the
    triple key finishes the graph.  Per SPARQL, zero solutions produce
    the empty graph even for ground template patterns.
    """
    if not template:
        raise ValueError("empty template")
    bound = _group_schema(where)
    for pattern in template:
        if len(pattern) != 3:
            raise ValueError(f"template pattern {pattern} is not a triple")
        for term in pattern:
            if _is_var(term) and term[1:] not in bound:
                raise ValueError(
                    f"template term {term} is not bound by the WHERE clause "
                    f"(bound: {sorted(bound)})"
                )

    def instantiate(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for pattern in template:
            cols = {}
            for pos, term in zip(_POS, pattern):
                if _is_var(term):
                    cols[pos] = df[term[1:]].reset_index(drop=True)
                else:
                    cols[pos] = pd.Series(term, index=range(len(df)), dtype=object)
            outs.append(pd.DataFrame(cols))
        return pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    inst = bgp_match(triples, where).map_batches(instantiate, batch_format="pandas")
    return grouped_apply(inst, list(_POS), lambda g: g.drop_duplicates())


def _distinct_pairs_so(ds):
    """Bucketed distinct on an (s, o) pair Dataset."""
    return grouped_apply(ds, ["s", "o"], lambda g: g.drop_duplicates())


def _node_universe(triples):
    """The store's node table: DISTINCT(subj) UNION DISTINCT(obj), the
    term universe SPARQL 1.1's zero-length path quantifies over (spec:
    a zero-length path matches every graph term with itself; predicates
    are not nodes).  ONE pass over the store (each block emits its
    deduped subj+obj values) + one bucketed distinct -- the node table
    is vocabulary-sized, never materialized on the driver."""
    both = triples.map_batches(
        lambda df: pd.DataFrame(
            {"n": pd.concat([df["subj"], df["obj"]], ignore_index=True).drop_duplicates()}
        ),
        batch_format="pandas",
    )
    return grouped_apply(both, ["n"], lambda g: g.drop_duplicates())


def path_pairs(triples, path, max_rounds: int = 16):
    """Evaluate a SPARQL 1.1 property-path expression to the Dataset of
    DISTINCT ``(s, o)`` endpoint pairs it connects.

    Path AST (nested tuples; a bare string is a predicate IRI):

    * ``"p"``                 -- a single edge with predicate ``p``
    * ``("inv", path)``       -- inverse path ``^p`` (endpoints swap)
    * ``("seq", p1, p2, ...)``-- sequence ``p1/p2/...``
    * ``("alt", p1, p2, ...)``-- alternation ``p1|p2|...``
    * ``("plus", path)``      -- one-or-more ``p+`` (transitive closure)
    * ``("star", path)``      -- zero-or-more ``p*``
    * ``("opt", path)``       -- zero-or-one ``p?``

    ``star`` and ``opt`` include the zero-length path, whose SPARQL 1.1
    solution set is every node of the graph paired with itself.  The
    node universe is EXPLICIT: ``_node_universe(triples)`` -- the
    distinct subjects-union-objects of the store the path runs over
    (predicates are not nodes).  It rides the same bucketed exchanges
    as any relation; nothing implicit materializes on the driver.

    Execution shape: a predicate leaf is one pushdown scan off the
    pinned store; ``seq`` composes step relations with one bucketed
    join + one bucketed distinct per step (two paths to the same
    endpoint pair must collapse BEFORE the next join or intermediate
    sizes grow multiplicatively); ``alt`` is a lazy union + one
    distinct; ``plus`` reuses ``graph.transitive_closure`` -- iterative
    relation-doubling whose per-round shuffle is the reachable-pair
    frontier, with the driver holding only the fixpoint loop counter.
    Distinctness of every sub-result is the invariant that keeps join
    inputs set-sized, mirroring SPARQL's cycle-safe path semantics
    (endpoint pairs, not walks -- walks through a cycle would be
    infinite)."""
    if isinstance(path, str):
        scan, _ = _scan(triples, ("?s", path, "?o"))
        return scan  # store distinctness => already a set
    op = path[0]
    if op in ("inv", "plus", "star", "opt") and len(path) != 2:
        raise ValueError(f"{op} path {path} takes exactly one inner path")
    if op == "inv":
        inner = path_pairs(triples, path[1], max_rounds)
        return inner.map_batches(
            lambda df: pd.DataFrame({"s": df["o"], "o": df["s"]}),
            batch_format="pandas",
        )
    if op == "seq":
        if len(path) < 3:
            raise ValueError(f"seq path {path} needs >= 2 parts")
        acc = path_pairs(triples, path[1], max_rounds)
        for part in path[2:]:
            step = path_pairs(triples, part, max_rounds).map_batches(
                lambda df: pd.DataFrame({"o": df["s"], "o2": df["o"]}),
                batch_format="pandas",
            )
            acc = bucketed_join(
                acc,
                step,
                on=["o"],
                left_schema={"s": "object", "o": "object"},
                right_schema={"o": "object", "o2": "object"},
            ).map_batches(
                lambda df: pd.DataFrame({"s": df["s"], "o": df["o2"]}),
                batch_format="pandas",
            )
            acc = _distinct_pairs_so(acc)
        return acc
    if op == "alt":
        if len(path) < 3:
            raise ValueError(f"alt path {path} needs >= 2 branches")
        u = path_pairs(triples, path[1], max_rounds)
        for part in path[2:]:
            u = u.union(path_pairs(triples, part, max_rounds))
        return _distinct_pairs_so(u)
    if op == "plus":
        from ontology_time_machine_ray.stages.graph import transitive_closure

        edges = path_pairs(triples, path[1], max_rounds).map_batches(
            lambda df: pd.DataFrame({"a": df["s"], "b": df["o"]}),
            batch_format="pandas",
        )
        closed = transitive_closure(edges, max_rounds=max_rounds)
        return closed.map_batches(
            lambda df: pd.DataFrame({"s": df["a"], "o": df["b"]}),
            batch_format="pandas",
        )
    if op in ("star", "opt"):
        # zero-length leg: every store node paired with itself
        zero = _node_universe(triples).map_batches(
            lambda df: pd.DataFrame({"s": df["n"], "o": df["n"]}),
            batch_format="pandas",
        )
        inner = ("plus", path[1]) if op == "star" else path[1]
        nonzero = path_pairs(triples, inner, max_rounds)
        # a closure pair (x, x) from a cycle collapses into the
        # zero-length pair here -- SPARQL's set semantics
        return _distinct_pairs_so(zero.union(nonzero))
    raise ValueError(f"unknown path operator {op!r} in {path}")


def path_match(triples, path, s_name: str = "s", o_name: str = "o",
               max_rounds: int = 16):
    """``path_pairs`` with caller-named binding columns -- the form a
    SELECT projects (``?start (p1/p2)+ ?end``)."""
    pairs = path_pairs(triples, path, max_rounds)
    if (s_name, o_name) == ("s", "o"):
        return pairs
    return pairs.map_batches(
        lambda df: pd.DataFrame({s_name: df["s"], o_name: df["o"]}),
        batch_format="pandas",
    )


#: SELECT aggregation operators.  Set semantics throughout: bgp_match
#: yields DISTINCT bindings, so ``count`` counts solutions (SPARQL
#: SELECT DISTINCT + COUNT(*)), and min/max are lexicographic on the
#: ASCII IRIs (= ANSI-SQL string collation).
_AGG_OPS = ("count", "count_distinct", "min", "max", "sum")


def bgp_select(
    triples,
    patterns: Sequence[Sequence[str]],
    *,
    filters: Sequence[Sequence[str]] = (),
    optional: Sequence[Sequence[str]] = (),
    minus: Sequence[Sequence[Sequence[str]]] = (),
    group_by: Sequence[str] | None = None,
    aggs: dict[str, tuple[str, str]] | None = None,
    order_by: Sequence[tuple[str, str]] | None = None,
    limit: int | None = None,
    having: Sequence[tuple] = (),
    values: tuple[Sequence[str], Sequence[Sequence[str]]] | None = None,
    order: str = "given",
    stats: dict[str, int] | None = None,
    binds: dict | None = None,
):
    """SPARQL SELECT over a BGP with solution modifiers: GROUP BY +
    aggregates, ORDER BY, LIMIT.

    ``group_by``: list of ``?variables`` to group on.  ``aggs``: output
    column -> ``(op, ?variable)`` with op in ``count`` (solutions per
    group; the variable is ignored, pass ``"*"``), ``count_distinct``,
    ``min``, ``max``, ``sum`` (sum needs a NUMERIC variable -- an int64
    BIND output like strlen; IRI bindings are strings and would
    concatenate silently).  ``having``: post-aggregate filter clauses
    ``(output_column, op, rhs)`` over the FILTER op set, applied as a
    vectorized mask after the aggregates (each group is one row by
    then -- no exchange); requires ``group_by``.  ``order_by``:
    ``[(output_column, "asc"|"desc")]``.  ``limit``: top-k row cap
    (requires ``order_by`` for determinism).
    Like FILTER, GROUP BY and aggregate variables scope to the REQUIRED
    group: a variable bound only by an OPTIONAL clause may be unbound,
    and SPARQL's unbound-aware aggregate semantics (NULL group,
    COUNT-DISTINCT ignoring unbound) are not modeled -- such variables
    error loudly.

    Execution shape: plain aggregates are ONE bucketed exchange on the
    group key (`grouped_aggregate`); each COUNT(DISTINCT v) is a
    bucketed dedup of the (group, v) pair relation followed by a
    per-group size -- the pair dedup buckets on BOTH columns, so a hot
    group key spreads across buckets instead of melting one (the
    two-level distinct-count plan).  Pieces re-join on the group key
    with schema hints (single execution per stage).  ORDER BY + LIMIT
    is a distributed partial top-k: every block emits its own first-k,
    one coalesced final pass keeps the global first-k -- the driver
    never sees more than blocks x k rows.  Ties beyond ``order_by`` are
    broken by the remaining output columns ascending, making the result
    deterministic (and matching an oracle that ORDER BYs all columns).
    """
    group_by = list(group_by or [])
    aggs = dict(aggs or {})
    if aggs and not group_by:
        raise ValueError("aggs require group_by (no implicit single group)")
    if group_by and not aggs:
        raise ValueError("group_by without aggs: just project the bindings")
    if limit is not None and not order_by:
        raise ValueError("limit without order_by is nondeterministic")

    bindings = bgp_match(
        triples, patterns, optional=optional, minus=minus, filters=filters,
        values=values, order=order, stats=stats,
    )
    required_schema = _group_schema(patterns)
    if values is not None:
        # VALUES-only variables join the binding schema as new columns
        for v in values[0]:
            if _is_var(v):
                required_schema.setdefault(v[1:], "object")
    schema = dict(required_schema)
    for pattern in optional:
        schema.update(_group_schema([pattern]))
    if binds:
        # BIND evaluates inside the group pattern (SPARQL sequential
        # scoping), so GROUP BY / aggregates may use its outputs -- but
        # only a REQUIRED-scope derivation may join the required schema:
        # a bind over an OPTIONAL-only variable sees unbound (NULL)
        # inputs, exactly the unbound-aggregate semantics this function
        # rejects (see _require_required); error loudly instead
        grown = dict(required_schema)
        for out, spec in binds.items():
            for arg in spec[1:]:
                if isinstance(arg, str) and _is_var(arg) and arg[1:] not in grown:
                    if arg[1:] in schema:
                        raise ValueError(
                            f"BIND {out}: variable {arg} is bound only by an "
                            "OPTIONAL clause -- BIND inputs scope to the "
                            "required group (unbound-aware expression "
                            "semantics are not modeled)"
                        )
            grown[out] = "object"
        bindings, schema = bind_columns(bindings, schema, binds)
        for out in binds:
            required_schema.setdefault(out, schema[out])

    def _require_required(v: str, role: str) -> str:
        """Aggregation scopes to the REQUIRED group, like FILTER: an
        optional-only variable may be unbound (NULL), and SPARQL's
        NULL-group / ignore-unbound aggregate semantics diverge from the
        pandas machinery here (dropna groupby, None counted distinct,
        object-min TypeError) -- reject loudly instead of being subtly
        wrong."""
        if not _is_var(v):
            raise ValueError(f"{role} term {v!r} must be a ?variable")
        if v[1:] in required_schema:
            return v[1:]
        if v[1:] in schema:
            raise ValueError(
                f"{role} variable {v} is bound only by an OPTIONAL clause "
                "-- GROUP BY / aggregates scope to the required group "
                "(unbound-aware aggregate semantics are not modeled)"
            )
        raise ValueError(f"{role} variable {v} is not bound")

    if group_by:
        gvars = [_require_required(v, "group_by") for v in group_by]
        plain: dict[str, tuple[str, str]] = {}
        distincts: list[tuple[str, str]] = []
        for out, (op, var) in aggs.items():
            if op not in _AGG_OPS:
                raise ValueError(f"unknown agg op {op!r} (have {_AGG_OPS})")
            if out in schema or out in gvars:
                raise ValueError(f"agg output {out!r} collides with a variable")
            if op == "count":
                plain[out] = (gvars[0], "size")
                continue
            var = "?" + _require_required(var, f"agg {out}")
            if op == "sum" and schema.get(var[1:]) != "int64":
                raise ValueError(
                    f"agg {out}: sum needs a numeric variable (an int64 "
                    "BIND output like strlen); IRI bindings are strings"
                )
            if op == "count_distinct":
                distincts.append((out, var[1:]))
            else:
                plain[out] = (var[1:], op)

        obj_schema = {c: "object" for c in gvars}
        pieces: list[tuple[object, dict]] = []
        if plain:
            pieces.append(
                (
                    grouped_aggregate(bindings, gvars, plain),
                    {
                        **obj_schema,
                        **{
                            out: ("int64" if how in ("size", "sum") else "object")
                            for out, (_, how) in plain.items()
                        },
                    },
                )
            )
        for out, var in distincts:
            cols = gvars + ([var] if var not in gvars else [])
            proj = bindings.map_batches(
                lambda df, cols=cols: df[cols].drop_duplicates(),
                batch_format="pandas",
            )
            pairs = grouped_apply(proj, cols, lambda g: g.drop_duplicates())
            pieces.append(
                (
                    grouped_aggregate(pairs, gvars, {out: (var, "size")}),
                    {**obj_schema, out: "int64"},
                )
            )
        acc, acc_schema = pieces[0]
        for piece, piece_schema in pieces[1:]:
            acc = bucketed_join(
                acc,
                piece,
                on=gvars,
                left_schema=acc_schema,
                right_schema=piece_schema,
            )
            acc_schema = {**acc_schema, **piece_schema}
        out_cols = gvars + list(aggs)
        result = acc.map_batches(
            lambda df: df.reindex(columns=out_cols), batch_format="pandas"
        )
        if having:
            # HAVING: a vectorized post-aggregate filter -- each group is
            # one row by now, so this is an in-batch mask, no exchange
            hav = []
            for clause in having:
                if len(clause) != 3:
                    raise ValueError(f"having {clause} is not (col, op, rhs)")
                col, hop, rhs = clause
                if hop not in _FILTER_OPS:
                    raise ValueError(
                        f"unknown having op {hop!r} (have {sorted(_FILTER_OPS)})"
                    )
                if col not in out_cols:
                    raise ValueError(
                        f"having column {col!r} not in output {out_cols}"
                    )
                hav.append((col, hop, rhs))

            def apply_having(df: pd.DataFrame) -> pd.DataFrame:
                mask = pd.Series(True, index=df.index)
                for col, hop, rhs in hav:
                    mask &= _FILTER_OPS[hop](df[col], rhs)
                return df[mask]

            result = result.map_batches(apply_having, batch_format="pandas")
    else:
        if having:
            raise ValueError("having requires group_by aggregates")
        out_cols = list(schema)
        result = bindings

    if order_by:
        by, asc = [], []
        for col, direction in order_by:
            if col not in out_cols:
                raise ValueError(f"order_by column {col!r} not in output {out_cols}")
            if direction not in ("asc", "desc"):
                raise ValueError(f"order_by direction {direction!r}")
            by.append(col)
            asc.append(direction == "asc")
        for col in out_cols:  # total order => deterministic LIMIT cut
            if col not in by:
                by.append(col)
                asc.append(True)

        if limit is not None:

            def head_block(df: pd.DataFrame) -> pd.DataFrame:
                return df.sort_values(by, ascending=asc, kind="stable").head(limit)

            result = result.map_batches(head_block, batch_format="pandas")
            result = result.repartition(1).map_batches(
                head_block, batch_format="pandas"
            )
        else:
            # no row cap => a real global sort (range-partitioned exchange)
            result = result.sort(by, descending=[not a for a in asc])
    return result


def bgp_ask(triples, patterns: Sequence[Sequence[str]], **kwargs) -> bool:
    """SPARQL ASK: does at least one solution exist?  ``limit(1)``
    stops the streaming executor at the first output row -- which skips
    work only up to the first all-to-all barrier: a single-pattern ASK
    can stop after the first scanned partition, but a multi-pattern BGP
    joins through a bucketed groupby exchange, so its scans run in full
    before the first row exists (the limit then saves only the
    post-join tail).  Accepts every ``bgp_match`` keyword."""
    return len(bgp_match(triples, patterns, **kwargs).limit(1).take(1)) > 0


def describe_resource(triples, iri: str):
    """SPARQL DESCRIBE (symmetric concise form): every triple where the
    resource appears as subject OR object -- one vectorized pushdown
    scan, no shuffle (the union of two masks in a single pass)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df[(df["subj"] == iri) | (df["obj"] == iri)]

    return triples.map_batches(fn, batch_format="pandas")


#: BIND expression operators -> vectorized pandas evaluator.  Each takes
#: the binding frame and the (already-resolved) argument list, where an
#: argument is either a bound column Series or a literal string; all
#: restate SPARQL 1.1 string builtins with ANSI-SQL twins (STRLEN/
#: CONCAT/STRBEFORE/STRAFTER/UCASE/LCASE/REPLACE).  strbefore/strafter
#: return '' when the needle is absent -- SPARQL's exact semantics
#: (and SQL's, via the split trick in the oracle).
def _bind_strlen(a):
    return a[0].str.len().astype("int64")


def _bind_concat(a):
    # every part is stringified (SPARQL CONCAT is string-typed; an int64
    # BIND output concatenates as its decimal form, matching SQL concat)
    out = None
    for part in a:
        part = part.astype(str) if isinstance(part, pd.Series) else part
        out = part if out is None else out + part
    return out


def _bind_strbefore(a):
    # regex=False: the needle is a LITERAL substring (SPARQL STRBEFORE),
    # never a pattern -- pandas' split defaults to regex for len > 1
    parts = a[0].str.split(a[1], n=1, regex=False)
    return parts.str[0].where(parts.str.len() > 1, "")


def _bind_strafter(a):
    parts = a[0].str.split(a[1], n=1, regex=False)
    return parts.str[1].where(parts.str.len() > 1, "")


_BIND_OPS = {
    "strlen": (1, 1, _bind_strlen),
    "concat": (2, 9, _bind_concat),
    "strbefore": (2, 2, _bind_strbefore),
    "strafter": (2, 2, _bind_strafter),
    "ucase": (1, 1, lambda a: a[0].str.upper()),
    "lcase": (1, 1, lambda a: a[0].str.lower()),
    "replace": (3, 3, lambda a: a[0].str.replace(a[1], a[2], regex=True)),
}


def bind_columns(bindings, schema: dict, binds: dict):
    """SPARQL BIND: extend a binding Dataset with computed columns, one
    vectorized in-batch pass, zero shuffles (BIND is projection -- rows
    neither die nor multiply).  ``binds``: new column -> ``(op, arg,
    ...)`` where each arg is a ``?variable`` (must be bound) or a string
    literal; ops: ``strlen concat strbefore strafter ucase lcase
    replace``.  Binds evaluate in dict order and may reference earlier
    BIND outputs (SPARQL's sequential scoping).  Returns (Dataset,
    extended schema)."""
    schema = dict(schema)
    plans: list[tuple[str, object, list]] = []
    for out, spec in binds.items():
        if out in schema:
            raise ValueError(f"BIND output {out!r} collides with a bound variable")
        op, args = spec[0], list(spec[1:])
        if op not in _BIND_OPS:
            raise ValueError(f"unknown BIND op {op!r} (have {sorted(_BIND_OPS)})")
        lo, hi, _ = _BIND_OPS[op]
        if not (lo <= len(args) <= hi):
            raise ValueError(f"BIND {out}: {op} takes {lo}..{hi} args, got {len(args)}")
        for arg in args:
            if not isinstance(arg, str):
                raise ValueError(f"BIND {out}: arg {arg!r} must be a string")
            if _is_var(arg) and arg[1:] not in schema:
                raise ValueError(f"BIND {out}: variable {arg} is not bound")
        if not any(_is_var(a) for a in args):
            raise ValueError(f"BIND {out}: at least one arg must be a ?variable")
        if op in ("strbefore", "strafter", "replace") and any(
            _is_var(a) for a in args[1:]
        ):
            raise ValueError(
                f"BIND {out}: {op} needs literal needle/replacement args"
            )
        plans.append((out, op, args))
        schema[out] = "object" if op != "strlen" else "int64"

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for out, op, args in plans:
            resolved = [df[a[1:]] if _is_var(a) else a for a in args]
            df[out] = _BIND_OPS[op][2](resolved)
        return df

    return bindings.map_batches(apply, batch_format="pandas"), schema
