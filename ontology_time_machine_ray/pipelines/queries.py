"""Query registry: every implemented operator as a named callable.

``QUERIES[name](sf_dir)`` runs the Ray pipeline; ``oracle_sql_for(sf_dir)``
returns the matching DuckDB statements (SQL-expressible subset).  Column
names are contract: they match the SQL aliases exactly so the driver's
order-insensitive value-hash comparison is meaningful.
"""

from __future__ import annotations

import os
from dataclasses import replace

import pandas as pd

from ontology_time_machine_ray.config import DEFAULT_CONFIG
from ontology_time_machine_ray.fixtures import FixturePaths, ensure_fixtures
from ontology_time_machine_ray.pipelines import relational, sql_oracles
from ontology_time_machine_ray.pipelines.kg import KgPipeline
from ontology_time_machine_ray.stages import dedup_docs, media, similarity, textops
from ontology_time_machine_ray.stages.canonicalize import connected_components, sameas_edges


def _pipe(sf_dir: str) -> KgPipeline:
    return KgPipeline.for_sf_dir(sf_dir)


# ------------------------------- KG family --------------------------- #
def kg_mentions(sf_dir: str):
    return _pipe(sf_dir).mentions().select_columns(
        ["doc_id", "span_idx", "term_iri", "ontology_id", "canonical_iri"]
    )


#: (sf_dir, driver node id) -> materialized (subj, pred, obj) store
_SPO_CACHE: dict = {}


def _ray_session_key():
    """Fingerprint of the LIVE Ray cluster instance.  The driver's node
    id is freshly random per started cluster; job ids are NOT (a local
    cluster restarts numbering at 01000000, so shutdown+init would
    collide a stale cache key and serve datasets whose objects died with
    the old session)."""
    import ray

    return (
        ray.get_runtime_context().get_node_id() if ray.is_initialized() else None
    )


def _spo_store(sf_dir: str):
    """The deduped ``(subj, pred, obj)`` triple store, materialized ONCE
    per (sf_dir, Ray session) and shared by every graph/SPARQL query:
    their detect->link->dedup prefix is identical, so one build serves
    all -- the analog of querying a persisted store instead of
    rebuilding it per query.  The store is vocabulary-sized (never
    corpus-sized), so the pin costs what each caller's per-query
    materialize already paid; entries from dead Ray sessions are dropped
    (their object refs are gone)."""
    hit = _SPO_CACHE.get((sf_dir, _ray_session_key()))
    if hit is not None:
        return hit
    ds = (
        _pipe(sf_dir).triples().select_columns(["subj", "pred", "obj"]).materialize()
    )
    key = _ray_session_key()  # materialize may have init'd Ray
    for k in [k for k in _SPO_CACHE if k[1] != key]:
        del _SPO_CACHE[k]
    _SPO_CACHE[(sf_dir, key)] = ds
    return ds


def kg_status(sf_dir: str):
    return _pipe(sf_dir).status()


def kg_report(sf_dir: str):
    return _pipe(sf_dir).report()


def kg_triples(sf_dir: str):
    return _pipe(sf_dir).triples()


def kg_head_status(sf_dir: str):
    """Per-method outcome counts over a corpus whose documents carry a
    deterministic GET/HEAD request verb (~1/8 HEAD;
    ``fixtures.add_method_column``).  The reference distinguishes the
    verbs at fetch time (``requests.head`` vs ``requests.get``,
    proxy_logic.py:147-159) but routes them identically -- negotiation,
    policy dispatch, failover and status are method-INdependent, which
    this aggregate makes visible: each (method, category) cell is just
    a reweighted slice of kg_report's category counts."""
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    p = KgPipeline.for_sf_dir(sf_dir, with_method=True)

    def count_bucket(g):
        out = g.groupby(["method", "category"], as_index=False).agg(
            n=("doc_id", "size")
        )
        return out.rename(columns={"n": "count()"})

    return grouped_apply(p.status(), ["method", "category"], count_bucket)


def kg_head_requests(sf_dir: str):
    """The deduped triple store built from the method-annotated corpus:
    HEAD requests resolve fully (same status/category as GET) but their
    responses are headers-only (``requests.head``,
    proxy_logic.py:147-159), so they emit NO content-derived triples --
    the linker masks HEAD rows out of triple emission while the status
    stream keeps them.  Rows whose only serving requests were HEAD
    drop relative to kg_triples; min-doc provenance skips HEAD docs."""
    p = KgPipeline.for_sf_dir(sf_dir, with_method=True)
    return p.triples()


def kg_report_ab(sf_dir: str) -> pd.DataFrame:
    """Proxy-vs-direct A/B comparison report (the reference's two-scenario
    side-by-side table, experiments/aggregate_results.py:22-35,167-187):
    the SAME corpus routed under policy ``original`` (direct-to-origin)
    and ``originalFailoverLiveLatest`` (proxy with Archivo failover),
    category x format counts side by side.  Fused plan: the two
    policies ride ONE ``MultiConfigLinker`` actor-pool pass (the
    class generalizes to ANY per-coordinate config difference -- here
    the version POLICY, not the timestamp), so the corpus is detected
    and linked once, a per-batch combiner collapses to (coord,
    category, format) partials, and only the two ~28-row aggregates
    meet on the driver for the pivot."""
    from ontology_time_machine_ray.config import OntoVersion
    from ontology_time_machine_ray.stages.groupagg import grouped_apply
    from ontology_time_machine_ray.stages.link import MultiConfigLinker

    p = _pipe(sf_dir)
    from ontology_time_machine_ray.pipelines.kg import _default_pool_size

    cfgs = [
        p.with_policy(OntoVersion.ORIGINAL).config,
        p.with_policy(OntoVersion.ORIGINAL_FAILOVER_LIVE_LATEST).config,
    ]
    tagged = p.mentions().map_batches(
        MultiConfigLinker,
        fn_constructor_kwargs={
            "origins_path": p.paths.origins,
            "content_path": p.paths.snapshot_content,
            "status_path": p.paths.snapshot_status,
            "configs": cfgs,
            "emit": "status",
        },
        batch_format="pyarrow",
        batch_size=p.batch_size,
        concurrency=p.link_concurrency or _default_pool_size(),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["coord", "category", "format"], dropna=False, as_index=False
        ).agg(n=("doc_id", "size"))

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: format is nullable and the NULL-format bucket is
        # a real report row (same contract as KgPipeline.report)
        return g.groupby(
            ["coord", "category", "format"], dropna=False, as_index=False
        ).agg(n=("n", "sum"))

    counts = grouped_apply(
        tagged.map_batches(partial, batch_format="pandas"),
        ["coord", "category", "format"],
        sum_bucket,
    ).to_pandas()
    a = counts[counts["coord"] == 0].rename(columns={"n": "n_original"})
    b = counts[counts["coord"] == 1].rename(columns={"n": "n_failover"})
    out = a[["category", "format", "n_original"]].merge(
        b[["category", "format", "n_failover"]],
        on=["category", "format"],
        how="outer",  # NaN keys match
    )
    for c in ("n_original", "n_failover"):
        out[c] = out[c].fillna(0).astype("int64")
    return out.sort_values(["category", "format"]).reset_index(drop=True)


def kg_triples_canonical(sf_dir: str):
    return _pipe(sf_dir).triples_canonical()


#: the second (earlier) time-machine coordinate for the version diff.
KG_DIFF_OLD_TS = "2020-06-01"


def kg_version_diff(sf_dir: str):
    """Time-machine diff: the SAME corpus resolved at two time
    coordinates (the reference's whole premise -- timestamp-resolved
    ontology versions, proxy_logic.py's timestampArchived / as-of
    resolution), emitting every triple whose existence or resolved
    ontology version changed between ``KG_DIFF_OLD_TS`` and the default
    T.  Fused plan: ONE multi-coordinate linker pass tags both legs
    (``triples_tagged_at`` -- snapshot state loaded once, mention stream
    read once), a per-batch combiner keeps each batch's per-(coord, key)
    dedup winner, and a single subj-bucketed pass finishes the exact
    winner selection (same (doc_id, ontology_version, format) tie order
    as the store dedup, so each leg reproduces ``triples_at`` bit-for-
    bit) AND the old/new diff -- corpus-scale data crosses exactly one
    exchange and never meets the driver.  Absent sides carry '' (a
    version string is never empty) so the output stays string-typed."""
    from ontology_time_machine_ray.stages.dedup import _KEY, _TIE
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    p = _pipe(sf_dir)
    ckey = ["coord"] + _KEY

    def local_winner(df: pd.DataFrame) -> pd.DataFrame:
        cols = ckey + _TIE
        if len(df) == 0:
            return df.reindex(columns=cols)
        return (
            df.sort_values(cols, kind="stable")
            .drop_duplicates(ckey, keep="first")[cols]
        )

    tagged = p.triples_tagged_at([KG_DIFF_OLD_TS, p.config.timestamp]).map_batches(
        local_winner, batch_format="pandas"
    )

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # finish the per-leg dedup (the global head-1 picks the same
        # winner as any pre-combined subset under the same sort order)
        g = g.sort_values(ckey + _TIE, kind="stable").drop_duplicates(
            ckey, keep="first"
        )
        coord = g["coord"].to_numpy()
        out = g[_KEY + ["doc_id"]].copy()
        out["version_old"] = g["ontology_version"].where(coord == 0, "")
        out["version_new"] = g["ontology_version"].where(coord == 1, "")
        m = out.groupby(_KEY + ["doc_id"], as_index=False).agg(
            version_old=("version_old", "max"), version_new=("version_new", "max")
        )
        m = m[m["version_old"] != m["version_new"]].copy()
        m["change"] = "moved"
        m.loc[m["version_old"] == "", "change"] = "added"
        m.loc[m["version_new"] == "", "change"] = "removed"
        return m

    return grouped_apply(tagged, ckey, diff_bucket, bucket_keys=["subj"])


def kg_download_log(sf_dir: str):
    """M16 JSON flattener, on the reference's REAL record shape: the
    nested download-log documents (experiments/download_ontologies.py:
    53-148) flattened to one typed row per (url, format) -- status,
    timing, length, error type and error-chain depth -- in a distributed
    ``map_batches`` pass (a log document lives in one row; the parse is
    embarrassingly parallel).  Oracle: DuckDB's JSON functions over the
    same documents."""
    import json as _json

    import ray.data as rd

    paths = ensure_fixtures(sf_dir)

    def flatten(df: pd.DataFrame) -> pd.DataFrame:
        out = {
            "url": [], "fmt": [], "status_code": [],
            "request_duration_ms": [], "content_length": [],
            "error_type": [], "error_chain_len": [],
        }
        for j in df["log_json"]:
            rec = _json.loads(j)
            for fmt, d in rec["downloads"].items():
                err = d.get("error") or {}
                out["url"].append(rec["url"])
                out["fmt"].append(fmt)
                out["status_code"].append(int(d["status_code"]))
                out["request_duration_ms"].append(int(d["request_duration_ms"]))
                out["content_length"].append(int(d["content_length"]))
                out["error_type"].append(err.get("type"))
                out["error_chain_len"].append(len(err.get("chain_details", [])))
        return pd.DataFrame(
            {
                "url": pd.Series(out["url"], dtype="object"),
                "fmt": pd.Series(out["fmt"], dtype="object"),
                "status_code": pd.Series(out["status_code"], dtype="int64"),
                "request_duration_ms": pd.Series(
                    out["request_duration_ms"], dtype="int64"
                ),
                "content_length": pd.Series(out["content_length"], dtype="int64"),
                "error_type": pd.Series(out["error_type"], dtype="object"),
                "error_chain_len": pd.Series(out["error_chain_len"], dtype="int64"),
            }
        )

    return rd.read_parquet(paths.download_log).map_batches(
        flatten, batch_format="pandas"
    )


def kg_nir_report(sf_dir: str) -> pd.DataFrame:
    """A4 NIR-check aggregate (aggregate_results_NIRcheck.py:133-138): per
    parsed snapshot FILE, does the requested ontology's IRI occur in
    subject position of its triples, and how many triples parsed?  Runs
    over the SERIALIZED RDF snapshots through the distributed Turtle
    parse (the reference's rapper + uri_in_subject_position pass); the
    fixture plants foreign-content snapshots (classes describing another
    ontology) so the predicate genuinely splits.  The oracle restates it
    over the equivalent snapshot-content table -- equality revalidates
    the parser too."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.sources.readers import parse_snapshot_rdf_batch

    p = _pipe(sf_dir)
    idx = pq.read_table(p.paths.ontology_index, columns=["ontology_id", "iri"])
    base_ref = ray.put(
        dict(
            zip(
                idx["ontology_id"].to_pylist(),
                (i.rstrip("/") for i in idx["iri"].to_pylist()),
            )
        )
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bases = cached_get(base_ref)
        nir, n_triples = [], []
        for oid, cls, props, sa, ea in zip(
            df["ontology_id"], df["classes"], df["properties"],
            df["same_as_a"], df["equiv_a"],
        ):
            subs = {s.split("#")[0] for s in (*cls, *props, *sa, *ea)}
            nir.append(bases.get(oid) in subs)
            n_triples.append(len(cls) + len(props) + len(sa) + len(ea))
        return pd.DataFrame(
            {
                "uri_in_subject_position": pd.Series(nir, dtype="bool"),
                "parsed_triples": pd.Series(n_triples, dtype="int64"),
            }
        )

    parts = (
        rd.read_parquet(p.paths.snapshot_rdf)
        .map_batches(parse_snapshot_rdf_batch, batch_format="pandas")
        .map_batches(score, batch_format="pandas")
        .map_batches(
            lambda df: df.groupby("uri_in_subject_position", as_index=False).agg(
                n_snapshots=("parsed_triples", "size"),
                parsed_triples=("parsed_triples", "sum"),
            ),
            batch_format="pandas",
        )
        .to_pandas()  # <= 2 rows per block partial
    )
    out = parts.groupby("uri_in_subject_position", as_index=False).agg(
        n_snapshots=("n_snapshots", "sum"), parsed_triples=("parsed_triples", "sum")
    )
    return out.astype(
        {"n_snapshots": "int64", "parsed_triples": "int64"}
    ).sort_values("uri_in_subject_position").reset_index(drop=True)


class _RdfParsedPaths(FixturePaths):
    """FixturePaths whose snapshot content comes from the DISTRIBUTED RDF
    parse output instead of the table-driven fixture."""

    @property
    def snapshot_content(self) -> str:
        return os.path.join(self.root, "snapshot_content_from_rdf.parquet")


def kg_triples_from_rdf(sf_dir: str):
    """Triples built from SERIALIZED RDF snapshot files: a distributed
    ``map_batches`` Turtle parse (sources.readers.parse_snapshot_rdf_batch
    -- the engine analog of the reference's rapper parse stage,
    experiments/parse_ontologies.py:49-76) reconstructs the pinned
    snapshot-content table from snapshot_rdf.parquet, then the IDENTICAL
    pipeline runs on it.  Sharing kg_triples' SQL oracle makes the
    equality the parser-correctness claim: a single dropped or misread
    statement changes the emitted triples."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ontology_time_machine_ray.sources.readers import parse_snapshot_rdf_batch

    p = _pipe(sf_dir)
    parsed = rd.read_parquet(p.paths.snapshot_rdf).map_batches(
        parse_snapshot_rdf_batch, batch_format="pandas"
    )
    # the parsed content table is the linker's pinned per-actor state --
    # vocabulary-scale by design (SnapshotStore loads it whole), so a
    # driver collect + single-file atomic write is the right shape
    schema = pa.schema(
        [
            ("ontology_id", pa.string()),
            ("version", pa.string()),
            ("classes", pa.list_(pa.string())),
            ("properties", pa.list_(pa.string())),
            ("same_as_a", pa.list_(pa.string())),
            ("same_as_b", pa.list_(pa.string())),
            ("equiv_a", pa.list_(pa.string())),
            ("equiv_b", pa.list_(pa.string())),
        ]
    )
    tbl = pa.Table.from_pandas(parsed.to_pandas(), schema=schema, preserve_index=False)
    rdf_paths = _RdfParsedPaths(root=p.paths.root)
    # unique tmp name: concurrent runs over one sf_dir (bench + oracle
    # harness) must never interleave writes to a shared .tmp before the
    # atomic replace
    import tempfile

    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(rdf_paths.snapshot_content), suffix=".tmp"
    )
    os.close(fd)
    pq.write_table(tbl, tmp)
    os.replace(tmp, rdf_paths.snapshot_content)
    return replace(p, paths=rdf_paths).triples()


def kg_components(sf_dir: str) -> pd.DataFrame:
    p = _pipe(sf_dir)
    cc = connected_components(sameas_edges(p.triples())).to_pandas()
    # the star mapping lists leaves; add the root self-rows the SQL closure
    # also reports
    roots = sorted(set(cc["component"]) - set(cc["node"]))
    out = pd.concat(
        [cc, pd.DataFrame({"node": roots, "component": roots})], ignore_index=True
    )
    return out.sort_values("node").reset_index(drop=True)


def kg_entity_profile(sf_dir: str):
    """Entity cards: per-subject rollup of the deduped store -- triple /
    predicate / provenance-document counts and the resolved-version
    range.  The KG-serving view a consumer reads before dereferencing an
    entity.  One subj-bucketed pass (the store's native partitioning
    key), cython nunique/min/max kernels in-bucket."""
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    t = _pipe(sf_dir).triples()

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("subj", as_index=False).agg(
            n_triples=("pred", "size"),
            n_preds=("pred", "nunique"),
            n_docs=("doc_id", "nunique"),
            v_min=("ontology_version", "min"),
            v_max=("ontology_version", "max"),
        )
        for c in ("n_triples", "n_preds", "n_docs"):
            agg[c] = agg[c].astype("int64")
        return agg

    return grouped_apply(t, ["subj"], rollup)


def kg_component_sizes(sf_dir: str) -> pd.DataFrame:
    """Equivalence-component size distribution -- the HUB-ENTITY SKEW
    diagnostic: at web scale a handful of owl:sameAs hub components
    absorb millions of members and are exactly what the canonicalize
    stage's salting exists for; this query is the monitoring view that
    catches them (size, n_components, largest component root per size
    for drill-down).  Same distributed CC as the build, one extra
    component-bucketed count."""
    cc = kg_components(sf_dir)
    sizes = cc.groupby("component", as_index=False).agg(size=("node", "size"))
    out = sizes.groupby("size", as_index=False).agg(
        n_components=("component", "size"), min_root=("component", "min")
    )
    out["size"] = out["size"].astype("int64")
    out["n_components"] = out["n_components"].astype("int64")
    return out


def kg_restricted_denied(sf_dir: str):
    """restrictedAccess mode: non-Archivo mentions denied with 403
    (proxy_logic.py:39-54, M3)."""
    p = _pipe(sf_dir)
    p = replace(p, config=replace(DEFAULT_CONFIG, restricted_access=True))
    status = p.status()
    return status.filter(lambda r: r["status"] == 403).select_columns(
        ["doc_id", "term_iri", "status"]
    )


def kg_formats_complete(sf_dir: str) -> pd.DataFrame:
    """A2 parity ('correct for all 3 formats', aggregate_results.py:96,
    143,149-151): per ontology, is the LATEST version's snapshot available
    (status 200, after the https retry) in all of ttl/nt/owl?"""
    import ray.data as rd

    from ray.data.aggregate import Count, Max

    paths = ensure_fixtures(sf_dir)
    content = rd.read_parquet(paths.snapshot_content, columns=["ontology_id", "version"])
    latest = content.groupby("ontology_id").aggregate(Max("version", alias_name="latest_version"))
    latest_map = dict(
        zip(*(latest.to_pandas()[c] for c in ("ontology_id", "latest_version")))
    )

    def ok_formats(df: pd.DataFrame) -> pd.DataFrame:
        eff = df["status"].where(df["status"] != 500, df["status_https"])
        keep = (df["version"] == df["ontology_id"].map(latest_map)) & (eff == 200)
        return df[keep][["ontology_id", "format"]]

    status = rd.read_parquet(paths.snapshot_status)
    agg = (
        status.map_batches(ok_formats, batch_format="pandas")
        .groupby("ontology_id")
        .aggregate(Count(alias_name="n_formats"))
        .to_pandas()
    )
    agg["all_formats"] = (agg["n_formats"] == 3).astype("int64")
    return agg


def events_topk_users(sf_dir: str) -> pd.DataFrame:
    """Top 10 users by exact total value (combiner -> global top-k)."""
    import ray.data as rd
    import os as _os

    ds = rd.read_parquet(
        _os.path.join(sf_dir, "events.parquet"), columns=["user_id", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(value_c=(df["value"] * 100).round().astype("int64"))
        return df.groupby("user_id", as_index=False).agg(
            n=("value_c", "size"), value_c=("value_c", "sum")
        )

    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    agg_ds = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        {"n_events": ("n", "sum"), "value_c": ("value_c", "sum")},
    )

    # each user appears in exactly one aggregate block, so a per-block
    # partial top-10 is exact; the driver merges (num_blocks x 10) rows,
    # never the full per-user aggregate
    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["value_c", "user_id"], ascending=[False, True], kind="stable"
        ).head(10)

    agg = agg_ds.map_batches(block_topk, batch_format="pandas").to_pandas()
    agg = agg.sort_values(
        ["value_c", "user_id"], ascending=[False, True], kind="stable"
    ).head(10)
    agg["total_value"] = agg.pop("value_c") / 100.0
    return agg.reset_index(drop=True)


def kg_spans_passthrough(sf_dir: str):
    """The per-row span-sequence invariant as a checkable query: the
    pipeline's view of the corpus, exploded to (doc_id, span_idx, kind,
    text, media_ref) THROUGH the engine (Arrow zero-copy round trip).
    Hash-equality with the SQL explode of the input parquet proves kind,
    text, media_ref and ORDER are preserved per row."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy()
        flat = spans.flatten()
        if len(flat) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.string()), "span_idx": pa.array([], pa.int32()),
                 "kind": pa.array([], pa.string()), "text": pa.array([], pa.string()),
                 "media_ref": pa.array([], pa.string())}
            )
        offsets = spans.offsets.to_numpy()
        span_idx = np.arange(len(flat), dtype=np.int32) - offsets[parent].astype(np.int32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(parent)),
                "span_idx": pa.array(span_idx),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
            }
        )

    return _pipe(sf_dir).documents().map_batches(explode, batch_format="pyarrow")


def kg_intercept_archivo(sf_dir: str):
    """The per-request TLS-interception decision under the ARCHIVO policy
    (custom_proxy.py:133-174 do_intercept): intercept exactly the hosts
    whose IRI resolves into the Archivo index (re-uses M1 membership,
    custom_proxy.py:157-171)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def decide(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term_iri": t["term_iri"],
                "intercept": pc.cast(pc.is_valid(t["ontology_id"]), pa.int64()),
            }
        )

    return _pipe(sf_dir).mentions().map_batches(decide, batch_format="pyarrow")


def kg_client_config(sf_dir: str):
    """M10/M11: per-client configuration parsed out of the basic-auth
    username (base64 decode -> ':' split -> www-form decode -> CLI parse;
    proxy_wrapper.py:134-151, proxy_logic.py:65-86, config.py:141-337).
    Errors are data: parse_ok=0 with NULL config columns."""
    import ray.data as rd

    from ontology_time_machine_ray.functions.authparse import parse_client_config

    paths = ensure_fixtures(sf_dir)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        memo: dict = {}
        rows = []
        for h in df["auth_header"]:
            key = None if pd.isna(h) else h
            r = memo.get(key)
            if r is None:
                r = memo[key] = parse_client_config(key)
            rows.append(r)
        ok = pd.Series([r["parse_ok"] for r in rows], dtype="int64")

        def col(name):
            return pd.Series(
                [r[name] if r["parse_ok"] else None for r in rows], dtype="object"
            )

        def flag(name):
            return pd.Series(
                [str(bool(r[name])).lower() if r["parse_ok"] else None for r in rows],
                dtype="object",
            )

        return pd.DataFrame(
            {
                "client_id": df["client_id"],
                "parse_ok": ok,
                "onto_format": col("ontoFormat"),
                "onto_precedence": col("ontoPrecedence"),
                "onto_version": col("ontoVersion"),
                "https_interception": col("httpsInterception"),
                "patch_accept_upstream": flag("patchAcceptUpstream"),
                "restricted_access": flag("restrictedAccess"),
            }
        )

    return rd.read_parquet(paths.client_auth).map_batches(parse, batch_format="pandas")


def kg_intercept_modes(sf_dir: str):
    """The full do_intercept policy matrix (custom_proxy.py:133-174):
    ALL -> always intercept, NONE -> never, BLOCK -> never reached (the
    CONNECT is rejected upstream -> False), ARCHIVO -> index membership."""

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        in_archivo = df["ontology_id"].notna().astype("int64")
        frames = []
        for mode, val in (("all", 1), ("none", 0), ("block", 0), ("archivo", None)):
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": df["doc_id"],
                        "term_iri": df["term_iri"],
                        "mode": [mode] * n,
                        "intercept": in_archivo if val is None
                        else pd.Series([val] * n, dtype="int64"),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return _pipe(sf_dir).mentions().map_batches(decide, batch_format="pandas")


def kg_client_intercept(sf_dir: str):
    """The parsed per-client config APPLIED: for every successfully parsed
    client and every distinct corpus host, the CONNECT-time interception
    decision under that client's ``httpsInterception`` mode
    (custom_proxy.py:133-174 via proxy_wrapper.py:134-151's per-request
    config).  Host-level index membership (a CONNECT carries only the
    host), config plane broadcast once."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.functions.urls import split_iri
    from ontology_time_machine_ray.stages.groupagg import grouped_head1

    paths = ensure_fixtures(sf_dir)
    idx_hosts = sorted(
        set(pq.read_table(paths.ontology_index, columns=["host"])["host"].to_pylist())
    )
    clients = kg_client_config(sf_dir).to_pandas()  # config plane: small
    clients = clients[clients["parse_ok"] == 1][["client_id", "https_interception"]]
    bref = ray.put((idx_hosts, clients))

    def hostify(df: pd.DataFrame) -> pd.DataFrame:
        # distinct IRIs first: the per-IRI urlparse touches batch-distinct
        # values, not every mention row
        iris = df["term_iri"].drop_duplicates()
        return pd.DataFrame(
            {"host": iris.map(lambda i: split_iri(i)[1]).drop_duplicates()}
        )

    hosts = grouped_head1(
        _pipe(sf_dir).mentions().map_batches(hostify, batch_format="pandas"),
        keys=["host"],
        order_by=["host"],
    )

    def cross(df: pd.DataFrame) -> pd.DataFrame:
        host_list, cl = cached_get(bref)
        member = df["host"].isin(frozenset(host_list)).to_numpy().astype("int64")
        out = df.assign(in_archivo=member).merge(cl, how="cross")
        mode = out["https_interception"]
        out["intercept"] = np.select(
            [mode == "all", mode == "archivo"],
            [np.ones(len(out), dtype=np.int64), out["in_archivo"].to_numpy()],
            default=0,
        ).astype("int64")
        return out[["client_id", "host", "intercept"]]

    return hosts.map_batches(cross, batch_format="pandas")


def kg_config_grid(sf_dir: str):
    """Full configuration-grid sweep (the reference's
    tests/test_integration.py:140-172 ``get_parameter_combinations``):
    every ontoFormat(4) x ontoPrecedence(3) x patchAcceptUpstream(2) x
    ontoVersion(4) combination applied to every document's Accept header,
    aggregated to per-combination resolved-downstream-format counts plus
    how many headers the patch policy rewrote (utils.py:60-157 semantics).

    Scale shape: ONE combiner pass over the corpus (per-batch Accept
    histogram -> bounded partials), a tiny bucketed aggregate on the
    distinct headers, and the 96-combo cross product applied to that
    distinct-header aggregate -- config-plane work, never per corpus row.
    """
    import ray.data as rd

    from ontology_time_machine_ray.config import (
        OntoFormat,
        OntoFormatConfig,
        OntoPrecedence,
        OntoVersion,
    )
    from ontology_time_machine_ray.functions.negotiate import (
        get_format_from_accept_header,
        get_mime_type,
        patch_decision,
    )
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    paths = ensure_fixtures(sf_dir)
    docs = rd.read_parquet(paths.documents, columns=["accept"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        # '' sentinel for the null header: pandas groupby drops NaN keys
        return (
            df.assign(accept=df["accept"].fillna(""))
            .groupby("accept", as_index=False)
            .agg(n=("accept", "size"))
        )

    per_accept = grouped_aggregate(
        docs.map_batches(hist, batch_format="pandas"), ["accept"], {"n": ("n", "sum")}
    )

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        # rows here = DISTINCT Accept headers, not corpus rows; the Python
        # loop is over (distinct headers x 96 configs), config-plane scale
        rows = []
        for accept_s, n in zip(df["accept"], df["n"]):
            accept = accept_s or None
            for fmt in OntoFormat:
                for prec in OntoPrecedence:
                    for patch in (0, 1):
                        conf = OntoFormatConfig(
                            format=fmt,
                            precedence=prec,
                            patch_accept_upstream=bool(patch),
                        )
                        for ver in OntoVersion:
                            forced = patch_decision(accept, conf, ver)
                            header = get_mime_type(fmt.value) if forced else accept
                            resolved = get_format_from_accept_header(
                                {"Accept": header} if header else None
                            )
                            rows.append(
                                (
                                    fmt.value,
                                    prec.value,
                                    patch,
                                    ver.value,
                                    resolved or "",
                                    int(n),
                                    int(forced) * int(n),
                                )
                            )
        return pd.DataFrame(
            rows,
            columns=[
                "onto_format",
                "onto_precedence",
                "patch_accept_upstream",
                "onto_version",
                "resolved_format",
                "n_docs",
                "n_patched",
            ],
        )

    out = grouped_aggregate(
        per_accept.map_batches(sweep, batch_format="pandas"),
        ["onto_format", "onto_precedence", "patch_accept_upstream", "onto_version", "resolved_format"],
        {"n_docs": ("n_docs", "sum"), "n_patched": ("n_patched", "sum")},
    )
    return out.map_batches(
        lambda df: df.assign(
            resolved_format=df["resolved_format"].replace("", None)
        ),
        batch_format="pandas",
    )


#: percentage kept by the quality-head selection query.
QUALITY_TOP_PCT = 25


def quality_top_pct(sf_dir: str):
    """Keep the best ``QUALITY_TOP_PCT``% of the corpus by quality score,
    EXACTLY (score DESC, doc_id ASC rank cutoff), without a global sort:
    distributed order-statistic selection via score histogram + iterative
    id-histogram refinement (stages/selection.py)."""
    from ontology_time_machine_ray.stages.selection import exact_top_n

    return exact_top_n(
        textops.quality_score(sf_dir),
        pct=QUALITY_TOP_PCT,
        score_col="quality",
        id_col="doc_id",
    )


def corpus_report(sf_dir: str):
    """Corpus-composition dashboard: per (source, predicted language) --
    document count, integer quality mass, classifier accepts, token
    volume.  ONE streaming pass computes all three per-doc signals
    (lang markers, heuristic quality, hashed-classifier score) plus the
    token count per batch, a per-batch combiner pre-aggregates, and one
    tiny (source x lang)-bucketed sum finishes -- the group grain is
    sources x languages, never documents."""
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate
    from ontology_time_machine_ray.stages.textops import (
        TOKEN_RE,
        _read_docs_cols,
        classifier_score_batch,
        lang_id_batch,
        quality_score_batch,
    )

    docs = _read_docs_cols(sf_dir, ["doc_id", "text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = pd.DataFrame(
            {
                "source": df["source"].to_numpy(),
                "lang_pred": lang_id_batch(df)["lang_pred"].to_numpy(),
                "quality": quality_score_batch(df)["quality"].to_numpy(),
                "keep": classifier_score_batch(df)["keep"].to_numpy("int64"),
                "n_tokens": df["text"]
                .fillna("")
                .str.count(TOKEN_RE)
                .to_numpy("int64"),
            }
        )
        return rows.groupby(["source", "lang_pred"], as_index=False).agg(
            n_docs=("quality", "size"),
            sum_quality=("quality", "sum"),
            n_keep=("keep", "sum"),
            sum_tokens=("n_tokens", "sum"),
        )

    return grouped_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "lang_pred"],
        {
            "n_docs": ("n_docs", "sum"),
            "sum_quality": ("sum_quality", "sum"),
            "n_keep": ("n_keep", "sum"),
            "sum_tokens": ("sum_tokens", "sum"),
        },
    )


def quality_top_pct_by_source(sf_dir: str, pct: int | None = None):
    """Per-SOURCE percentile quality gate: each source keeps its own best
    ``pct``% by (quality DESC, doc_id ASC) -- the per-domain curation
    rule (a uniform global cutoff would let a high-quality source crowd
    out the rest of the mix).

    Scale shape: quality scoring is the usual streaming pass; the only
    exchange moves the (doc_id, source, quality) PROJECTION through one
    source-bucketed shuffle, and the per-source rank cutoff is a
    vectorized in-bucket sort.  A pathologically dominant source
    concentrates its projection in one bucket; the remedy at that scale
    is the histogram-refinement selection of ``exact_top_n`` run
    per-source -- the global variant above demonstrates it."""
    from ontology_time_machine_ray.stages.groupagg import grouped_apply
    from ontology_time_machine_ray.stages.textops import (
        _read_docs_cols,
        quality_score_batch,
    )

    pct = QUALITY_TOP_PCT if pct is None else pct
    docs = _read_docs_cols(sf_dir, ["doc_id", "text", "source"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        out = quality_score_batch(df)
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(),
                "source": df["source"].to_numpy(),
                "quality": out["quality"].to_numpy(),
            }
        )

    scored = docs.map_batches(score, batch_format="pandas")

    def cutoff(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, sub in g.groupby("source", sort=False):
            sub = sub.sort_values(
                ["quality", "doc_id"], ascending=[False, True], kind="stable"
            )
            out.append(sub.head((len(sub) * pct + 99) // 100))
        return (
            pd.concat(out, ignore_index=True)
            if out
            else g.iloc[0:0]
        )

    return grouped_apply(scored, ["source"], cutoff)


def kg_two_hop(sf_dir: str):
    """2-hop property-path traversal over the deduped triple store: all
    distinct paths a -pred1-> mid -pred2-> b (a != b).  The graph-query
    primitive behind SPARQL property paths, expressed as ONE bucketed
    self-join of the triple dataset on obj = subj (hash co-location on
    ``mid``; no broadcast -- at 10^12 docs neither side is small), then a
    bucket-local distinct whose co-location key (subj, mid) is a subset of
    the path tuple."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join, grouped_apply

    # pin the deduped store once: it feeds BOTH join branches, and Ray
    # re-executes a lazy subplan per branch (the detect+link+dedup chain
    # would run twice per execution); the deduped store is vocabulary-
    # scale, so this pin is the standard checkpoint, not a corpus
    # materialization
    t = _spo_store(sf_dir)
    left = t.map_batches(
        lambda df: df.rename(columns={"pred": "pred1", "obj": "mid"}).drop_duplicates(),
        batch_format="pandas",
    )
    right = t.map_batches(
        lambda df: pd.DataFrame(
            {"mid": df["subj"], "pred2": df["pred"], "obj": df["obj"]}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    joined = bucketed_join(
        left,
        right,
        on=["mid"],
        left_schema={"subj": "object", "pred1": "object", "mid": "object"},
        right_schema={"mid": "object", "pred2": "object", "obj": "object"},
    )
    cols = ["subj", "pred1", "mid", "pred2", "obj"]

    def distinct_paths(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["subj"] != b["obj"]]
        return b.drop_duplicates(cols)[cols]

    return grouped_apply(joined, cols, distinct_paths, bucket_keys=["subj", "mid"])


def kg_bgp(sf_dir: str):
    """Conjunctive triple-pattern (BGP) query -- the SPARQL core -- via
    the generic left-deep matcher (``stages/bgp.py``): owl:sameAs pairs
    whose BOTH endpoints are typed owl:Class.  Most selective pattern
    first (sameAs is ~7% of the store); each subsequent pattern is one
    bucketed hash join on the shared variable, nothing broadcasts."""
    from ontology_time_machine_ray.schema import OWL_CLASS, OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = _spo_store(sf_dir)
    return bgp_match(
        t,
        [
            ("?cls", OWL_SAME_AS, "?peer"),
            ("?cls", RDF_TYPE, OWL_CLASS),
            ("?peer", RDF_TYPE, OWL_CLASS),
        ],
    )


KG_REACH_HOPS = 3


def kg_reachability(sf_dir: str, max_hops: int = KG_REACH_HOPS):
    """Bounded-hop reachability over the triple graph: every (a, b) pair
    connected by a directed walk of <= ``max_hops`` edges, with the
    minimum hop count.  The iterative traversal primitive (frontier
    expansion) done as ``max_hops - 1`` rounds of one bucketed join +
    one bucket-local distinct each -- per-round shuffle volume is the
    frontier, never the transitive closure, and the only driver state is
    the loop counter.  Oracle: the same expansion unrolled into SQL
    CTEs, min(hops) per pair."""
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import (
        bucketed_join,
        grouped_aggregate,
        grouped_apply,
    )

    t = _spo_store(sf_dir).select_columns(["subj", "obj"])
    raw = t.map_batches(
        lambda df: pd.DataFrame({"a": df["subj"], "b": df["obj"]})
        .query("a != b")
        .drop_duplicates(),
        batch_format="pandas",
    )
    # pin the distinct edge set: it is re-read every expansion round (and
    # twice per round: frontier side + edge side), and it is bounded by
    # the vocabulary-scale store, not the corpus
    edges = grouped_apply(raw, ["a", "b"], lambda g: g.drop_duplicates()).materialize()

    def tag(ds, hops: int):
        return ds.map_batches(
            lambda df, h=hops: df.assign(hops=np.int64(h)), batch_format="pandas"
        )

    levels = [tag(edges, 1)]
    frontier = edges
    for k in range(2, max_hops + 1):
        left = frontier.map_batches(
            lambda df: df.rename(columns={"b": "mid"}), batch_format="pandas"
        )
        right = edges.map_batches(
            lambda df: df.rename(columns={"a": "mid"}), batch_format="pandas"
        )
        stepped = bucketed_join(
            left,
            right,
            on=["mid"],
            left_schema={"a": "object", "mid": "object"},
            right_schema={"mid": "object", "b": "object"},
        ).map_batches(
            lambda df: df.loc[df["a"] != df["b"], ["a", "b"]].drop_duplicates(),
            batch_format="pandas",
        )
        # per-round frontier checkpoint (the BFS pattern): the frontier is
        # consumed twice (tagged level + next round's join input)
        frontier = grouped_apply(
            stepped, ["a", "b"], lambda g: g.drop_duplicates()
        ).materialize()
        levels.append(tag(frontier, k))

    allu = levels[0]
    for lv in levels[1:]:
        allu = allu.union(lv)
    return grouped_aggregate(allu, ["a", "b"], {"hops": ("hops", "min")}, bucket_keys=["a", "b"])


def kg_subclass_closure(sf_dir: str):
    """RDFS entailment materialization (rdfs11): the transitive closure
    of the ``rdfs:subClassOf`` hierarchy carried by the AS-OF-resolved
    snapshot of every archived ontology, with the minimum subsumption
    depth per (subclass, superclass) pair.  The reference's whole premise
    is serving time-coordinate-resolved ontology versions
    (proxy_logic.py's timestampArchived route); this is the reasoning
    step a consumer runs over exactly that resolved set.

    Distributed shape: the as-of version pick is one grouped head-1 per
    ontology (vocabulary-scale), edge extraction is a vectorized list
    explode inside ``map_batches``, and the closure is synchronous BFS --
    one bucketed join + one anti join per level, frontier-sized shuffles,
    no driver graph state (stages/graph.py closure_with_depth).  Oracle:
    a recursive CTE with min(depth) per pair."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.graph import closure_with_depth
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    p = _pipe(sf_dir)
    t = p.config.timestamp
    content = rd.read_parquet(
        p.paths.snapshot_content,
        columns=["ontology_id", "version", "subclass_a", "subclass_b"],
    ).map_batches(
        # prune BEFORE the per-ontology shuffle: only versions <= T can win
        lambda df: df[df["version"] <= t], batch_format="pandas"
    )
    asof = grouped_apply(
        content,
        ["ontology_id"],
        lambda g: g.sort_values(
            ["ontology_id", "version"], ascending=[True, False], kind="stable"
        ).drop_duplicates("ontology_id", keep="first"),
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["subclass_a", "subclass_b"]].explode(["subclass_a", "subclass_b"])
        out = out.dropna()
        return pd.DataFrame(
            {"a": out["subclass_a"].astype(object), "b": out["subclass_b"].astype(object)}
        )

    edges = asof.map_batches(explode, batch_format="pandas")
    out = closure_with_depth(edges)
    return out.map_batches(
        lambda df: df.rename(columns={"a": "subclass", "b": "superclass"}),
        batch_format="pandas",
    )


def kg_cooccur_triangles(sf_dir: str):
    """Ontology co-usage graph analytics: distinct co-mention edges per
    document, then degree-oriented distributed triangle counting (Suri &
    Vassilvitskii 2011 -- hub wedge expansion bounded by orientation).
    Oracle: plain id-ordered wedge closure in SQL; equality pins that the
    degree orientation is output-invariant."""
    from ontology_time_machine_ray.stages.graph import cooccurrence_edges, triangle_stats

    out = triangle_stats(cooccurrence_edges(_pipe(sf_dir).mentions()))
    return out.map_batches(
        lambda df: df.rename(columns={"node": "ontology_id"}), batch_format="pandas"
    )


def kg_nt_roundtrip(sf_dir: str):
    """RDF round-trip through serialized form: export the deduped triple
    store to N-Triples shards (distributed, content-addressed, atomic),
    then re-ingest the directory with the distributed NT reader.
    Equality with the store's distinct (subj, pred, obj) IS the
    serializer+parser correctness claim -- the OUTPUT side of the
    engine's RDF surface (kg_triples_from_rdf covers the input side)."""
    import shutil
    import tempfile

    from ontology_time_machine_ray.sources.readers import read_ntriples
    from ontology_time_machine_ray.sources.writers import write_ntriples

    ensure_fixtures(sf_dir)
    t = _spo_store(sf_dir)
    # per-invocation private dir: concurrent runs over the same sf_dir
    # (bench + oracle harness) must not race on a shared export path
    os.makedirs("/tmp/otm_nt_export", exist_ok=True)
    out = tempfile.mkdtemp(dir="/tmp/otm_nt_export")
    try:
        write_ntriples(t, out)  # mkdtemp dir is fresh, check passes
        return read_ntriples(out).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def kg_bgp_optional(sf_dir: str):
    """BGP with a SPARQL OPTIONAL clause: every owl:sameAs pair, plus
    the peer's rdf:type where one exists (NULL otherwise) -- the
    left-join pattern semantics over the same generic matcher."""
    from ontology_time_machine_ray.schema import OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = _spo_store(sf_dir)
    return bgp_match(
        t,
        [("?cls", OWL_SAME_AS, "?peer")],
        optional=[("?peer", RDF_TYPE, "?ptype")],
    )


def kg_bgp_minus(sf_dir: str):
    """BGP with SPARQL negation (MINUS / FILTER NOT EXISTS): owl:sameAs
    pairs whose peer is NOT typed owl:Class -- the complement slice
    kg_bgp keeps.  The negated group matches as its own BGP and is
    removed by ONE bucketed anti join on the shared variable; only the
    shared column ships to the anti side."""
    from ontology_time_machine_ray.schema import OWL_CLASS, OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = _spo_store(sf_dir)
    return bgp_match(
        t,
        [("?cls", OWL_SAME_AS, "?peer")],
        minus=[[("?peer", RDF_TYPE, OWL_CLASS)]],
    )


def kg_bgp_union(sf_dir: str):
    """BGP with SPARQL UNION over heterogeneous branches: sameAs pairs,
    equivalentClass pairs, and isDefinedBy memberships as one solution
    relation -- branches bind DIFFERENT variables (peer vs ont), so the
    union NULL-pads per SPARQL solution-mapping semantics; one bucketed
    null-consistent distinct removes cross-branch duplicates."""
    from ontology_time_machine_ray.schema import (
        OWL_EQUIVALENT_CLASS,
        OWL_SAME_AS,
        RDFS_IS_DEFINED_BY,
    )
    from ontology_time_machine_ray.stages.bgp import bgp_union

    t = _spo_store(sf_dir)
    return bgp_union(
        t,
        [
            [("?cls", OWL_SAME_AS, "?peer")],
            [("?cls", OWL_EQUIVALENT_CLASS, "?peer")],
            [("?cls", RDFS_IS_DEFINED_BY, "?ont")],
        ],
    )


def kg_bgp_filter(sf_dir: str):
    """BGP with SPARQL FILTER clauses, pushdown-planned: sameAs pairs of
    typed classes restricted to FILTER(?cls < ?peer && STRENDS(?cls,
    '#C0')).  The constant STRENDS prunes INSIDE both scans that bind
    ?cls (selection pushdown -- rows die before the first exchange);
    the ?cls < ?peer comparison applies at the first scan, where both
    variables are already bound, so no join ever carries a row a filter
    would kill."""
    from ontology_time_machine_ray.schema import OWL_CLASS, OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = _spo_store(sf_dir)
    return bgp_match(
        t,
        [
            ("?cls", OWL_SAME_AS, "?peer"),
            ("?cls", RDF_TYPE, OWL_CLASS),
            ("?peer", RDF_TYPE, OWL_CLASS),
        ],
        filters=[("?cls", "<", "?peer"), ("?cls", "suffix", "#C0")],
    )


def kg_path_query(sf_dir: str):
    """SPARQL 1.1 property path ``(sameAs|^sameAs|equivalentClass|
    ^equivalentClass)+/rdf:type`` -- the types asserted anywhere in a
    term's undirected equivalence component (the entailment query that
    motivates sameAs symmetry).  Exercises all four path operators:
    inverse (endpoint swap), alternation (lazy union + one distinct),
    one-or-more closure (iterative relation-doubling off
    ``graph.transitive_closure``; per-round shuffle = the reachable-pair
    frontier, driver holds only the fixpoint counter), and sequence
    composition (one bucketed join).  Oracle: recursive CTE over the
    symmetrized union edge set joined to the type triples."""
    from ontology_time_machine_ray.schema import (
        OWL_EQUIVALENT_CLASS,
        OWL_SAME_AS,
        RDF_TYPE,
    )
    from ontology_time_machine_ray.stages.bgp import path_match

    t = _spo_store(sf_dir)
    return path_match(
        t,
        (
            "seq",
            (
                "plus",
                (
                    "alt",
                    OWL_SAME_AS,
                    ("inv", OWL_SAME_AS),
                    OWL_EQUIVALENT_CLASS,
                    ("inv", OWL_EQUIVALENT_CLASS),
                ),
            ),
            RDF_TYPE,
        ),
        s_name="term",
        o_name="typ",
    )


def kg_path_star(sf_dir: str):
    """SPARQL 1.1 zero-or-more property path ``(sameAs|^sameAs)*`` --
    the full reflexive-symmetric-transitive sameAs equivalence relation
    over the pinned store (what canonicalization entails).  Exercises
    the ``star`` path operator: the zero-length leg is the EXPLICIT
    node universe of the store (distinct subjects-union-objects,
    ``bgp._node_universe``) paired with itself, unioned with the
    one-or-more closure and collapsed by one bucketed distinct.  Every
    node therefore appears at least as its own peer -- including nodes
    with no sameAs edge at all, the 0-hop endpoints that make ``p*``
    different from ``p+``.  Oracle: recursive CTE over the symmetrized
    sameAs edges unioned with the node table's self-pairs."""
    from ontology_time_machine_ray.schema import OWL_SAME_AS
    from ontology_time_machine_ray.stages.bgp import path_match

    t = _spo_store(sf_dir)
    return path_match(
        t,
        ("star", ("alt", OWL_SAME_AS, ("inv", OWL_SAME_AS))),
        s_name="term",
        o_name="peer",
    )


#: VALUES-pinned seed classes for kg_bgp_values (query-literal inline
#: bindings; the triple vocabulary is fixed across scale factors, so the
#: constants exist at every sf).
KG_VALUES_SEEDS = (
    "http://onto0.example.org/ns/v0#C0",
    "http://onto0.example.org/ns/v12#C0",
    "http://onto1.example.org/ontology1#C0",
)


def kg_bgp_values(sf_dir: str):
    """SPARQL VALUES clause: the sameAs pairs and peer types reachable
    from an inline seed-class binding table (federation-style seeded
    query).  The VALUES table is query-literal (driver-small by
    definition) and inner-joins the required match on ?cls via the same
    bucketed exchange as any pattern -- plus an auto-ordered plan
    (``order='auto'``): per-predicate counts put the rarest pattern
    first regardless of how the caller wrote the query."""
    from ontology_time_machine_ray.schema import OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.bgp import bgp_match

    t = _spo_store(sf_dir)
    return bgp_match(
        t,
        [
            ("?cls", RDF_TYPE, "?typ"),
            ("?cls", OWL_SAME_AS, "?peer"),
        ],
        values=(["?cls"], [(s,) for s in KG_VALUES_SEEDS]),
        order="auto",
    )


def kg_ask(sf_dir: str):
    """SPARQL ASK (existence check, as a 1-row table the driver can
    hash): does any owl:sameAs pair have a peer typed owl:Class?
    ``Dataset.limit(1)`` stops the streaming executor at the first
    output row -- which, for this two-pattern BGP, saves only the
    post-join tail (the bucketed join is an all-to-all barrier; a
    single-pattern ASK would stop after the first scanned partition)."""
    import pandas as pd

    from ontology_time_machine_ray.schema import OWL_CLASS, OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.bgp import bgp_ask

    t = _spo_store(sf_dir)
    hit = bgp_ask(
        t,
        [("?cls", OWL_SAME_AS, "?peer"), ("?peer", RDF_TYPE, OWL_CLASS)],
    )
    return pd.DataFrame({"ask": [int(hit)]})


def kg_describe(sf_dir: str):
    """SPARQL DESCRIBE of a seed resource (symmetric concise form):
    every stored triple where it appears as subject OR object -- the
    dereference view a linked-data consumer gets for one IRI.  One
    vectorized pushdown scan, no shuffle."""
    from ontology_time_machine_ray.stages.bgp import describe_resource

    t = _spo_store(sf_dir)
    return describe_resource(t, KG_VALUES_SEEDS[0])


def kg_bgp_bind(sf_dir: str):
    """SPARQL BIND expression columns over the BGP: per sameAs pair,
    the fragment local name (STRAFTER), the uppercased peer (UCASE),
    a CONCAT display key and the IRI STRLEN -- one vectorized in-batch
    pass, zero shuffles (BIND is projection; rows neither die nor
    multiply)."""
    from ontology_time_machine_ray.schema import OWL_SAME_AS
    from ontology_time_machine_ray.stages.bgp import bgp_select

    t = _spo_store(sf_dir)
    return bgp_select(
        t,
        [("?cls", OWL_SAME_AS, "?peer")],
        binds={
            "local_name": ("strafter", "?cls", "#"),
            "peer_up": ("ucase", "?peer"),
            "pair": ("concat", "?cls", "|", "?peer"),
            "len_cls": ("strlen", "?cls"),
        },
    )


def kg_sparql_having(sf_dir: str):
    """The full SPARQL analytic chain in one query: BIND (STRLEN) ->
    GROUP BY -> COUNT(DISTINCT) + SUM over the numeric bind -> HAVING
    -> ORDER BY -> LIMIT.  HAVING is a vectorized post-aggregate mask
    (each group is one row by then -- no exchange); SUM rides the same
    single bucketed exchange as the other plain aggregates."""
    from ontology_time_machine_ray.schema import RDFS_IS_DEFINED_BY
    from ontology_time_machine_ray.stages.bgp import bgp_select

    t = _spo_store(sf_dir)
    return bgp_select(
        t,
        [("?term", RDFS_IS_DEFINED_BY, "?ont")],
        binds={"tlen": ("strlen", "?term")},
        group_by=["?ont"],
        aggs={"n_terms": ("count_distinct", "?term"), "sum_len": ("sum", "?tlen")},
        having=[("n_terms", ">=", 3)],
        order_by=[("sum_len", "desc"), ("ont", "asc")],
        limit=10,
    )


def kg_walks(sf_dir: str):
    """Deterministic random-walk corpus over the triple graph -- the
    DeepWalk/node2vec graph-ML data-prep step: 2 walks of up to 4 hops
    from every node with out-edges; the hop at step s of walk w from
    node u is neighbor md5_64("w:{w}:{s}:{u}") % deg(u) of u's sorted
    neighbor list (a pure row function: rerun/partitioning-invariant,
    replayable as an unrolled SQL oracle).  Distributed: indexed
    adjacency pinned once, ONE bucketed (node, idx) join per step,
    frontier-sized shuffles, early exit at sinks
    (``graph.random_walks``)."""
    from ontology_time_machine_ray.stages.graph import random_walks

    t = _spo_store(sf_dir)
    edges = t.map_batches(
        lambda df: df.loc[df["subj"] != df["obj"], ["subj", "obj"]].rename(
            columns={"subj": "a", "obj": "b"}
        ),
        batch_format="pandas",
    )
    return random_walks(edges, walks_per_node=2, length=4)


def kg_skipgrams(sf_dir: str):
    """Skip-gram co-occurrence counts over the deterministic walk corpus
    (window 2) -- the (center, context, n_pairs) table a node-embedding
    trainer consumes; walks are short so the within-walk expansion is a
    bounded self-merge in one walk-bucketed pass
    (``graph.walk_skipgrams`` over ``kg_walks`` -- the walk corpus and
    its parameters live in ONE place)."""
    from ontology_time_machine_ray.stages.graph import walk_skipgrams

    return walk_skipgrams(kg_walks(sf_dir), window=2)


def kg_skipgram_negatives(sf_dir: str):
    """Negative samples for the skip-gram pairs (word2vec training
    input, Mikolov et al. 2013): k=3 deterministic md5-mod-|V| draws
    from the walk-corpus vocabulary per (center, context) pair
    (``graph.walk_negative_samples``); the oracle re-derives vocabulary
    indexes and the same md5 draws in SQL."""
    from ontology_time_machine_ray.stages.graph import walk_negative_samples

    return walk_negative_samples(kg_walks(sf_dir), window=2)


def kg_bfs(sf_dir: str):
    """Seeded multi-source BFS over the triple graph: minimum hop count
    from any of the VALUES seed entities along directed (subj -> obj)
    edges -- the "neighborhood of these entities" traversal a consumer
    runs after a lookup.  Work is proportional to the REACHABLE region
    (frontier-sized shuffles, early exit at the fixpoint), not the
    graph (``graph.bfs_from_seeds``)."""
    from ontology_time_machine_ray.stages.graph import bfs_from_seeds

    t = _spo_store(sf_dir)
    edges = t.map_batches(
        lambda df: df.loc[df["subj"] != df["obj"], ["subj", "obj"]].rename(
            columns={"subj": "a", "obj": "b"}
        ),
        batch_format="pandas",
    )
    return bfs_from_seeds(edges, KG_VALUES_SEEDS)


def kg_sparql_agg(sf_dir: str):
    """SPARQL SELECT with the full solution-modifier chain -- GROUP BY,
    COUNT(*) / COUNT(DISTINCT) / MIN / MAX aggregates, ORDER BY, LIMIT:
    the top-10 ontology namespaces by number of distinct defined terms
    (GROUP BY ?ont over { ?term rdfs:isDefinedBy ?ont }).  Plain
    aggregates ride one bucketed exchange on ?ont; the COUNT(DISTINCT)
    is a two-level plan (pair dedup bucketed on BOTH columns, so a hub
    namespace spreads across buckets instead of melting one); LIMIT is
    a per-block partial top-k with a blocks x k final cut."""
    from ontology_time_machine_ray.schema import RDFS_IS_DEFINED_BY
    from ontology_time_machine_ray.stages.bgp import bgp_select

    t = _spo_store(sf_dir)
    return bgp_select(
        t,
        [("?term", RDFS_IS_DEFINED_BY, "?ont")],
        group_by=["?ont"],
        aggs={
            "n_bindings": ("count", "*"),
            "n_terms": ("count_distinct", "?term"),
            "first_term": ("min", "?term"),
            "last_term": ("max", "?term"),
        },
        order_by=[("n_terms", "desc"), ("ont", "asc")],
        limit=10,
    )


def kg_shacl_report(sf_dir: str):
    """SHACL-lite validation report over the constructed store
    (``stages/shacl.py``): ClassShape targets owl:Class instances and
    asserts exactly-one rdfs:isDefinedBy whose value is a non-slash-
    terminated IRI; SameAsShape targets owl:sameAs subjects and asserts
    they are typed at all and that their sameAs peers are typed
    owl:Class.  One row per violation -- the KG data-quality gate."""
    from ontology_time_machine_ray.schema import (
        OWL_CLASS,
        OWL_SAME_AS,
        RDF_TYPE,
        RDFS_IS_DEFINED_BY,
    )
    from ontology_time_machine_ray.stages.shacl import validate

    t = _spo_store(sf_dir)
    return validate(
        t,
        [
            {
                "shape": "ClassShape",
                "target": ("class", OWL_CLASS),
                "constraints": [
                    ("minCount", RDFS_IS_DEFINED_BY, 1),
                    ("maxCount", RDFS_IS_DEFINED_BY, 1),
                    ("pattern", RDFS_IS_DEFINED_BY, "[^/]$"),
                ],
            },
            {
                "shape": "SameAsShape",
                "target": ("subjects_of", OWL_SAME_AS),
                "constraints": [
                    ("minCount", RDF_TYPE, 1),
                    ("class", OWL_SAME_AS, OWL_CLASS),
                ],
            },
        ],
    )


def kg_void_stats(sf_dir: str):
    """VoID-style dataset statistics: per predicate, the triple count
    and the exact distinct subject / object counts -- the dataset
    descriptor a published KG ships.  Scale shape: predicates are FEW
    but HUGE (rdf:type is ~half the store), so nothing groups directly
    on the predicate: triple counts are per-batch partial counts summed
    in a tiny exchange, and each distinct count first dedups the
    (pred, node) PAIR relation -- bucketed on both columns, spreading a
    hot predicate across every bucket -- then sums per-batch partials.
    The three per-predicate tables (rows = #predicates) merge on the
    driver."""
    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
    )

    t = _spo_store(sf_dir)

    def partial(col: str, out: str):
        def fn(df):
            return df.groupby("pred", as_index=False).agg(**{out: (col, "size")})

        return fn

    def pair_distinct_count(col: str, out: str):
        pairs = grouped_apply(
            t.map_batches(
                lambda df, col=col: df[["pred", col]].drop_duplicates(),
                batch_format="pandas",
            ),
            ["pred", col],
            lambda g: g.drop_duplicates(),
        )
        return grouped_aggregate(
            pairs.map_batches(partial(col, out), batch_format="pandas"),
            ["pred"],
            {out: (out, "sum")},
        )

    n_triples = grouped_aggregate(
        t.map_batches(partial("subj", "n_triples"), batch_format="pandas"),
        ["pred"],
        {"n_triples": ("n_triples", "sum")},
    ).to_pandas()
    n_subj = pair_distinct_count("subj", "n_subjects").to_pandas()
    n_obj = pair_distinct_count("obj", "n_objects").to_pandas()
    out = n_triples.merge(n_subj, on="pred").merge(n_obj, on="pred")
    return out[["pred", "n_triples", "n_subjects", "n_objects"]]


def kg_construct(sf_dir: str):
    """SPARQL CONSTRUCT -- the entailment-materialization primitive:
    symmetrize owl:sameAs and propagate owl:Class typing across it
    (CONSTRUCT { ?peer sameAs ?cls . ?peer a owl:Class } WHERE
    { ?cls sameAs ?peer . ?cls a owl:Class }).  Output is a distinct
    triple graph in the store's native shape, ready to union back in."""
    from ontology_time_machine_ray.schema import OWL_CLASS, OWL_SAME_AS, RDF_TYPE
    from ontology_time_machine_ray.stages.bgp import construct_triples

    t = _spo_store(sf_dir)
    return construct_triples(
        t,
        where=[("?cls", OWL_SAME_AS, "?peer"), ("?cls", RDF_TYPE, OWL_CLASS)],
        template=[("?peer", OWL_SAME_AS, "?cls"), ("?peer", RDF_TYPE, OWL_CLASS)],
    )


KG_KCORE_K = 2
KG_KCORE_ROUNDS = 3


def kg_kcore(sf_dir: str):
    """k-core of the ontology co-mention graph: the densely co-used
    ontology cluster after iteratively peeling ontologies co-mentioned
    with fewer than k others (``stages/graph.kcore``); (ontology_id,
    in-core degree) rows."""
    from ontology_time_machine_ray.stages.graph import cooccurrence_edges, kcore

    out = kcore(
        cooccurrence_edges(_pipe(sf_dir).mentions()),
        k=KG_KCORE_K,
        rounds=KG_KCORE_ROUNDS,
    )
    return out.map_batches(
        lambda df: df.rename(columns={"node": "ontology_id"}), batch_format="pandas"
    )


#: the time-machine sweep coordinates: spans the fixture's version range
#: (2019 versions -> some ontologies unresolvable at the first coord)
KG_TIMELINE_TS = ("2019-06-01", "2020-06-01", "2021-06-01", "2022-06-01")


def kg_timeline(sf_dir: str):
    """Time-machine timeline: the SAME corpus resolved at each of the K
    sweep coordinates (the reference's whole premise generalized from
    kg_version_diff's 2 coords), emitting per coordinate the store size
    and the churn vs the previous coordinate: (ts, n_triples, n_added,
    n_removed) on the logical (subj, pred, obj) key.  The first
    coordinate counts everything as added (diff vs the empty store).

    Scale shape (fused): ONE ``MultiConfigLinker`` actor-pool pass
    links every mention batch at all K coordinates (snapshot state
    loaded once per actor, mention stream read once, no per-coordinate
    pools), then a single subj-bucketed pass folds each logical triple's
    K-coordinate presence into a bitmask -- per-coordinate DISTINCTNESS
    folds into the same pass as a (key, coord) dedup before the bit sum,
    replacing the K dedup exchanges the unfused plan paid -- and reduces
    it to per-bucket transition counts, so the driver merges buckets x K
    rows; corpus-scale data crosses exactly ONE exchange end to end."""
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    p = _pipe(sf_dir)
    key = ["subj", "pred", "obj"]
    k_coords = len(KG_TIMELINE_TS)

    allu = p.triples_tagged_at(KG_TIMELINE_TS).map_batches(
        # local combiner: the linker emits per-batch-distinct rows per
        # coordinate, but the projection to the logical key can re-dup
        lambda df: df[key + ["coord"]].drop_duplicates(),
        batch_format="pandas",
    )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        # exact (key, coord) dedup inside the bucket: each coordinate
        # contributes its bit at most once, so the sum IS the bitmask OR
        d = g.drop_duplicates(key + ["coord"])
        m = (
            d.assign(bit=np.int64(1) << d["coord"].to_numpy(dtype="int64"))
            .groupby(key, as_index=False)
            .agg(mask=("bit", "sum"))
        )
        mask = m["mask"].to_numpy(dtype="int64")
        rows = []
        for i in range(k_coords):
            present = (mask >> i) & 1
            prev = (mask >> (i - 1)) & 1 if i else np.zeros_like(present)
            rows.append(
                (
                    i,
                    int(present.sum()),
                    int((present & ~prev & 1).sum()),
                    int((~present & prev & 1).sum()),
                )
            )
        return pd.DataFrame(rows, columns=["coord", "n_triples", "n_added", "n_removed"])

    parts = grouped_apply(allu, key, bucket_counts, bucket_keys=["subj"]).to_pandas()
    out = parts.groupby("coord", as_index=False).sum()
    out["ts"] = out["coord"].map(dict(enumerate(KG_TIMELINE_TS)))
    return out[["ts", "n_triples", "n_added", "n_removed"]].astype(
        {"n_triples": "int64", "n_added": "int64", "n_removed": "int64"}
    )


#: fixed label-propagation round count: keeps the community detection
#: deterministic AND oracle-replayable (the SQL unrolls one level/round)
KG_LP_ROUNDS = 2


def kg_communities(sf_dir: str):
    """Community detection over the ontology co-mention graph: 2 rounds
    of synchronous majority-vote label propagation (Raghavan et al. 2007),
    deterministic ties (most frequent neighbour label, then smallest).
    Per round: one bucketed join + one node-bucketed vectorized argmax --
    no driver graph state (``stages/graph.label_propagation``)."""
    from ontology_time_machine_ray.stages.graph import (
        cooccurrence_edges,
        label_propagation,
    )

    out = label_propagation(
        cooccurrence_edges(_pipe(sf_dir).mentions()), rounds=KG_LP_ROUNDS
    )
    return out.map_batches(
        lambda df: df.rename(columns={"node": "ontology_id", "label": "community"}),
        batch_format="pandas",
    )


def kg_doc_stats(sf_dir: str):
    """Per-document KG enrichment: mention count, index-match count, and
    emitted-triple count -- the three partials co-located by ONE doc_id
    bucket shuffle (mention rows side-tagged with triple rows), merged and
    finished vectorized per bucket."""
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    p = _pipe(sf_dir)
    cols = ["doc_id", "n_mentions", "n_matched", "n_triples", "_side"]

    m_part = p.mentions().map_batches(
        lambda df: df.assign(_hit=df["ontology_id"].notna().astype("int64"))
        .groupby("doc_id", as_index=False)
        .agg(n_mentions=("_hit", "size"), n_matched=("_hit", "sum"))
        .assign(_side="m")
        .reindex(columns=cols),
        batch_format="pandas",
    )
    t_part = p.triples().map_batches(
        lambda df: df.groupby("doc_id", as_index=False)
        .agg(n_triples=("doc_id", "size"))
        .assign(_side="t")
        .reindex(columns=cols),
        batch_format="pandas",
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g[g["_side"] == "m"][["doc_id", "n_mentions", "n_matched"]]
            .astype({"n_mentions": "int64", "n_matched": "int64"})
            .groupby("doc_id", as_index=False)
            .agg(n_mentions=("n_mentions", "sum"), n_matched=("n_matched", "sum"))
        )
        t = (
            g[g["_side"] == "t"][["doc_id", "n_triples"]]
            .astype({"n_triples": "int64"})
            .groupby("doc_id", as_index=False)
            .agg(n_triples=("n_triples", "sum"))
        )
        out = m.merge(t, on="doc_id", how="left")
        out["n_triples"] = out["n_triples"].fillna(0).astype("int64")
        return out

    return grouped_apply(m_part.union(t_part), ["doc_id"], finish)


def kg_pagerank(sf_dir: str) -> pd.DataFrame:
    """Distributed PageRank over the dependency manifest (iterative:
    bucketed join + aggregate per round).  Fixed-point int64 arithmetic
    makes the iteration bit-exact across numpy / pandas / DuckDB, so the
    oracle is a 5x-unrolled SQL statement, not a rows-only check."""
    from ontology_time_machine_ray.stages.graph import dependency_pagerank

    paths = ensure_fixtures(sf_dir)
    return dependency_pagerank(paths.dependencies)


#: (fixture_root -> (store_dir, median doc_id)) -- the incremental store
#: is built once per process; kg_incremental and kg_store_asof share it.
_INCR_STORE: dict[str, tuple] = {}

_STORE_COLS = ["subj", "pred", "obj", "doc_id", "ontology_version", "format"]


def incremental_split_mid(sf_dir: str) -> str:
    """Median doc_id of the interleaved corpus: the base/delta boundary
    used by the incremental-store queries AND their oracles."""
    import pyarrow.parquet as pq

    paths = ensure_fixtures(sf_dir)
    ids = sorted(pq.read_table(paths.documents, columns=["doc_id"])["doc_id"].to_pylist())
    return ids[len(ids) // 2]


def _incremental_store(sf_dir: str, canonical: bool = False) -> tuple:
    """Build the two-phase store: base half (store version 0), then merge
    the delta half (store version 1) -- plain ``KgPipeline.update`` or
    ``update_canonical`` (sameAs-mapping repair) per ``canonical``."""
    import hashlib
    import shutil

    paths = ensure_fixtures(sf_dir)
    key = ("canon", paths.root) if canonical else paths.root
    if key in _INCR_STORE:
        return _INCR_STORE[key]
    mid = incremental_split_mid(sf_dir)
    base = KgPipeline(paths=paths, doc_id_range=(None, mid))
    # keyed by CORPUS as well as config: two sf_dirs with the same default
    # config must not clobber each other's store under a live cache entry
    tag = hashlib.sha1(paths.root.encode()).hexdigest()[:8]
    root = "/tmp/otm_incr_canon" if canonical else "/tmp/otm_incr"
    out = os.path.join(root, f"{tag}_{base.config_hash()}")
    if os.path.isdir(out):
        shutil.rmtree(out)
    base.materialize(out, canonical=canonical)
    delta = KgPipeline(paths=paths, doc_id_range=(mid, None))
    (delta.update_canonical if canonical else delta.update)(out)
    _INCR_STORE[key] = (out, mid)
    return out, mid


def kg_incremental_canonical(sf_dir: str):
    """Incremental CANONICAL store update: build the canonical store from
    the first half of the corpus, then merge the second half with
    ``KgPipeline.update_canonical`` -- the persisted sameAs mapping is
    repaired with the delta's edges (components only ever merge), moved
    representatives are rewritten through the store, and the result is
    provably identical to a one-shot canonical build, so it shares
    kg_triples_canonical's SQL oracle."""
    from ontology_time_machine_ray.sources.writers import read_store_asof

    out, _ = _incremental_store(sf_dir, canonical=True)
    return read_store_asof(out, version=None, columns=_STORE_COLS)


def kg_incremental(sf_dir: str):
    """Incremental store update (time-machine continuous ingest): build
    the non-canonical store from the first half of the corpus, merge the
    second half in with ``KgPipeline.update`` (only touched partitions
    are read/rewritten), and return the final store contents.  The result
    equals a full one-shot build by construction, so it shares
    kg_triples' SQL oracle -- the equality IS the correctness claim."""
    from ontology_time_machine_ray.sources.writers import read_store_asof

    out, _ = _incremental_store(sf_dir)
    return read_store_asof(out, version=None, columns=_STORE_COLS)


def kg_store_asof(sf_dir: str):
    """Time-travel read: the incremental store AS OF version 0 (before
    the delta merge).  Copy-on-write versioning in ``update_partitioned``
    keeps each superseded partition file tagged with its version, so the
    read resolves per partition with no store-wide snapshot state.  The
    oracle is kg_triples restricted to the base half -- per-key min dedup
    ordered by doc_id first means the base-half build equals the full
    dedup filtered to doc_id < mid."""
    from ontology_time_machine_ray.sources.writers import read_store_asof

    out, _ = _incremental_store(sf_dir)
    return read_store_asof(out, version=0, columns=_STORE_COLS)


def kg_lookup(sf_dir: str) -> pd.DataFrame:
    """Partition-pruned entity dereference from the PERSISTED store (the
    serving path): the subject's stable hash names its partition
    directory, so the lookup resolves and scans exactly ONE partition
    file -- O(store/P) I/O at any corpus size -- with the same
    per-partition time-travel resolution as a full read.  Store = the
    incremental build (== the one-shot build by the kg_incremental
    claim), so the oracle is the one-shot dedup filtered to the seed."""
    from ontology_time_machine_ray.sources.writers import read_store_entity

    out, _ = _incremental_store(sf_dir)
    return read_store_entity(out, KG_VALUES_SEEDS[0], columns=_STORE_COLS)


def kg_dependency_closure(sf_dir: str) -> pd.DataFrame:
    """J5: dependency-manifest transitive closure (the reference's dormant
    graph walk, proxy_logic.py:276-307) via distributed path doubling."""
    from ontology_time_machine_ray.stages.graph import dependency_closure

    paths = ensure_fixtures(sf_dir)
    return dependency_closure(paths.dependencies)


def kg_dependency_closure_ttl(sf_dir: str) -> pd.DataFrame:
    """J5 via RDF-format ingestion: the dependency manifest parsed from
    its Turtle form (the reference's tests/dependency.ttl shape) instead
    of the parquet edge table; checked against the same recursive-CTE
    oracle, proving parse + closure end to end."""
    import ray.data as rd

    from ontology_time_machine_ray.sources.readers import read_dependency_ttl
    from ontology_time_machine_ray.stages.graph import dependency_closure

    paths = ensure_fixtures(sf_dir)
    edges = rd.from_arrow(read_dependency_ttl(paths.dependencies_ttl, paths.ontology_index))
    return dependency_closure(paths.dependencies, edges_ds=edges)


def media_catalog(sf_dir: str):
    paths = ensure_fixtures(sf_dir)
    return media.media_catalog(paths.documents)


def media_frames(sf_dir: str):
    """Full multimodal chain: explode -> decode -> resize -> frame-sample
    (stubbed codecs, real plumbing).  The stub arithmetic is deterministic
    in length(media_ref), so the chain gets a full SQL oracle."""
    paths = ensure_fixtures(sf_dir)
    return media.media_pipeline(paths.documents)


def media_decode(sf_dir: str):
    """REAL byte-level media decode (no codec library: P6 PPM and RIFF
    PCM WAV parsed from their published formats, truncated payloads
    flagged not crashed).  Oracle: the generator formulas +
    octet_length(payload) -- two independent derivations of the same
    metadata, one from bytes, one from the recipe."""
    paths = ensure_fixtures(sf_dir)
    return media.media_decode_assets(paths.media_assets)


def media_features(sf_dir: str):
    """Decode + numeric feature extraction from media BYTES (the stage a
    training pipeline runs after decode): PPM nearest-neighbor thumbnail
    channel sums + WAV PCM energy, in an actor pool over small batches.
    Oracle: generator-formula replay through the same thumbnail/energy
    math."""
    paths = ensure_fixtures(sf_dir)
    return media.media_features(paths.media_assets)


def media_decode_frames(sf_dir: str):
    """Frame sampling over REAL decoded PCM frame counts (the fake=False
    FrameSampler path)."""
    paths = ensure_fixtures(sf_dir)
    return media.media_decode_frames(paths.media_assets)


def media_phash(sf_dir: str):
    """Image near-dup detection by perceptual average-hash: decode each
    PPM from bytes, integer aHash (8x8 thumbnail, mean threshold), one
    hash-bucketed pass labels cluster representative + size."""
    paths = ensure_fixtures(sf_dir)
    return media.media_phash_dedup(paths.media_assets)


# --------------------------- training-data ops ------------------------ #
def _alt_format_stats(ds):
    """(doc_id, n_chars, n_tokens) from an alternate-format read -- the
    shared transform behind docs_jsonl_stats / docs_csv_stats."""
    def stats(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].astype("string").fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_chars": texts.str.len().to_numpy("int64"),
                "n_tokens": texts.str.count(r"\S+").to_numpy("int64"),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def docs_jsonl_stats(sf_dir: str):
    """Documents ingested from JSON-Lines (``ray.data.read_json``) -- the
    source-format coverage query.  Oracle reads the same bytes with
    DuckDB's ``read_json_auto``, so the whole ingest path is compared,
    not just the transform."""
    import ray.data as rd

    paths = ensure_fixtures(sf_dir)
    return _alt_format_stats(rd.read_json(paths.documents_jsonl))


def docs_csv_stats(sf_dir: str):
    """Documents ingested from RFC-4180 CSV (``ray.data.read_csv`` --
    Arrow CSV, quoted fields) vs DuckDB ``read_csv_auto``."""
    import ray.data as rd

    paths = ensure_fixtures(sf_dir)
    return _alt_format_stats(rd.read_csv(paths.documents_csv))


def pii_scrub(sf_dir: str):
    """PII redaction over the planted-PII documents fixture (the raw
    synthetic corpus contains no emails/phones/IPs, so the fixture keeps
    the oracle non-vacuous)."""
    paths = ensure_fixtures(sf_dir)
    return textops.pii_scrub(paths.documents_pii)


#: df bounds for the registry's inverted-index query: singletons dropped,
#: near-ubiquitous (stopword-grade) terms elided -- both bounds exercised
#: non-trivially at sf0.01 (500 docs).
INVINDEX_MIN_DF = 2
INVINDEX_MAX_DF = 400


def inverted_index(sf_dir: str):
    return textops.inverted_index(
        sf_dir, min_df=INVINDEX_MIN_DF, max_df=INVINDEX_MAX_DF
    )


DUP_NGRAM_N = 5


def _dup_run_stats(sf_dir: str):
    """Per-doc maximal duplicated-run statistics (detection-side
    companion of the run-merged ExactSubstr removal)."""
    return textops.dup_run_stats(sf_dir, n=DUP_NGRAM_N)


def dup_ngrams(sf_dir: str):
    return textops.dup_ngrams(sf_dir, n=DUP_NGRAM_N)


WINNOW_MIN_SHARED = 2
WINNOW_MAX_FP_DF = 50


def winnow_dup_pairs(sf_dir: str):
    return textops.winnow_dup_pairs(
        sf_dir, min_shared=WINNOW_MIN_SHARED, max_fp_df=WINNOW_MAX_FP_DF
    )


TFIDF_K = 5

#: BM25 retrieval: fixed term query + cutoff (deterministic, in-vocabulary
#: terms of distinct document frequencies on the synthetic corpus).
BM25_QUERY = ("vector", "window", "merge")
BM25_K = 10


def tfidf_topk(sf_dir: str):
    return textops.tfidf_topk(sf_dir, k=TFIDF_K)


def text_bm25(sf_dir: str):
    return textops.bm25_topk(sf_dir, query_terms=BM25_QUERY, k=BM25_K)


def dedup_minhash(sf_dir: str):
    return dedup_docs.minhash_clusters(sf_dir)


def _corpus_curate(sf_dir: str):
    """Full model-aware curation funnel: classifier accept AND quality
    floor AND MinHash-cluster quality-keeper (stages/dedup_docs
    .corpus_curate -- one streaming pass + two bucketed joins)."""
    from ontology_time_machine_ray.stages.dedup_docs import corpus_curate

    return corpus_curate(sf_dir)


def dedup_quality_keep(sf_dir: str):
    return dedup_docs.quality_dedup_keep(sf_dir)


def dedup_simhash(sf_dir: str):
    return dedup_docs.simhash_pairs(sf_dir)


def dedup_jaccard(sf_dir: str):
    return dedup_docs.jaccard_pairs(sf_dir)


def dedup_embed_keep(sf_dir: str):
    """End-to-end embedding dedup: surviving ids after near-dup components
    are collapsed (pairs -> union-find -> anti join); see
    similarity.embedding_dedup_keep."""
    return similarity.embedding_dedup_keep(sf_dir)


def dedup_semantic(sf_dir: str):
    """SemDeDup-style semantic dedup: k-means clusters, then drop every
    vector with a lower-id same-cluster neighbour at cosine >= 0.95; pair
    work is bounded per cluster, never corpus-wide (similarity.semantic_dedup)."""
    return similarity.semantic_dedup(sf_dir)


def embed_outliers(sf_dir: str):
    """Embedding-space outliers: vectors whose cosine to their own
    k-means centroid is below the threshold (vector-corpus QA)."""
    return similarity.embedding_outliers(sf_dir)


def embed_pca(sf_dir: str):
    """Top principal direction of the embedding corpus by integer power
    iteration: one corpus-scale second-moment pass (per-batch Q^T Q
    partials, d^2-bounded), driver matvecs at vocabulary scale."""
    return similarity.embed_pca_power(sf_dir)


def embed_kmeans(sf_dir: str):
    """Distributed k-means assignments over the embedding column
    (deterministic Lloyd).  The oracle unrolls the 3 Lloyd rounds into
    SQL CTEs -- the discrete cluster output is stable across engines."""
    return similarity.embed_kmeans(sf_dir)


def dedup_embed(sf_dir: str):
    """Embedding-cosine near-dup pairs over the augmented embeddings table
    (planted near-duplicates; see fixtures.build_embeddings_aug) via
    banded-LSH blocking + exact within-bucket cosine."""
    return similarity.embedding_dup_pairs(sf_dir).select_columns(["a", "b"])


def ann_bruteforce(sf_dir: str) -> pd.DataFrame:
    return similarity.ann_bruteforce(sf_dir)


def ann_recall(sf_dir: str) -> pd.DataFrame:
    return similarity.ann_recall(sf_dir)


def ann_lsh(sf_dir: str) -> pd.DataFrame:
    return similarity.ann_lsh(sf_dir)


def ann_pq(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN (Jegou et al. 2011): per-subspace L2
    codebooks trained in m-subspaces-at-once distributed Lloyd rounds,
    then ONE encode+ADC-lookup pass (m table lookups per row per query
    instead of a dim-length dot).  Oracle replays the unrolled subspace
    k-means, the encoding and the lookup scoring in SQL."""
    return similarity.ann_pq(sf_dir)


def _ann_ivfpq_recall(sf_dir: str) -> pd.DataFrame:
    """recall@k of the composed IVF-PQ index vs brute force; oracle
    composes the two unrolled statements like ann_recall does."""
    return similarity.ann_ivfpq_recall(sf_dir)


def ann_ivfpq(sf_dir: str) -> pd.DataFrame:
    """Composed IVF-PQ (FAISS IVFPQ shape): coarse lists prune the read,
    residual product-quantization codes + ADC score the probed lists.
    Oracle unrolls both k-means stages, the residuals, the probe filter
    and the lookup scoring in SQL."""
    return similarity.ann_ivfpq(sf_dir)


def _range_layout(sf_dir: str):
    """Range-clustered layout + pruned range read (see stages/layout.py):
    lineitem clustered into per-price-range directories by exact
    histogram quantile boundaries; the query reads ONLY the overlapping
    directories.  Oracle: plain full-scan filter -- equality pins pruning
    completeness."""
    from ontology_time_machine_ray.stages.layout import range_layout_query

    return range_layout_query(sf_dir)


def _grid_layout(sf_dir: str):
    """2-D grid-clustered layout (price x ship-date) + rectangle query
    reading only the overlapping cells (see stages/layout.py) -- the
    multi-dimensional pruning a lakehouse Z-order clustering buys.
    Oracle: plain full-scan rectangle filter."""
    from ontology_time_machine_ray.stages.layout import grid_layout_query

    return grid_layout_query(sf_dir)


def _entity_resolution(sf_dir: str):
    """Entity resolution composition: blocked fuzzy join -> distributed
    connected components -> canonical-name rewrite (see stages/fuzzy.py).
    Oracle: recursive reach-closure CTE over levenshtein edges."""
    from ontology_time_machine_ray.stages.fuzzy import entity_resolution

    return entity_resolution(sf_dir)


def _fuzzy_join(sf_dir: str):
    """Fuzzy string self-join on part names (edit distance in [1,2]) via
    COMPLETE deletion-neighborhood blocking (FastSS) at the distinct-name
    grain; exact batch-DP verification (see stages/fuzzy.py)."""
    from ontology_time_machine_ray.stages.fuzzy import fuzzy_name_pairs

    return fuzzy_name_pairs(sf_dir)


def _top_terms_sketch(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries heavy-hitter sketch (see stages/sketch.py): top terms by
    occurrence with NO shuffle -- exact below counter saturation, so
    checkable against the exact SQL at test scale; bounded-undercount
    estimate at corpus scale."""
    from ontology_time_machine_ray.stages.sketch import top_terms_sketch

    return top_terms_sketch(sf_dir)


def _pack_sequences(sf_dir: str):
    """Token-budget sequence packing via distributed prefix sum (see
    stages/packing.py); oracle is a single SQL window cumsum."""
    from ontology_time_machine_ray.stages.packing import pack_sequences

    return pack_sequences(sf_dir)


def _text_bpe_encode(sf_dir: str):
    """Real merge-table BPE (train + vectorized encode, stages/bpe.py);
    oracle joins the scalar-reference vocab fixture."""
    from ontology_time_machine_ray.stages.bpe import text_bpe_encode

    return text_bpe_encode(sf_dir)


def _chunk_bpe_counts(sf_dir: str):
    """Per-chunk whitespace vs real-BPE token counts (context-window
    sizing under the actual tokenizer)."""
    from ontology_time_machine_ray.stages.bpe import chunk_bpe_counts

    return chunk_bpe_counts(sf_dir)


def _text_bpe_merges(sf_dir: str):
    """The trained merge table (trainer-level oracle: the scalar-reference
    trainer's fixture rows)."""
    from ontology_time_machine_ray.stages.bpe import text_bpe_merges

    return text_bpe_merges(sf_dir)


def _pack_sequences_bpe(sf_dir: str):
    """Sequence packing under REAL BPE token counts: the same prefix-sum
    plan as pack_sequences with the counts side swapped to the trained
    tokenizer's post-merge counts."""
    from ontology_time_machine_ray.stages.bpe import bpe_token_counts
    from ontology_time_machine_ray.stages.packing import pack_sequences

    return pack_sequences(sf_dir, counts_ds=bpe_token_counts(sf_dir))


def _chunk_documents(sf_dir: str):
    """Overlapping token-window chunking (RAG / context-window prep); one
    map_batches pass, no shuffle (see stages/packing.py)."""
    from ontology_time_machine_ray.stages.packing import chunk_documents

    return chunk_documents(sf_dir)


def _chunk_pack(sf_dir: str):
    """The actual pretraining prep chain as ONE composition: chunk long
    documents into overlapping token windows, then pack the CHUNKS into
    fixed-budget training shards (chunking bounds sequence length; the
    distributed prefix-sum packer assigns shards).  Chunk identity rides
    as doc_id * 4096 + chunk_idx so the packer's id-ordered
    concatenation preserves (doc, window) order."""
    import numpy as np

    from ontology_time_machine_ray.stages.packing import (
        chunk_documents,
        pack_sequences,
    )

    def as_docs(df: pd.DataFrame) -> pd.DataFrame:
        idx = df["chunk_idx"].to_numpy(dtype="int64")
        if len(idx) and idx.max() >= 4096:
            raise ValueError("chunk_idx >= 4096 breaks the composite id")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype="int64") * 4096 + idx,
                "text": df["chunk_text"],
            }
        )

    chunks = chunk_documents(sf_dir).map_batches(as_docs, batch_format="pandas")
    return pack_sequences(sf_dir, docs_ds=chunks)


def _shuffle_index(sf_dir: str):
    """Deterministic global shuffle order (md5 rank) via ordered
    hash-prefix buckets -- no global sort (see stages/packing.py)."""
    from ontology_time_machine_ray.stages.packing import global_shuffle_index

    return global_shuffle_index(sf_dir)


def _corpus_to_shards(sf_dir: str, budget: int = 2048):
    """The end-to-end training-data assembly funnel as ONE composition:
    FineWeb-style curation (classifier + quality floor + MinHash
    quality-keeper), then real-BPE token counts of the survivors
    (tokenizer trained on the FULL corpus so the scalar-reference vocab
    fixture replays it), then token-budget shard assignment via the
    distributed prefix sum.  Adds one doc_id-bucketed semi join and one
    shuffle-free encode pass on top of the parts; nothing broadcasts,
    nothing materializes the corpus."""
    import ray

    from ontology_time_machine_ray.stages.bpe import BpeEncoder, bpe_model
    from ontology_time_machine_ray.stages.dedup_docs import corpus_curate
    from ontology_time_machine_ray.stages.groupagg import bucketed_join
    from ontology_time_machine_ray.stages.packing import pack_sequences
    from ontology_time_machine_ray.stages.textops import _read_docs

    survivors = corpus_curate(sf_dir).map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"].astype("int64")}),
        batch_format="pandas",
    )
    subset = bucketed_join(
        _read_docs(sf_dir),
        survivors,
        on=["doc_id"],
        how="semi",
        left_schema={"doc_id": "int64", "text": "object"},
        right_schema={"doc_id": "int64"},
    )
    model_ref = ray.put(bpe_model(sf_dir))  # trained on the FULL corpus
    counts = subset.map_batches(
        BpeEncoder,
        fn_constructor_args=(model_ref, False),
        batch_format="pandas",
        concurrency=4,
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": df["n_tokens"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    return pack_sequences(sf_dir, budget=budget, counts_ds=counts)


def _corpus_mix_temperature(sf_dir: str):
    """Temperature (sqrt-rule) corpus mixing with corpus-derived rates
    (stages/packing.corpus_mix_temperature); the oracle re-derives the
    same integer rates in SQL."""
    from ontology_time_machine_ray.stages.packing import corpus_mix_temperature

    return corpus_mix_temperature(sf_dir)


def _corpus_mix(sf_dir: str):
    """Weighted corpus mixing to target per-source rates (drop /
    downsample / fractional and integer upsample) -- deterministic
    hash-uniform selection, one map_batches pass, no shuffle."""
    from ontology_time_machine_ray.stages.packing import corpus_mix

    return corpus_mix(sf_dir)


def _events_users_kmv(sf_dir: str):
    """Grouped KMV: distinct users per hour, sketch composed inside the
    groupby (exact below per-group saturation -> COUNT(DISTINCT)
    oracle)."""
    from ontology_time_machine_ray.stages.sketch import events_users_kmv

    return events_users_kmv(sf_dir)


def _distinct_hll(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct estimate (stages/sketch.py): register merge
    is a commutative monoid like KMV, so each block ships 1 KB; the
    oracle replays registers, the dyadic harmonic sum (HUGEINT) and the
    frozen fixed-point alpha -- estimator-vs-estimator, bit exact."""
    from ontology_time_machine_ray.stages.sketch import distinct_customers_hll

    return distinct_customers_hll(sf_dir)


def _distinct_sketch(sf_dir: str) -> pd.DataFrame:
    """KMV cardinality sketch (see stages/sketch.py): exact below
    saturation -> checkable against count(DISTINCT) at test scale; the
    same shuffle-free operator degrades to a bounded-error estimate at
    corpus scale."""
    from ontology_time_machine_ray.stages.sketch import distinct_customers_sketch

    return distinct_customers_sketch(sf_dir)


def ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF ANN: k-means inverted lists materialized as one parquet
    directory per list; the query reads ONLY the probed lists (prune at
    the read).  The oracle replays the unrolled k-means lists, the probe
    ranking and the within-list exact top-k in SQL; pytest additionally
    pins exactness at n_probe == n_lists."""
    return similarity.ann_ivf(sf_dir)


QUERIES = {
    # KG pipeline (SURVEY.md §2 operator chain)
    "kg_mentions": kg_mentions,
    "kg_status": kg_status,
    "kg_report": kg_report,
    "kg_report_ab": kg_report_ab,
    "kg_nir_report": kg_nir_report,
    "kg_download_log": kg_download_log,
    "kg_triples": kg_triples,
    "kg_triples_from_rdf": kg_triples_from_rdf,
    "kg_triples_canonical": kg_triples_canonical,
    "kg_version_diff": kg_version_diff,
    "kg_components": kg_components,
    "kg_component_sizes": kg_component_sizes,
    "kg_entity_profile": kg_entity_profile,
    "kg_restricted_denied": kg_restricted_denied,
    "kg_formats_complete": kg_formats_complete,
    "kg_spans_passthrough": kg_spans_passthrough,
    "kg_incremental": kg_incremental,
    "kg_lookup": kg_lookup,
    "kg_incremental_canonical": kg_incremental_canonical,
    "kg_store_asof": kg_store_asof,
    "kg_dependency_closure": kg_dependency_closure,
    "kg_pagerank": kg_pagerank,          # fixed-point: unrolled SQL oracle
    "kg_dependency_closure_ttl": kg_dependency_closure_ttl,
    "kg_intercept_archivo": kg_intercept_archivo,
    "kg_intercept_modes": kg_intercept_modes,
    "kg_client_config": kg_client_config,
    "kg_client_intercept": kg_client_intercept,
    "kg_config_grid": kg_config_grid,
    "kg_doc_stats": kg_doc_stats,
    "kg_cooccur_triangles": kg_cooccur_triangles,
    "kg_communities": kg_communities,
    "kg_timeline": kg_timeline,
    "kg_two_hop": kg_two_hop,
    "kg_bgp": kg_bgp,
    "kg_bgp_optional": kg_bgp_optional,
    "kg_bgp_minus": kg_bgp_minus,
    "kg_bgp_union": kg_bgp_union,
    "kg_bgp_filter": kg_bgp_filter,
    "kg_bgp_values": kg_bgp_values,
    "kg_bgp_bind": kg_bgp_bind,
    "kg_bfs": kg_bfs,
    "kg_walks": kg_walks,
    "kg_skipgrams": kg_skipgrams,
    "kg_skipgram_negatives": kg_skipgram_negatives,
    "kg_ask": kg_ask,
    "kg_describe": kg_describe,
    "kg_path_query": kg_path_query,
    "kg_path_star": kg_path_star,
    "kg_head_status": kg_head_status,
    "kg_head_requests": kg_head_requests,
    "kg_sparql_agg": kg_sparql_agg,
    "kg_sparql_having": kg_sparql_having,
    "kg_shacl_report": kg_shacl_report,
    "kg_void_stats": kg_void_stats,
    "kg_construct": kg_construct,
    "kg_nt_roundtrip": kg_nt_roundtrip,
    "kg_kcore": kg_kcore,
    "kg_reachability": kg_reachability,
    "kg_subclass_closure": kg_subclass_closure,  # rdfs11 entailment, min depth
    "media_catalog": media_catalog,
    "media_frames": media_frames,
    "media_decode": media_decode,
    "media_features": media_features,
    "media_decode_frames": media_decode_frames,
    "media_phash": media_phash,
    # relational / events engine ops
    "rel_q1_lineitem": relational.q1_lineitem,
    "rel_topk_orders": relational.topk_orders,
    "rel_rank_parts_by_brand": relational.rank_parts_by_brand,
    "rel_orders_by_nation": relational.orders_by_nation,
    "rel_order_lineitem_join": relational.order_lineitem_join,
    "rel_full_outer": relational.customer_order_outer,
    "rel_brand_revenue": relational.brand_revenue,
    "rel_customers_no_urgent": relational.customers_no_urgent_orders,
    "rel_suppliers_with_returns": relational.suppliers_with_returns,
    "rel_price_quantiles": relational.price_quantiles,
    "rel_segment_quantiles": relational.segment_quantiles,
    "rel_pivot_orders": relational.pivot_orders,
    "rel_rollup_lineitem": relational.rollup_lineitem,
    "rel_cube_lineitem": relational.cube_lineitem,
    "events_window_funcs": relational.events_window_funcs,
    "rel_distinct_customers": relational.distinct_customers,
    "rel_distinct_sketch": _distinct_sketch,
    "rel_distinct_hll": _distinct_hll,
    "events_users_kmv": _events_users_kmv,
    "sample_docs_hash": relational.sample_docs_hash,
    "sample_stratified": textops.sample_stratified,
    "sample_weighted": textops.sample_weighted,
    "events_hourly": relational.events_hourly,
    "events_sessions": relational.events_sessions,
    "events_asof_join": relational.events_asof_join,
    "events_range_join": relational.events_range_join,
    "events_sliding": relational.events_sliding,
    "events_trends": relational.events_trends,
    "events_comovement": relational.events_comovement,
    "events_topk_users": events_topk_users,
    # text analysis
    "text_stats": textops.text_stats,
    "text_repetition": textops.text_repetition,
    "text_decontaminate": textops.decontaminate,
    "pack_sequences": _pack_sequences,
    "pack_sequences_bpe": _pack_sequences_bpe,
    "text_bpe_encode": _text_bpe_encode,
    "text_bpe_merges": _text_bpe_merges,
    "chunk_bpe_counts": _chunk_bpe_counts,
    "shuffle_index": _shuffle_index,
    "chunk_documents": _chunk_documents,
    "chunk_pack": _chunk_pack,
    "corpus_mix": _corpus_mix,
    "corpus_mix_temperature": _corpus_mix_temperature,
    "corpus_to_shards": _corpus_to_shards,
    "text_top_terms": textops.top_terms,
    "text_tokens_bpe": textops.tokens_bpe,
    "text_winnow": textops.winnow_fingerprints,
    "text_lm_coverage": textops.lm_coverage,
    "text_top_terms_sketch": _top_terms_sketch,
    "pii_scrub": pii_scrub,
    "docs_jsonl_stats": docs_jsonl_stats,
    "docs_csv_stats": docs_csv_stats,
    "inverted_index": inverted_index,
    "tfidf_topk": tfidf_topk,
    "text_bm25": text_bm25,
    "winnow_dup_pairs": winnow_dup_pairs,
    "dup_ngrams": dup_ngrams,
    "dup_run_stats": _dup_run_stats,
    "dedup_substrings": textops.dedup_substrings,
    "text_quality": textops.quality_score,
    "source_reputation": textops.source_reputation,
    "source_filter": textops.source_filter,
    "text_classify": textops.classifier_filter,
    "quality_top_pct": quality_top_pct,
    "quality_top_pct_by_source": quality_top_pct_by_source,
    "corpus_report": corpus_report,
    "rel_fuzzy_join": _fuzzy_join,
    "rel_range_layout": _range_layout,
    "rel_q3_shipping": relational.q3_shipping,
    "rel_q5_local_volume": relational.q5_local_volume,
    "rel_q7_nation_volume": relational.q7_nation_volume,
    "rel_q14_promo": relational.q14_promo_revenue,
    "rel_q13_custdist": relational.q13_custdist,
    "rel_q19_discounted": relational.q19_discounted_revenue,
    "rel_q18_large_orders": relational.q18_large_orders,
    "rel_cheapest_part": relational.cheapest_part,
    "events_funnel": relational.events_funnel,
    "rel_grid_layout": _grid_layout,
    "rel_entity_resolution": _entity_resolution,
    "rel_price_quantiles_cont": relational.price_quantiles_cont,
    "rel_profile": relational.profile_lineitem,
    "sample_per_group": textops.sample_per_group,
    "events_retention": relational.events_retention,
    "events_outliers": relational.events_outliers,
    "events_late_arrivals": relational.events_late_arrivals,
    "text_fingerprint": textops.fingerprints,
    "lang_id": textops.lang_id,
    # dedup family
    "dedup_exact": textops.dedup_exact,
    "dedup_incremental": textops.dedup_incremental,
    "dedup_segments": textops.dedup_segments,
    "corpus_clean": textops.corpus_clean,
    "dedup_jaccard": dedup_jaccard,
    "dedup_minhash": dedup_minhash,
    "dedup_quality_keep": dedup_quality_keep,
    "corpus_curate": _corpus_curate,
    "dedup_simhash": dedup_simhash,
    "dedup_embed": dedup_embed,
    "dedup_embed_keep": dedup_embed_keep,
    "dedup_semantic": dedup_semantic,
    "embed_kmeans": embed_kmeans,        # unrolled-Lloyd SQL oracle
    "embed_pca": embed_pca,              # integer power-iteration SQL oracle
    "embed_outliers": embed_outliers,    # unrolled-Lloyd + threshold SQL oracle
    # similarity search
    "ann_bruteforce": ann_bruteforce,
    "ann_lsh": ann_lsh,
    "ann_recall": ann_recall,
    "ann_ivf": ann_ivf,                  # unrolled k-means lists: full SQL oracle
    "ann_pq": ann_pq,                    # unrolled subspace k-means + ADC: full SQL oracle
    "ann_ivfpq": ann_ivfpq,              # composed IVF lists + residual PQ: full SQL oracle
    "ann_ivfpq_recall": _ann_ivfpq_recall,  # recall@k of the composed index
}


def _interleave_families(qs: dict) -> dict:
    """Round-robin the registry across operator families so any prefix
    window (the driver samples the first ~50 entries for its oracle-parity
    check) certifies the WHOLE surface -- kg, media, relational, events,
    text, dedup, sampling/packing, embedding, ann -- not just the family
    the dict literal happens to lead with.  Names and callables are
    untouched; only iteration order changes, and deterministically (family
    buckets keep the literal's internal order)."""
    fams: dict[str, list[str]] = {}
    prefixes = (
        "kg_", "media_", "rel_", "events_", "text_", "lang_", "pii_",
        "dedup_", "corpus_", "dup_", "winnow_", "inverted_", "tfidf_",
        "quality_", "source_", "sample_", "pack_", "chunk_", "shuffle_",
        "embed_", "ann_",
    )
    # coarser grouping: one bucket per top-level family so the round-robin
    # cycle length stays small and every 50-window sees each family
    fam_of = {
        "kg_": "kg", "media_": "media",
        "rel_": "rel", "events_": "events",
        "text_": "text", "lang_": "text", "pii_": "text",
        "inverted_": "text", "tfidf_": "text", "quality_": "text",
        "source_": "text", "winnow_": "text",
        "dedup_": "dedup", "corpus_": "dedup", "dup_": "dedup",
        "sample_": "pack", "pack_": "pack", "chunk_": "pack",
        "shuffle_": "pack",
        "embed_": "embed", "ann_": "ann",
    }
    for name in qs:
        fam = next((fam_of[p] for p in prefixes if name.startswith(p)), "misc")
        fams.setdefault(fam, []).append(name)
    order: list[str] = []
    iters = [iter(v) for v in fams.values()]
    while iters:
        alive = []
        for it in iters:
            nxt = next(it, None)
            if nxt is not None:
                order.append(nxt)
                alive.append(it)
        iters = alive
    assert sorted(order) == sorted(qs)
    return {k: qs[k] for k in order}


QUERIES = _interleave_families(QUERIES)

#: KG queries whose oracle reads the fixture parquet.
_KG_ORACLE_NAMES = (
    "kg_mentions",
    "kg_status",
    "kg_report",
    "kg_triples",
    "kg_triples_canonical",
    "kg_components",
    "kg_component_sizes",
    "kg_entity_profile",
    "kg_restricted_denied",
    "kg_formats_complete",
    "kg_spans_passthrough",
    "kg_dependency_closure",
    "kg_dependency_closure_ttl",
    "kg_pagerank",
    "kg_incremental",
    "kg_lookup",
    "kg_two_hop",
    "kg_bgp",
    "kg_bgp_optional",
    "kg_bgp_minus",
    "kg_bgp_union",
    "kg_bgp_filter",
    "kg_bgp_values",
    "kg_bgp_bind",
    "kg_bfs",
    "kg_walks",
    "kg_skipgrams",
    "kg_ask",
    "kg_describe",
    "kg_path_query",
    "kg_path_star",
    "kg_head_status",
    "kg_head_requests",
    "kg_sparql_agg",
    "kg_sparql_having",
    "kg_shacl_report",
    "kg_void_stats",
    "kg_construct",
    "kg_nt_roundtrip",
    "kg_reachability",
    "kg_subclass_closure",
    "kg_incremental_canonical",
    "kg_intercept_archivo",
    "kg_intercept_modes",
    "kg_doc_stats",
    "media_catalog",
    "media_frames",
)


def oracle_sql_for(sf_dir: str) -> dict[str, str]:
    """DuckDB statements for the SQL-expressible queries.  Generating them
    also materializes the fixture tables the statements read."""
    paths = ensure_fixtures(sf_dir)
    out = {n: sql_oracles.kg_sql(n, paths.root, DEFAULT_CONFIG.timestamp) for n in _KG_ORACLE_NAMES}
    out.update(sql_oracles.TESTDATA_SQL)
    out["dedup_embed"] = sql_oracles.dedup_embed_sql(paths.root)
    out["dedup_embed_keep"] = sql_oracles.embed_dedup_keep_sql(paths.root)
    out["dedup_semantic"] = sql_oracles.semantic_dedup_sql(paths.root)
    out["kg_client_config"] = sql_oracles.client_config_sql(paths.root)
    out["kg_client_intercept"] = sql_oracles.client_intercept_sql(paths.root)
    out["kg_config_grid"] = sql_oracles.config_grid_sql(paths.root)
    out["ann_lsh"] = sql_oracles.ann_lsh_sql(
        similarity._emb_dim(os.path.join(sf_dir, "embeddings.parquet"))
    )
    # recall@k metric: the two ANN statements composed as subqueries.
    # k comes from the SAME constant the engine's ann_recall defaults to,
    # so a changed k can never silently diverge engine from oracle.
    out["ann_recall"] = (
        "SELECT b.query_id, COUNT(l.vec_id) AS n_hits,\n"
        f"       CAST(COUNT(l.vec_id) * 1000000 / {similarity.ANN_RECALL_K} AS BIGINT) AS recall_ppm\n"
        f"FROM ({sql_oracles.TESTDATA_SQL['ann_bruteforce']}) b\n"
        f"LEFT JOIN ({out['ann_lsh']}) l\n"
        "  ON l.query_id = b.query_id AND l.vec_id = b.vec_id\n"
        "GROUP BY b.query_id"
    )
    out["pii_scrub"] = sql_oracles.pii_scrub_sql(paths.root)
    from ontology_time_machine_ray.stages.sketch import HLL_ALPHA_E6, HLL_P

    out["rel_distinct_hll"] = sql_oracles.distinct_hll_sql(HLL_P, HLL_ALPHA_E6)
    out["events_users_kmv"] = (
        "SELECT date_trunc('hour', ts) AS hour,\n"
        "  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct\n"
        "FROM events GROUP BY 1"
    )
    out["docs_jsonl_stats"] = sql_oracles.alt_format_stats_sql(
        f"read_json_auto('{paths.root}/documents.jsonl')"
    )
    out["docs_csv_stats"] = sql_oracles.alt_format_stats_sql(
        f"read_csv_auto('{paths.root}/documents.csv')"
    )
    out["inverted_index"] = sql_oracles.inverted_index_sql(
        INVINDEX_MIN_DF, INVINDEX_MAX_DF
    )
    out["tfidf_topk"] = sql_oracles.tfidf_topk_sql(TFIDF_K, textops.TFIDF_SCALE)
    out["dedup_quality_keep"] = sql_oracles.quality_dedup_keep_sql()
    out["corpus_curate"] = sql_oracles.corpus_curate_sql()
    out["text_bm25"] = sql_oracles.bm25_topk_sql(BM25_QUERY, BM25_K, textops.BM25_SCALE)
    out["winnow_dup_pairs"] = sql_oracles.winnow_dup_pairs_sql(
        WINNOW_MIN_SHARED, WINNOW_MAX_FP_DF
    )
    out["dup_ngrams"] = sql_oracles.dup_ngrams_sql(DUP_NGRAM_N)
    out["dup_run_stats"] = sql_oracles.dup_run_stats_sql(DUP_NGRAM_N)
    out["kg_skipgram_negatives"] = sql_oracles.kg_skipgram_negatives_sql(
        paths.root, DEFAULT_CONFIG.timestamp
    )
    out["dedup_substrings"] = sql_oracles.dedup_substrings_sql(
        textops.SUB_N, textops.SUB_MIN_LEN
    )
    out["text_bpe_encode"] = sql_oracles.bpe_encode_sql(paths.root)
    out["text_bpe_merges"] = (
        "SELECT rank, lhs, rhs "
        f"FROM read_parquet('{paths.root}/bpe_merges.parquet') ORDER BY rank"
    )
    out["pack_sequences_bpe"] = sql_oracles.pack_sequences_bpe_sql(
        paths.root, 2048
    )
    out["chunk_bpe_counts"] = sql_oracles.chunk_bpe_counts_sql(
        paths.root, 64, 48
    )
    out["dedup_segments"] = sql_oracles.dedup_segments_sql(textops.SEG_W)
    out["quality_top_pct"] = sql_oracles.quality_top_pct_sql(QUALITY_TOP_PCT)
    out["quality_top_pct_by_source"] = sql_oracles.quality_top_pct_by_source_sql(
        QUALITY_TOP_PCT
    )
    out["corpus_report"] = sql_oracles.corpus_report_sql()
    from ontology_time_machine_ray.stages.fuzzy import MAX_DIST

    out["rel_fuzzy_join"] = sql_oracles.fuzzy_join_sql(MAX_DIST)
    out["rel_entity_resolution"] = sql_oracles.entity_resolution_sql(MAX_DIST)
    out["rel_price_quantiles_cont"] = sql_oracles.QUANTILES_CONT_SQL
    out["events_retention"] = sql_oracles.RETENTION_SQL
    from ontology_time_machine_ray.stages.layout import RANGE_HI_C, RANGE_LO_C

    out["rel_range_layout"] = sql_oracles.range_layout_sql(RANGE_LO_C, RANGE_HI_C)
    out["rel_q3_shipping"] = sql_oracles.q3_shipping_sql(
        relational.Q3_SEGMENT, relational.Q3_CUTOFF
    )
    out["rel_q5_local_volume"] = sql_oracles.q5_local_volume_sql(
        relational.Q5_REGION, relational.Q5_START, relational.Q5_END
    )
    out["rel_q13_custdist"] = sql_oracles.Q13_CUSTDIST_SQL
    out["rel_q19_discounted"] = sql_oracles.q19_discounted_sql(
        relational.Q19_TERMS
    )
    out["rel_q14_promo"] = sql_oracles.q14_promo_sql(
        relational.Q14_START, relational.Q14_END
    )
    out["rel_q7_nation_volume"] = sql_oracles.q7_nation_volume_sql(
        relational.Q7_NATION_A,
        relational.Q7_NATION_B,
        relational.Q7_START,
        relational.Q7_END,
    )
    out["events_funnel"] = sql_oracles.FUNNEL_SQL
    out["sample_weighted"] = sql_oracles.sample_weighted_sql(textops.SAMPLE_W_K)
    from ontology_time_machine_ray.stages.layout import GRID_DATE_HI, GRID_DATE_LO

    out["rel_grid_layout"] = sql_oracles.grid_layout_sql(
        RANGE_LO_C,
        RANGE_HI_C,
        pd.Timestamp(GRID_DATE_LO).value // 86_400_000_000_000,
        pd.Timestamp(GRID_DATE_HI).value // 86_400_000_000_000 - 1,
    )
    out["embed_kmeans"] = sql_oracles.embed_kmeans_sql()
    out["embed_outliers"] = sql_oracles.embed_outliers_sql(
        tau_e6=similarity.EMB_OUTLIER_TAU_E6
    )
    out["embed_pca"] = sql_oracles.pca_power_sql(
        dim=similarity._emb_dim(os.path.join(sf_dir, "embeddings.parquet")),
        iters=similarity.PCA_ITERS,
        scale=similarity.PCA_SCALE,
        target=similarity.PCA_NORM_TARGET,
    )
    out["ann_ivf"] = sql_oracles.ann_ivf_sql()
    out["ann_pq"] = sql_oracles.ann_pq_sql(
        dim=similarity._emb_dim(os.path.join(sf_dir, "embeddings.parquet"))
    )
    out["ann_ivfpq"] = sql_oracles.ann_ivfpq_sql(
        dim=similarity._emb_dim(os.path.join(sf_dir, "embeddings.parquet"))
    )
    out["ann_ivfpq_recall"] = (
        "SELECT b.query_id, COUNT(l.vec_id) AS n_hits,\n"
        f"       CAST(COUNT(l.vec_id) * 1000000 / {similarity.ANN_RECALL_K} AS BIGINT) AS recall_ppm\n"
        f"FROM ({sql_oracles.TESTDATA_SQL['ann_bruteforce']}) b\n"
        f"LEFT JOIN ({out['ann_ivfpq']}) l\n"
        "  ON l.query_id = b.query_id AND l.vec_id = b.vec_id\n"
        "GROUP BY b.query_id"
    )
    from ontology_time_machine_ray.stages.packing import DEFAULT_MIX_E6

    out["corpus_mix"] = sql_oracles.corpus_mix_sql(DEFAULT_MIX_E6, "mix1")
    from ontology_time_machine_ray.stages.packing import MIX_T_CAP_E6

    out["corpus_mix_temperature"] = sql_oracles.corpus_mix_temperature_sql(
        "mixT", MIX_T_CAP_E6
    )
    out["corpus_to_shards"] = sql_oracles.corpus_to_shards_sql(paths.root, 2048)
    out["kg_store_asof"] = (
        out["kg_triples"] + f"\nWHERE doc_id < '{incremental_split_mid(sf_dir)}'"
    )
    # RDF-parsed snapshot ingestion must equal the table-driven build --
    # sharing the statement IS the parser-correctness claim
    out["kg_triples_from_rdf"] = out["kg_triples"]
    out["kg_report_ab"] = sql_oracles.kg_report_ab_sql(
        paths.root, DEFAULT_CONFIG.timestamp
    )
    out["kg_nir_report"] = sql_oracles.kg_nir_report_sql(paths.root)
    out["kg_version_diff"] = sql_oracles.kg_version_diff_sql(
        paths.root, KG_DIFF_OLD_TS, DEFAULT_CONFIG.timestamp
    )
    out["kg_cooccur_triangles"] = sql_oracles.cooccur_triangles_sql(paths.root)
    out["kg_kcore"] = sql_oracles.kg_kcore_sql(paths.root, KG_KCORE_K, KG_KCORE_ROUNDS)
    out["kg_communities"] = sql_oracles.kg_communities_sql(paths.root, KG_LP_ROUNDS)
    out["kg_timeline"] = sql_oracles.kg_timeline_sql(paths.root, KG_TIMELINE_TS)
    out["kg_download_log"] = sql_oracles.kg_download_log_sql(paths.root)
    out["media_decode"] = sql_oracles.media_decode_sql(paths.root)
    out["media_features"] = sql_oracles.media_features_sql(paths.root)
    out["media_decode_frames"] = sql_oracles.media_decode_frames_sql(paths.root)
    out["media_phash"] = sql_oracles.media_phash_sql(paths.root)
    return out
