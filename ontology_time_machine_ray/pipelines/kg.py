"""The flagship KG-construction pipeline.

    documents (interleaved spans) --map_batches--> mentions
      --actor pool--> triples (policy-routed, version-pinned)
      --star rounds--> canonicalized
      --hash groupby--> deduped
      --partitioned write--> triple store + lineage

Every stage is lazy Ray Data; nothing materializes the corpus.  The
reference's request-at-a-time control flow (``custom_proxy.py:62-204``)
appears here as the stage sequence; its per-request ``if`` ladders are the
mask/combo logic inside the linker.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, replace
from typing import Optional

import ray.data as rd

from ontology_time_machine_ray.config import DEFAULT_CONFIG, PipelineConfig
from ontology_time_machine_ray.fixtures import FixturePaths, ensure_fixtures
from ontology_time_machine_ray.stages.canonicalize import canonicalize_triples
from ontology_time_machine_ray.stages.dedup import _local_dedup, dedupe_triples
from ontology_time_machine_ray.stages.detect import MentionDetector
from ontology_time_machine_ray.stages.detect_link import DetectLink, make_detect_link
from ontology_time_machine_ray.sources.writers import write_partitioned


def _default_pool_size() -> int:
    """Size each actor pool so detect + link pools together leave at least
    a third of the cluster for the stateless read/shuffle/write operators
    (a pool that reserves every CPU starves the rest and the pipeline
    serializes -- or deadlocks on a small cluster)."""
    import ray

    try:
        total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        total = 4
    return max(1, total // 3)


@dataclass
class KgPipeline:
    paths: FixturePaths
    config: PipelineConfig = DEFAULT_CONFIG
    detect_concurrency: Optional[int] = None
    link_concurrency: Optional[int] = None
    #: None = whole-block batches: the linker's per-batch fixed costs
    #: (pandas merges, combo memo lookups) amortize best over big batches;
    #: measured 45us/doc at None vs 66us/doc at 4096 on the bench corpus.
    batch_size: Optional[int] = None
    #: restrict the corpus to doc_id in [lo, hi) (either bound may be
    #: None for unbounded) -- predicate pushdown at the parquet read.
    #: This is the INPUT SLICE, not config: it is deliberately outside
    #: config_hash so a delta slice can be merged into a store built
    #: from an earlier slice (see ``update``).
    doc_id_range: Optional[tuple] = None
    #: annotate each document with its deterministic request verb
    #: (GET/HEAD, fixtures.add_method_column); HEAD rows resolve like GET
    #: but emit no content-derived triples (headers-only route).
    with_method: bool = False
    #: user-extension surface (SURVEY §2.9, stages/registry.py): when
    #: set, the documents->emit chain runs these REGISTRY stage names in
    #: order as ONE actor-pool map_batches -- e.g. ("detect",
    #: "my_filter", "link") inserts a custom mention transform, and a
    #: "module.path:attr" name plugs in a stage from any user module.
    #: None = the stock fused fast path.
    stages: Optional[tuple] = None

    @classmethod
    def for_sf_dir(cls, sf_dir: str, repeat: int = 1, **kw) -> "KgPipeline":
        return cls(paths=ensure_fixtures(sf_dir, repeat), **kw)

    def config_hash(self) -> str:
        blob = json.dumps(
            {
                "fmt": self.config.onto_format.format.value,
                "prec": self.config.onto_format.precedence.value,
                "patch": self.config.onto_format.patch_accept_upstream,
                "policy": self.config.onto_version.value,
                # behavioral: False routes every row by the run-level
                # policy instead of its per-row policy column, so stores
                # built either way are NOT merge-compatible
                "per_row_policy": self.config.per_row_policy,
                "restricted": self.config.restricted_access,
                "ts": self.config.timestamp,
                "root": self.paths.root,
            },
            sort_keys=True,
        )
        return hashlib.sha256(blob.encode()).hexdigest()[:16]

    # ------------------------------------------------------------------ #
    def _doc_read_blocks(self) -> Optional[int]:
        """Read-block override sized for the CPU-heavy detect+link stage.

        Ray's default 128 MiB block target yields ~80k-doc tasks here
        (~4 s each, 2.6x mean-to-max skew measured), so a 32-CPU run
        achieves only ~15x effective parallelism -- the last wave of
        coarse stragglers idles half the box.  Splitting the read into
        ~32 MiB (in-memory) blocks packs the task waves evenly: measured
        35 s -> 19 s on the 8M-doc bench corpus, and it is what restores
        the 8->32 scaling pair.  In-memory size is estimated from disk
        bytes x6 (snappy+string inflation measured 6.4x on the bench
        corpus); small corpora (<= ~6 GiB est.) keep Ray's own heuristic.
        """
        import glob

        p = self.paths.documents
        files = [p] if os.path.isfile(p) else glob.glob(os.path.join(p, "*.parquet"))
        disk = sum(os.path.getsize(f) for f in files)
        est_blocks = (disk * 6) // (32 << 20)
        if est_blocks <= 200:
            return None
        return int(min(est_blocks, 8192))

    def documents(self) -> rd.Dataset:
        blocks = self._doc_read_blocks()
        ds = None
        if self.doc_id_range is not None:
            import pyarrow.compute as pc

            lo, hi = self.doc_id_range
            expr = None
            if lo is not None:
                expr = pc.field("doc_id") >= lo
            if hi is not None:
                e2 = pc.field("doc_id") < hi
                expr = e2 if expr is None else expr & e2
            if expr is not None:
                ds = rd.read_parquet(
                    self.paths.documents, filter=expr, override_num_blocks=blocks
                )
        if ds is None:
            ds = rd.read_parquet(self.paths.documents, override_num_blocks=blocks)
        if self.with_method:
            from ontology_time_machine_ray.fixtures import add_method_column

            ds = ds.map_batches(add_method_column, batch_format="pyarrow")
        return ds

    def mentions(self) -> rd.Dataset:
        return self.documents().map_batches(
            MentionDetector,
            fn_constructor_kwargs={"index_path": self.paths.ontology_index},
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.detect_concurrency or _default_pool_size(),
        )

    def _link(self, emit: str) -> rd.Dataset:
        """Fused detect+link stage: task-based with per-worker cached
        state (see make_detect_link; the state is small+immutable, so
        elastic tasks beat a fixed actor pool).  Set ``link_concurrency``
        to force an actor pool of the ``DetectLink`` class instead."""
        if self.stages is not None:
            from ontology_time_machine_ray.stages.registry import (
                ComposedStages,
                StageCtx,
                resolve_stages,
            )

            ctx = StageCtx(paths=self.paths, config=self.config, emit=emit)
            return self.documents().map_batches(
                ComposedStages,
                fn_constructor_kwargs={
                    "names": tuple(self.stages),
                    "ctx": ctx,
                    # resolved HERE so driver-registered stages reach the
                    # actor (remote __init__ sees only import-time builtins)
                    "fns": resolve_stages(self.stages),
                },
                batch_format="pyarrow",
                batch_size=self.batch_size,
                concurrency=self.link_concurrency or _default_pool_size(),
            )
        fn = make_detect_link(
            index_path=self.paths.ontology_index,
            origins_path=self.paths.origins,
            content_path=self.paths.snapshot_content,
            status_path=self.paths.snapshot_status,
            config=self.config,
            emit=emit,
        )
        if self.link_concurrency:
            return self.documents().map_batches(
                DetectLink,
                fn_constructor_kwargs={
                    "index_path": self.paths.ontology_index,
                    "origins_path": self.paths.origins,
                    "content_path": self.paths.snapshot_content,
                    "status_path": self.paths.snapshot_status,
                    "config": self.config,
                    "emit": emit,
                },
                batch_format="pyarrow",
                batch_size=self.batch_size,
                concurrency=self.link_concurrency,
            )
        return self.documents().map_batches(
            fn, batch_format="pyarrow", batch_size=self.batch_size
        )

    def triples_raw(self) -> rd.Dataset:
        return self._link("triples")

    def status(self) -> rd.Dataset:
        return self._link("status")

    def triples(self) -> rd.Dataset:
        """Deduped, pre-canonicalization triple store.  Bucketing on
        ``subj`` alone is complete for (subj, pred, obj) dedup and keeps
        the shuffle key aligned with the output partitioning."""
        return dedupe_triples(self.triples_raw(), bucket_keys=["subj"])

    def triples_canonical(self) -> rd.Dataset:
        """sameAs-canonicalized + re-deduped triple store.

        Order matters at scale: dedup FIRST shrinks the corpus-scale raw
        stream to the vocabulary-scale distinct store, so the detect+link
        stages execute exactly once and the equivalence-graph pass plus the
        rewrite run over the small table.  The deduped store is pinned
        (``materialize``) because two downstream consumers (edge extraction
        and the rewrite) would otherwise re-execute the whole pipeline; at
        production scale this pin is a Parquet/Lance checkpoint boundary
        instead (the reference's inter-stage log files, S6).
        """
        deduped = self.triples().materialize()
        canon = canonicalize_triples(deduped)
        return dedupe_triples(canon, bucket_keys=["subj"])

    def report(self) -> rd.Dataset:
        """Accessibility report: grouped counts per (category, format) --
        the reference's aggregate_results.py:92-151 bucket table (A1).
        Bucketed-vectorized (format is nullable; the built-in sort-based
        groupby cannot order null keys)."""
        from ontology_time_machine_ray.stages.groupagg import grouped_apply

        def count_bucket(g):
            out = g.groupby(["category", "format"], dropna=False, as_index=False).agg(
                n=("doc_id", "size")
            )
            return out.rename(columns={"n": "count()"})

        return grouped_apply(self.status(), ["category", "format"], count_bucket)

    def materialize(self, out_dir: str, canonical: bool = True) -> dict:
        """Build + write the partitioned store with the minimum number of
        all-to-all exchanges: the final (s,p,o) dedup rides the
        hash(subj)-partitioning shuffle of the writer (subj determines the
        partition AND the dedup bucket), so the whole job is

            canonical=False: stream -> ONE shuffle (partition+dedup+write)
            canonical=True:  stream -> dedup shuffle (pinned) -> mapping
                             -> rewrite -> ONE shuffle (partition+dedup+write)
        """
        mapping_ds = None
        if canonical:
            from ontology_time_machine_ray.stages.canonicalize import (
                canonicalize_with_mapping,
                connected_components,
                sameas_edges,
            )

            deduped = self.triples().materialize()
            # the dedup can shrink a replicated corpus 1000x, leaving
            # hundreds of near-empty blocks; every downstream stage then
            # pays per-block scheduling for no data.  A VOCABULARY-scale
            # store (guarded threshold, same family as the CC driver fast
            # path) takes one driver bounce into a single block -- cheaper
            # than the repartition round it replaces, and the three tail
            # consumers (edge extraction, rewrite, write shuffle) each
            # read one block instead of hundreds.  Above the threshold
            # the distributed repartition coalesce runs instead.
            if deduped.count() <= 1_000_000 and deduped.num_blocks() > 16:
                deduped = rd.from_pandas(deduped.to_pandas())
            elif deduped.num_blocks() > 64:
                deduped = deduped.repartition(16).materialize()
            mapping_ds = connected_components(sameas_edges(deduped)).materialize()
            ds = canonicalize_with_mapping(deduped, mapping_ds)
        else:
            ds = self.triples_raw().map_batches(_local_dedup, batch_format="pandas")
        summary = write_partitioned(
            ds,
            out_dir,
            num_partitions=self.config.output_partitions,
            config_hash=self.config_hash(),
            key="subj",
            dedup_keys=["subj", "pred", "obj"],
            dedup_order=["doc_id", "ontology_version", "format"],
            inputs=[
                self.paths.documents,
                self.paths.ontology_index,
                self.paths.origins,
                self.paths.snapshot_content,
                self.paths.snapshot_status,
            ],
        )
        if mapping_ds is not None:
            from ontology_time_machine_ray.stages.canonicalize import MAX_BROADCAST_NODES
            from ontology_time_machine_ray.sources.writers import (
                write_mapping,
                write_mapping_ds,
            )

            # the mapping only touches the driver when it FITS there; a
            # bigger-than-broadcast equivalence graph is persisted as a
            # distributed parquet directory (same fallback threshold the
            # rewrite itself uses)
            if mapping_ds.count() <= MAX_BROADCAST_NODES:
                write_mapping(out_dir, mapping_ds.to_pandas())
            else:
                write_mapping_ds(out_dir, mapping_ds)
        return summary

    def update(self, out_dir: str) -> dict:
        """Incrementally merge THIS pipeline's triples into an existing
        non-canonical store built under the same config (time-machine
        continuous ingest): only the partitions the delta hashes into are
        read + merged + rewritten, so cost scales with the delta, not the
        store.  Equivalent BY CONSTRUCTION to a full rebuild over the
        union of corpora (per-key min is associative), and idempotent
        (re-applying a delta is a no-op) -- pinned by pytest and by the
        kg_incremental query sharing kg_triples' SQL oracle.

        Canonical stores (those with a persisted ``_mapping.parquet``)
        must use ``update_canonical`` instead -- merging raw triples into
        a canonical store would silently reintroduce non-canonical IRIs,
        so that direction raises here.
        """
        import os as _os

        from ontology_time_machine_ray.sources.writers import update_partitioned

        if _os.path.exists(_os.path.join(out_dir, "_mapping.parquet")) or _os.path.isdir(
            _os.path.join(out_dir, "_mapping_parquet")
        ):
            raise ValueError(
                f"{out_dir} is a CANONICAL store (it has a persisted sameAs "
                "mapping) -- use update_canonical, not update"
            )
        ds = self.triples_raw().map_batches(_local_dedup, batch_format="pandas")
        return update_partitioned(
            ds,
            out_dir,
            num_partitions=self.config.output_partitions,
            config_hash=self.config_hash(),
            key="subj",
            dedup_keys=["subj", "pred", "obj"],
            dedup_order=["doc_id", "ontology_version", "format"],
        )

    def update_canonical(self, out_dir: str) -> dict:
        """Incremental update of a CANONICAL store: repair the sameAs
        component mapping with the delta's edges, then merge.

        Connected components are MONOTONE under edge addition (components
        can only merge, never split), so the repair is exact: project the
        delta's equivalence edges through the persisted mapping, run CC
        over that (delta-scale) projected graph, and compose.  The min-id
        representative of a merged component equals the min over all its
        nodes -- each old representative is already its part's min -- so
        the repaired mapping is IDENTICAL to a full-rebuild mapping, and
        the merged store equals a one-shot canonical build (the
        kg_incremental_canonical query shares kg_triples_canonical's
        oracle).

        Cost: detect+link runs over the DELTA only, always.  Changed
        representatives are first PROBED against the store with one
        pruned (subj, obj) column scan against the broadcast candidate
        set; when none actually occur (the common steady-state case --
        new entities forming new components) the merge touches only the
        delta's partitions (``update_partitioned``).  Only when a
        changed value really appears in stored rows -- delta edges merged
        previously-separate old components -- does the rewrite path run:
        the affected rows' canonical subj/obj change (rows can even move
        hash partitions), so that path rewrites the store through one
        distributed pass (read store + broadcast moved-rep rewrite +
        COW overwrite); still no re-linking of old documents.
        """
        import pandas as pd
        import ray as _ray

        from ontology_time_machine_ray.stages.canonicalize import (
            connected_components,
            make_rewriter,
            sameas_edges,
        )
        from ontology_time_machine_ray.sources.writers import (
            read_mapping,
            read_store_asof,
            update_partitioned,
            write_mapping,
            write_partitioned,
        )

        from ontology_time_machine_ray.stages.canonicalize import MAX_BROADCAST_NODES

        # the repair composes mappings on the driver, so refuse (via
        # parquet metadata, before loading) a mapping the driver can't
        # hold -- above that scale rebuild the store instead
        m_df = read_mapping(out_dir, max_rows=MAX_BROADCAST_NODES)
        m = dict(zip(m_df.get("node", []), m_df.get("component", [])))

        delta_tr = self.triples().materialize()

        # delta equivalence edges, projected through the existing mapping
        def project(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "u": df["u"].map(lambda x: m.get(x, x)),
                    "v": df["v"].map(lambda x: m.get(x, x)),
                }
            )

        proj = sameas_edges(delta_tr).map_batches(project, batch_format="pandas")
        mp_df = connected_components(proj).to_pandas()  # delta-scale
        mp = dict(zip(mp_df.get("node", []), mp_df.get("component", [])))

        # composed mapping over old and new nodes
        final = {n: mp.get(r, r) for n, r in m.items()}
        for n, r in mp.items():
            final.setdefault(n, r)
        # candidate moved values: projected nodes whose representative
        # changed.  Most are brand-new delta entities that never appear
        # in the store; probe the store with ONE pruned (subj, obj)
        # column scan against the broadcast candidate set -- far cheaper
        # than a full rewrite -- and rewrite only if a candidate is
        # actually present.
        candidates = {k: v for k, v in mp.items() if k != v}
        moved: dict = {}
        if candidates:
            cand_ref = _ray.put(set(candidates))

            def probe(df: pd.DataFrame) -> pd.DataFrame:
                from ontology_time_machine_ray.functions.broadcast import cached_get

                cand = cached_get(cand_ref)
                hit = set(df["subj"]) & cand | set(df["obj"]) & cand
                return pd.DataFrame({"node": sorted(hit)})

            found = (
                read_store_asof(out_dir, columns=["subj", "obj"])
                .map_batches(probe, batch_format="pandas")
                .to_pandas()  # bounded by |candidates| x blocks
            )
            moved = {k: candidates[k] for k in set(found["node"])}

        delta_canon = delta_tr.map_batches(
            make_rewriter(_ray.put(final)), batch_format="pandas"
        )
        wkw = dict(
            num_partitions=self.config.output_partitions,
            config_hash=self.config_hash(),
            key="subj",
            dedup_keys=["subj", "pred", "obj"],
            dedup_order=["doc_id", "ontology_version", "format"],
        )
        if not moved:
            summary = update_partitioned(delta_canon, out_dir, **wkw)
        else:
            cols = ["subj", "pred", "obj", "doc_id", "ontology_version", "format"]
            old = read_store_asof(out_dir, columns=cols)
            old_rw = old.map_batches(
                make_rewriter(_ray.put(moved)), batch_format="pandas"
            )
            # materialize BEFORE the overwrite: write_partitioned(overwrite)
            # replaces the very partition dirs the lazy read sources from,
            # and Ray lineage reconstruction (object-store eviction
            # re-running the read tasks mid-write) would re-read replaced
            # or missing files.  Pinning the rewritten blocks first makes
            # the read immune to the destination mutating under it.
            combined = old_rw.union(delta_canon).materialize()
            summary = write_partitioned(combined, out_dir, overwrite=True, **wkw)
        write_mapping(
            out_dir,
            pd.DataFrame(
                {"node": list(final.keys()), "component": list(final.values())}
            ),
        )
        summary["moved_representatives"] = len(moved)
        return summary

    def with_policy(self, policy, **kw) -> "KgPipeline":
        cfg = replace(self.config, onto_version=policy, per_row_policy=False, **kw)
        return replace(self, config=cfg)

    def with_timestamp(self, timestamp: str) -> "KgPipeline":
        """Same pipeline at a different time-machine coordinate (the
        snapshot store resolves each ontology to the latest version_ts <=
        timestamp; config.py:73-84)."""
        return replace(self, config=replace(self.config, timestamp=timestamp))

    def triples_at(self, timestamps) -> list:
        """Deduped triple stores for SEVERAL time-machine coordinates
        with the mention-detection pass shared: detection is
        timestamp-INDEPENDENT, so a K-coordinate sweep (kg_timeline /
        kg_version_diff) that rebuilt from raw documents per coordinate
        paid K detection passes for one detection's worth of output.
        Here the mention stream is detected once and pinned, and each
        coordinate only re-runs the linker (an ``EntityLinker`` actor
        pool with that coordinate's config) + its dedup.  The pin is the
        standard corpus-scale checkpoint boundary (at production scale a
        Parquet/Lance checkpoint, exactly like triples_canonical's)."""
        from ontology_time_machine_ray.stages.link import EntityLinker

        mts = self.mentions().materialize()
        out = []
        for ts in timestamps:
            cfg = replace(self.config, timestamp=ts)
            raw = mts.map_batches(
                EntityLinker,
                fn_constructor_kwargs={
                    "origins_path": self.paths.origins,
                    "content_path": self.paths.snapshot_content,
                    "status_path": self.paths.snapshot_status,
                    "config": cfg,
                    "emit": "triples",
                },
                batch_format="pyarrow",
                batch_size=self.batch_size,
                concurrency=self.link_concurrency or _default_pool_size(),
            )
            out.append(dedupe_triples(raw, bucket_keys=["subj"]))
        return out

    def triples_tagged_at(self, timestamps):
        """RAW triples for SEVERAL coordinates as ONE coord-tagged
        stream -- the fused form of ``triples_at``: one
        ``MultiConfigLinker`` actor pool links each mention batch at
        every coordinate (snapshot state loaded once per actor, shared),
        so the mention stream is read ONCE with no materialize pin (a
        single consumer needs no checkpoint) and no per-coordinate actor
        pools.  Rows are NOT deduped per coordinate: a consumer folds
        distinctness into its own key pass (group on (coord, subj, pred,
        obj) / OR a presence bit) instead of paying K dedup exchanges --
        kg_timeline's plan."""
        from ontology_time_machine_ray.stages.link import MultiConfigLinker

        cfgs = [replace(self.config, timestamp=ts) for ts in timestamps]
        return self.mentions().map_batches(
            MultiConfigLinker,
            fn_constructor_kwargs={
                "origins_path": self.paths.origins,
                "content_path": self.paths.snapshot_content,
                "status_path": self.paths.snapshot_status,
                "configs": cfgs,
                "emit": "triples",
            },
            batch_format="pyarrow",
            batch_size=self.batch_size,
            concurrency=self.link_concurrency or _default_pool_size(),
        )
