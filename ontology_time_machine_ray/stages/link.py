"""Entity linking against pinned versioned-ontology snapshots.

The batch restatement of the reference's per-request version-policy
dispatch and failover cascade (``proxy_logic.py:163-273``):

* content negotiation + Accept patching happen first
  (``set_onto_format_headers`` + ``get_format_from_accept_header``,
  utils.py:60-157, M7/M8); a row whose negotiated format is None under a
  non-ORIGINAL policy is rejected with 500 (proxy_logic.py:174-176, J2);
* ``original``            -> live-origin outcome (proxy_logic.py:201-205);
* ``originalFailoverLiveLatest`` -> origin, falling back to latest archived
  on dead origin / non-passthrough status / mime mismatch
  (proxy_logic.py:209-238, O4/J3);
* ``latestArchived``      -> snapshot at the newest version
  (proxy_logic.py:242-260) incl. the 500 -> https retry (O5);
* ``timestampArchived``   -> as-of resolution: latest ``version <= T``
  (proxy_logic.py:262-273, J4) -- the reference delegates this to the
  Archivo API; here the snapshot store owns it (a sorted-array binary
  search per ontology, built once per actor).

Non-served rows are routed to a STATUS table with the same codes the
reference's mock responses carry (403/404/500/502, utils/mock_responses.py)
-- errors are data, not exceptions (M13).

Scale notes
-----------
* Outcome depends only on ``(ontology_id, policy, accept)`` -- NOT the
  document -- so each batch resolves distinct combos once (memoized across
  batches in actor state, T2) and maps results back with a vectorized
  pandas merge.  Per-row cost is a hash probe.
* Triple emission pre-combines inside the batch (one row per distinct
  (subj,pred,obj) per batch, min doc_id provenance) so the global dedup
  shuffle moves near-unique rows instead of per-mention duplicates -- the
  partial-aggregate / combiner pattern that keeps the all-to-all exchange
  small at 100 TB.
"""

from __future__ import annotations

import bisect
from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ontology_time_machine_ray.config import PipelineConfig
from ontology_time_machine_ray.functions.negotiate import (
    PASSTHROUGH_STATUS_CODES,
    RDF_MIMETYPES,
    map_mime_to_format,
    parse_accept_header_with_priority,
    resolve_format_vector,
)
from ontology_time_machine_ray.schema import (
    OWL_CLASS,
    OWL_EQUIVALENT_CLASS,
    OWL_OBJECT_PROPERTY,
    OWL_SAME_AS,
    RDF_TYPE,
    RDFS_IS_DEFINED_BY,
    STATUS_SCHEMA,
    TRIPLES_SCHEMA,
)


class SnapshotStore:
    """Pinned versioned-ontology state loaded once per actor (T2).

    Holds: per-ontology sorted version list (for as-of binary search),
    per-(ontology, version) class/property/sameAs content, per-(ontology,
    version, format) availability incl. the https-retry outcome, and the
    live-origin table.
    """

    def __init__(self, origins_path: str, content_path: str, status_path: str):
        org = pq.read_table(origins_path)
        self.origins = {
            o: (int(s), c)
            for o, s, c in zip(
                org["ontology_id"].to_pylist(),
                org["origin_status"].to_pylist(),
                org["origin_content_type"].to_pylist(),
            )
        }
        content = pq.read_table(content_path)
        self.versions: dict[str, list[str]] = {}
        #: (ontology, version) -> (classes, properties, same_as_a,
        #: same_as_b, equiv_a, equiv_b)
        self.content: dict[
            tuple[str, str], tuple[list, list, list, list, list, list]
        ] = {}
        for row in content.to_pylist():
            self.versions.setdefault(row["ontology_id"], []).append(row["version"])
            self.content[(row["ontology_id"], row["version"])] = (
                row["classes"],
                row["properties"],
                row["same_as_a"],
                row["same_as_b"],
                row["equiv_a"],
                row["equiv_b"],
            )
        for v in self.versions.values():
            v.sort()
        status = pq.read_table(status_path)
        self.availability = {
            (o, v, f): (int(s), int(sh))
            for o, v, f, s, sh in zip(
                status["ontology_id"].to_pylist(),
                status["version"].to_pylist(),
                status["format"].to_pylist(),
                status["status"].to_pylist(),
                status["status_https"].to_pylist(),
            )
        }

    def latest_version(self, ontology_id: str) -> Optional[str]:
        vs = self.versions.get(ontology_id)
        return vs[-1] if vs else None

    def version_as_of(self, ontology_id: str, t: str) -> Optional[str]:
        """Latest version <= T (ISO date strings order lexicographically)."""
        vs = self.versions.get(ontology_id)
        if not vs:
            return None
        i = bisect.bisect_right(vs, t)
        return vs[i - 1] if i > 0 else None


class Resolution:
    """Outcome of routing one (ontology_id, policy, accept) combo."""

    __slots__ = ("served", "status", "category", "version", "fmt")

    def __init__(self, served, status, category, version=None, fmt=None):
        self.served = served
        self.status = status
        self.category = category
        self.version = version
        self.fmt = fmt


class EntityLinker:
    """Callable class for ``map_batches(EntityLinker, ...)`` over mentions.

    ``emit`` selects the output stream: "triples" or "status" (the two
    tables have different schemas; each consumer owns its stream).
    """

    def __init__(
        self,
        origins_path: str,
        content_path: str,
        status_path: str,
        config: Optional[PipelineConfig] = None,
        emit: str = "triples",
        store: Optional[SnapshotStore] = None,
    ):
        # ``store`` lets a multi-coordinate wrapper share ONE loaded
        # snapshot state across its per-coordinate linkers (the state is
        # timestamp-independent; only resolution differs per coordinate)
        self.store = store or SnapshotStore(origins_path, content_path, status_path)
        self.config = config or PipelineConfig()
        self.emit = emit
        self._memo: dict[tuple, Resolution] = {}

    # ------------------------------------------------------------------ #
    # routing                                                             #
    # ------------------------------------------------------------------ #
    def _serve_archived(self, ont: str, version: Optional[str], fmt: str) -> Resolution:
        """fetch_latest/timestamp_archived core incl. 500->https retry
        (proxy_logic.py:242-273)."""
        if version is None:
            return Resolution(False, 404, "no-version-at-timestamp")
        st, st_https = self.store.availability.get((ont, version, fmt), (404, 404))
        if st != 500:  # non-500 returned as-is, even 404 (proxy_logic.py:254)
            if st == 200:
                return Resolution(True, 200, "served-archivo", version, fmt)
            return Resolution(False, st, "archivo-error")
        if st_https == 200:  # https retry succeeded (O5)
            return Resolution(True, 200, "served-archivo", version, fmt)
        return Resolution(False, st_https, "archivo-error")

    def _serve_origin(self, ont: Optional[str]) -> Resolution:
        """Live-origin outcome shared by original/failover success paths."""
        if ont is None:
            # unknown host: the synthetic world's origins for non-index
            # IRIs are unreachable (request_ontology -> None,
            # proxy_logic.py:157-159)
            return Resolution(False, 502, "origin-unreachable")
        # index and origins are separate inputs with no enforced
        # consistency: an indexed ontology missing an origins row is a
        # dead origin, not a crash (errors are data, M13)
        st, ctype = self.store.origins.get(ont, (0, None))
        if st == 0:
            return Resolution(False, 502, "origin-unreachable")
        if st != 200:
            return Resolution(False, st, "origin-error")
        if ctype in RDF_MIMETYPES:
            return Resolution(
                True, 200, "served-origin", self.store.latest_version(ont),
                map_mime_to_format(ctype),
            )
        # reference ORIGINAL happily returns non-RDF bodies; no triples
        return Resolution(False, 200, "origin-non-rdf")

    def resolve(
        self,
        ont: Optional[str],
        policy: str,
        fmt: Optional[str],
        patched_accept: Optional[str],
    ) -> Resolution:
        key = (ont, policy, fmt, patched_accept)
        hit = self._memo.get(key)
        if hit is not None:
            return hit
        res = self._resolve(ont, policy, fmt, patched_accept)
        self._memo[key] = res
        return res

    def _resolve(self, ont, policy, fmt, patched_accept) -> Resolution:
        cfg = self.config
        if cfg.restricted_access and ont is None:
            # restrictedAccess denies non-Archivo requests with 403
            # (proxy_logic.py:39-54, M3)
            return Resolution(False, 403, "restricted-denied")
        if fmt is None and policy != "original":
            # no Archivo-servable format (proxy_logic.py:174-176)
            return Resolution(False, 500, "no-archivo-format")
        if policy == "original":
            return self._serve_origin(ont)
        if policy == "originalFailoverLiveLatest":
            if ont is not None:
                st, ctype = self.store.origins.get(ont, (0, None))
                if st in PASSTHROUGH_STATUS_CODES:
                    requested = [
                        m for m, _ in parse_accept_header_with_priority(patched_accept or "")
                    ]
                    if ctype in requested:  # literal membership (J3)
                        if st == 200:
                            return self._serve_origin(ont)
                        # the reference returns ANY passthrough-status
                        # origin response (301/304/451...) with matching
                        # mime as-is (proxy_logic.py:218-229); a non-200
                        # has no body to extract triples from
                        return Resolution(False, st, "origin-passthrough")
                # dead / bad status / mime mismatch -> latest archived
            if ont is None:
                return Resolution(False, 404, "not-in-archivo")
            return self._serve_archived(ont, self.store.latest_version(ont), fmt)
        if policy == "latestArchived":
            if ont is None:
                return Resolution(False, 404, "not-in-archivo")
            return self._serve_archived(ont, self.store.latest_version(ont), fmt)
        if policy == "timestampArchived":
            if ont is None:
                return Resolution(False, 404, "not-in-archivo")
            return self._serve_archived(
                ont, self.store.version_as_of(ont, cfg.timestamp), fmt
            )
        return Resolution(False, 500, "unknown-policy")

    # ------------------------------------------------------------------ #
    # batch transform                                                     #
    # ------------------------------------------------------------------ #
    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["doc_id", "term_iri", "canonical_iri", "ontology_id", "accept", "policy"]
        ).to_pandas()
        if len(df) == 0:
            schema = TRIPLES_SCHEMA if self.emit == "triples" else STATUS_SCHEMA
            return pa.table({f.name: pa.array([], type=f.type) for f in schema})

        if self.config.per_row_policy:
            policies = df["policy"].fillna(self.config.onto_version.value)
        else:  # run-level policy override (reference CLI config mode)
            policies = pd.Series([self.config.onto_version.value] * len(df), index=df.index)
        patched, fmts = resolve_format_vector(
            df["accept"].tolist(), policies.tolist(), self.config.onto_format
        )
        df = df.assign(_patched=patched, _fmt=fmts, _policy=policies)

        combos = df[["ontology_id", "_policy", "_fmt", "_patched"]].drop_duplicates()
        res_rows = []
        for ont, policy, fmt, pacc in combos.itertuples(index=False):
            ont_k = None if pd.isna(ont) else ont
            fmt_k = None if (fmt is None or pd.isna(fmt)) else fmt
            r = self.resolve(ont_k, policy, fmt_k, pacc)
            res_rows.append(
                (ont, policy, fmt, pacc, r.served, r.status, r.category, r.version, r.fmt)
            )
        res_df = pd.DataFrame(
            res_rows,
            columns=[
                "ontology_id", "_policy", "_fmt", "_patched",
                "_served", "_status", "_category", "_version", "_served_fmt",
            ],
        )
        df = df.merge(res_df, on=["ontology_id", "_policy", "_fmt", "_patched"], how="left")

        if self.emit == "status":
            out = pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "term_iri": df["term_iri"],
                    "status": df["_status"].astype("int32"),
                    "category": df["_category"],
                    "format": df["_fmt"],
                }
            )
            return pa.Table.from_pandas(out, schema=STATUS_SCHEMA, preserve_index=False)

        served = df[df["_served"]]
        if len(served) == 0:
            return pa.table({f.name: pa.array([], type=f.type) for f in TRIPLES_SCHEMA})

        cols = {name: [] for name in TRIPLES_SCHEMA.names}

        def emit(subj, pred, obj, doc, ver, fmt):
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj"].append(obj)
            cols["doc_id"].append(doc)
            cols["ontology_version"].append(ver)
            cols["format"].append(fmt)

        # isDefinedBy: batch-combined per distinct (term, ontology, version,
        # format) with min-doc provenance
        # dropna=False: a SERVED row may carry a null _version (origin
        # serving an ontology with no archived snapshot) -- it must still
        # emit its isDefinedBy triple, or the status and triples streams
        # silently disagree about what was served
        defined = (
            served.groupby(
                ["term_iri", "canonical_iri", "_version", "_served_fmt"],
                sort=False, dropna=False,
            )["doc_id"]
            .min()
            .reset_index()
        )
        for term, ciri, ver, fmt, doc in defined.itertuples(index=False):
            emit(term, RDFS_IS_DEFINED_BY, ciri, doc,
                 None if pd.isna(ver) else ver, None if pd.isna(fmt) else fmt)

        # ontology content triples: ONE expansion per distinct
        # (ontology, version, format) in the batch -- the combiner that
        # keeps the dedup shuffle small
        content = (
            served.groupby(
                ["ontology_id", "_version", "_served_fmt"], sort=False, dropna=False
            )["doc_id"]
            .min()
            .reset_index()
        )
        for ont, ver, fmt, doc in content.itertuples(index=False):
            # no snapshot content for (ont, ver) -- e.g. served live from
            # origin with no archived snapshot: nothing to expand, but the
            # isDefinedBy triples above were already emitted
            classes, props, sa, sb, ea, eb = self.store.content.get(
                (ont, ver), ([], [], [], [], [], [])
            )
            for c in classes:
                emit(c, RDF_TYPE, OWL_CLASS, doc, ver, fmt)
            for p in props:
                emit(p, RDF_TYPE, OWL_OBJECT_PROPERTY, doc, ver, fmt)
            for a, b in zip(sa, sb):
                emit(a, OWL_SAME_AS, b, doc, ver, fmt)
            for a, b in zip(ea, eb):
                emit(a, OWL_EQUIVALENT_CLASS, b, doc, ver, fmt)

        return pa.table(cols, schema=TRIPLES_SCHEMA)


class MultiConfigLinker:
    """One actor-pool pass linking the SAME mention stream under K
    pipeline configs -- time-machine coordinates (kg_timeline /
    kg_version_diff), version policies (kg_report_ab), or any other
    config axis: the snapshot store loads ONCE per actor and is shared
    by K per-config ``EntityLinker``s; each batch links K times
    (vectorized per config, each linker keeping its own combo memo) and
    the outputs concatenate tagged with an int64 ``coord`` column (the
    index into ``configs``).

    Vs. K separate linker passes this reads the pinned mention stream
    once instead of K times, spins one actor pool instead of K, and
    loads one snapshot state instead of K -- the multi-query
    optimization a version sweep wants.  Callers that need per-
    coordinate DISTINCT triples fold the dedup into their downstream
    key pass (group on (coord, subj, pred, obj) or OR a presence bit)
    instead of paying K dedup exchanges."""

    def __init__(
        self,
        origins_path: str,
        content_path: str,
        status_path: str,
        configs,
        emit: str = "triples",
    ):
        if not configs:
            raise ValueError("MultiConfigLinker needs >= 1 config")
        store = SnapshotStore(origins_path, content_path, status_path)
        self.linkers = [
            EntityLinker(
                origins_path,
                content_path,
                status_path,
                config=cfg,
                emit=emit,
                store=store,
            )
            for cfg in configs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for i, linker in enumerate(self.linkers):
            t = linker(batch)
            outs.append(
                t.append_column("coord", pa.array([i] * len(t), type=pa.int64()))
            )
        return pa.concat_tables(outs)


#: backwards-compatible alias (the class predates its policy-sweep use)
MultiTimestampLinker = MultiConfigLinker
