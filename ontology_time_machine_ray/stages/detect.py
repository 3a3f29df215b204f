"""Mention detection: dictionary scan over interleaved document spans.

The batch restatement of the reference's per-request Archivo membership
check (``proxy_logic.py:88-144``, M1/J1/T1): every http(s) IRI occurring in
a *text* span expands into its ordered truncation-candidate keys and is
probed against the ontology index; the lowest-rank (highest-priority) hit
wins and the matched canonical form replaces the surface path (the
reference's ``set_request_path`` rewrite).  Media spans pass through the
pipeline untouched -- they are never scanned (span-sequence equality is
preserved because this stage only *reads* the documents table and emits a
derived ``mentions`` table).

Scale notes
-----------
* The index is the SMALL side (1,816 entries in the reference): each actor
  loads it ONCE in ``__init__`` -- broadcast, never a shuffle join
  (ray_guide: broadcast-small-side).  For a much larger index, swap the
  dict for a shared-memory ``ray.put`` ref passed to the constructor.
* The hot loop is a compiled-regex scan over span text (C-speed per span),
  plus <=6 dict probes per extracted IRI.  Span flattening, kind filtering
  and column gathers are all pyarrow kernels -- no per-row Python until an
  actual IRI candidate exists (IRIs are sparse relative to text bytes).
* Emitted mentions carry ``doc_id``/``span_idx`` so no cross-row state is
  needed (the reference's per-connection session, custom_proxy.py:69-76,
  becomes ordinary columns, T4).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ontology_time_machine_ray.functions.urls import IRI_RE, _TRAILING_PUNCT, truncation_candidates
from ontology_time_machine_ray.schema import MENTIONS_SCHEMA


def load_index_map(index_path: str) -> dict[tuple[str, str], tuple[str, str]]:
    """(host, path) -> (ontology_id, canonical_iri); the analog of
    ``ARCHIVO_PARSED_URLS`` (download_archivo_urls.py:103-132, S2)."""
    t = pq.read_table(index_path)
    return {
        (h, p): (oid, iri)
        for h, p, oid, iri in zip(
            t["host"].to_pylist(),
            t["path"].to_pylist(),
            t["ontology_id"].to_pylist(),
            t["iri"].to_pylist(),
        )
    }


def _split_fast(iri: str) -> tuple[str, str]:
    """IRI -> (host, fragment-free path) without urlparse overhead."""
    rest = iri.split("://", 1)[1]
    slash = rest.find("/")
    if slash < 0:
        return rest.split("#", 1)[0].split("?", 1)[0], ""
    host = rest[:slash]
    path = rest[slash:]
    for sep in ("#", "?"):
        cut = path.find(sep)
        if cut >= 0:
            path = path[:cut]
    return host, path


class MentionDetector:
    """Callable class for ``map_batches(MentionDetector, fn_constructor_args=
    (index_path,), concurrency=N, batch_format="pyarrow")``.

    State (the index dict) is built once per actor (T1); ``__call__`` runs
    per batch.
    """

    def __init__(self, index_path: Optional[str] = None, index_ref=None):
        if index_ref is not None:  # ray.put broadcast handle
            import ray

            self.index = ray.get(index_ref)
        else:
            self.index = load_index_map(index_path)
        self.iri_re = IRI_RE  # compiled once per process

    def match(self, iri: str) -> tuple[Optional[str], Optional[str], int]:
        """(ontology_id, canonical_iri, rank) for one surface IRI.

        rank mirrors candidate priority in proxy_logic.py:103-141
        (0 exact .. 5 grandparent+'/'); -1 = not in index.
        """
        host, path = _split_fast(iri)
        if not path:
            # host-only request: any index entry on that host matches
            # (proxy_logic.py:100-101)
            for (h, p), (oid, ciri) in self.index.items():
                if h == host:
                    return oid, ciri, 0
            return None, None, -1
        for rank, cand in enumerate(truncation_candidates(path)):
            hit = self.index.get((host, cand))
            if hit is not None:
                return hit[0], hit[1], rank
        return None, None, -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy()
        flat = spans.flatten()
        n_flat = len(flat)
        if n_flat == 0:
            return pa.table(
                {f.name: pa.array([], type=f.type) for f in MENTIONS_SCHEMA}
            )
        kinds = flat.field("kind")
        texts = flat.field("text")
        # vectorized prefilter: only text spans that can contain an IRI
        cand_mask = pc.and_(
            pc.equal(kinds, "text"), pc.match_substring(texts, "http")
        ).to_numpy(zero_copy_only=False)
        offsets = spans.offsets.to_numpy()
        span_idx_all = np.arange(n_flat, dtype=np.int32) - offsets[parent].astype(np.int32)

        doc_ids = batch.column("doc_id").to_pylist()
        accepts = batch.column("accept").to_pylist()
        policies = batch.column("policy").to_pylist()

        out = {name: [] for name in MENTIONS_SCHEMA.names}
        sel = np.nonzero(cand_mask)[0]
        sel_texts = texts.take(pa.array(sel)).to_pylist()
        finditer = self.iri_re.finditer
        for flat_i, text in zip(sel, sel_texts):
            row = parent[flat_i]
            for m in finditer(text):
                iri = m.group(0).rstrip(_TRAILING_PUNCT)
                if not iri:
                    continue
                oid, ciri, rank = self.match(iri)
                out["doc_id"].append(doc_ids[row])
                out["span_idx"].append(int(span_idx_all[flat_i]))
                out["term_iri"].append(iri)
                out["canonical_iri"].append(ciri)
                out["ontology_id"].append(oid)
                out["match_rank"].append(rank)
                out["accept"].append(accepts[row])
                out["policy"].append(policies[row])
        return pa.table(out, schema=MENTIONS_SCHEMA)
