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

#: RE2-compatible forms of the scanner for the Arrow C kernels, derived
#: from the ONE grammar in functions/urls.py so the single-IRI (Arrow
#: kernel) and multi-IRI (Python IRI_RE) paths can never diverge.
IRI_PATTERN = IRI_RE.pattern
_PUNCT_RE_SQL = f"[{_TRAILING_PUNCT}]+$"


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
        self._match_cache: dict[str, tuple] = {}
        # host -> first index entry on that host (insertion order), so the
        # host-only probe is O(1) instead of a scan of the whole index
        self._host_first: dict[str, tuple[str, str]] = {}
        for (h, _p), val in self.index.items():
            if h not in self._host_first:
                self._host_first[h] = val

    def match(self, iri: str) -> tuple[Optional[str], Optional[str], int]:
        """(ontology_id, canonical_iri, rank) for one surface IRI.

        rank mirrors candidate priority in proxy_logic.py:103-141
        (0 exact .. 5 grandparent+'/'); -1 = not in index.
        """
        host, path = _split_fast(iri)
        if not path:
            # host-only request: any index entry on that host matches
            # (proxy_logic.py:100-101); precomputed host map keeps this
            # O(1) at million-entry index scale
            hit = self._host_first.get(host)
            if hit is not None:
                return hit[0], hit[1], 0
            return None, None, -1
        for rank, cand in enumerate(truncation_candidates(path)):
            hit = self.index.get((host, cand))
            if hit is not None:
                return hit[0], hit[1], rank
        return None, None, -1

    def match_cached(self, iri: str) -> tuple[Optional[str], Optional[str], int]:
        """Per-worker memo over distinct surface IRIs: real corpora repeat
        surface forms heavily, so the <=6 dict probes + string splits run
        once per distinct IRI, not once per occurrence."""
        hit = self._match_cache.get(iri)
        if hit is None:
            hit = self.match(iri)
            if len(self._match_cache) > 1_000_000:
                self._match_cache.clear()
            self._match_cache[iri] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        # optional request-plane columns ride along untouched: a `method`
        # column (GET/HEAD, the reference's per-request verb --
        # proxy_wrapper.py:65-151 accessors) propagates to each mention
        # so the linker can route HEAD as headers-only (M-method)
        has_method = "method" in batch.column_names
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy()
        flat = spans.flatten()
        n_flat = len(flat)
        if n_flat == 0:
            empty = pa.table(
                {f.name: pa.array([], type=f.type) for f in MENTIONS_SCHEMA}
            )
            if has_method:
                empty = empty.append_column(
                    "method", pa.array([], type=pa.string())
                )
            return empty
        kinds = flat.field("kind")
        texts = flat.field("text")
        # vectorized prefilter: only text spans that can contain an IRI
        cand_mask = pc.and_(
            pc.equal(kinds, "text"), pc.match_substring(texts, "http")
        ).to_numpy(zero_copy_only=False)
        offsets = spans.offsets.to_numpy()
        span_idx_all = np.arange(n_flat, dtype=np.int32) - offsets[parent].astype(np.int32)

        sel = np.nonzero(cand_mask)[0]
        sel_texts = texts.take(pa.array(sel))

        # the common case (one IRI per span) runs entirely in Arrow C
        # kernels: count matches, extract the first, strip prose punct --
        # no Python string materialization.  Multi-IRI spans (rare) fall
        # back to the compiled-regex loop.
        n_matches = pc.count_substring_regex(sel_texts, IRI_PATTERN).to_numpy(
            zero_copy_only=False
        )
        first = pc.extract_regex(sel_texts, f"(?P<iri>{IRI_PATTERN})")
        single = n_matches == 1
        single_pos = np.nonzero(single)[0]
        single_iris = pc.replace_substring_regex(
            first.field("iri").take(pa.array(single_pos)), _PUNCT_RE_SQL, ""
        ).to_pylist()
        flat_rows = [sel[i] for i in single_pos]

        multi_pos = np.nonzero(n_matches > 1)[0]
        if len(multi_pos):
            finditer = self.iri_re.finditer
            for i, text in zip(multi_pos, sel_texts.take(pa.array(multi_pos)).to_pylist()):
                for m in finditer(text):
                    iri = m.group(0).rstrip(_TRAILING_PUNCT)
                    if iri:
                        single_iris.append(iri)
                        flat_rows.append(sel[i])

        match_cached = self.match_cached
        matches = [match_cached(iri) for iri in single_iris]
        rows = np.asarray(flat_rows, dtype=np.int64)
        parent_rows = parent[rows] if len(rows) else rows
        parent_idx = pa.array(parent_rows)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id").take(parent_idx),
                "span_idx": pa.array(span_idx_all[rows] if len(rows) else [], type=pa.int32()),
                "term_iri": pa.array(single_iris, type=pa.string()),
                "canonical_iri": pa.array([m[1] for m in matches], type=pa.string()),
                "ontology_id": pa.array([m[0] for m in matches], type=pa.string()),
                "match_rank": pa.array([m[2] for m in matches], type=pa.int32()),
                "accept": batch.column("accept").take(parent_idx),
                "policy": batch.column("policy").take(parent_idx),
            },
            schema=MENTIONS_SCHEMA,
        )
        if has_method:
            out = out.append_column(
                "method", batch.column("method").take(parent_idx)
            )
        return out
