"""Arrow schemas for every table flowing through the engine.

The ``documents`` shape is authoritative per ``BASELINE.json.input_hint``:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
The span plays the role the HTTP request played in the reference -- a unit
carrying an IRI/mention to resolve (``proxy_wrapper.py:65-151``).  Span
order within a row is load-bearing: the pipeline must preserve per-row
span-sequence equality (kind, text, media_ref, order).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),  # "text" | "media"
        ("text", pa.string()),  # prose for text spans, "" for media
        ("media_ref", pa.string()),  # "media://..." for media spans, "" for text
        ("offset", pa.int32()),  # char offset within the document
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        # per-row request profile: the batch analog of per-client config via
        # proxy auth (reference proxy_logic.py:65-86).  Nullable.
        ("accept", pa.string()),
        ("policy", pa.string()),
    ]
)

ONTOLOGY_INDEX_SCHEMA = pa.schema(
    [
        ("ontology_id", pa.string()),
        ("iri", pa.string()),
        ("host", pa.string()),
        ("path", pa.string()),
    ]
)

#: live-origin behaviour per ontology (drives original/failover policies;
#: models reference request_ontology outcomes, proxy_logic.py:147-159).
ORIGINS_SCHEMA = pa.schema(
    [
        ("ontology_id", pa.string()),
        ("origin_status", pa.int32()),  # 0 == unreachable (None response)
        ("origin_content_type", pa.string()),
    ]
)

#: versioned snapshot content: what the time machine serves at a version.
SNAPSHOT_CONTENT_SCHEMA = pa.schema(
    [
        ("ontology_id", pa.string()),
        ("version", pa.string()),  # YYYY-MM-DD, the addressable coordinate
        ("version_ts", pa.timestamp("us")),
        ("classes", pa.list_(pa.string())),
        ("properties", pa.list_(pa.string())),
        ("same_as_a", pa.list_(pa.string())),
        ("same_as_b", pa.list_(pa.string())),
        ("equiv_a", pa.list_(pa.string())),
        ("equiv_b", pa.list_(pa.string())),
        # rdfs:subClassOf edges (subclass_a[i] subClassOf subclass_b[i]):
        # the class-hierarchy dimension an ontology snapshot carries;
        # consumed by the RDFS-entailment closure (kg_subclass_closure).
        # Consumers that predate the column access rows by NAME, so it is
        # additive (SnapshotStore, the RDF-parse rebuild and every oracle
        # CTE ignore it).
        ("subclass_a", pa.list_(pa.string())),
        ("subclass_b", pa.list_(pa.string())),
    ]
)

#: per (ontology, version, format) availability, incl. the https-retry
#: outcome (reference 500-retry, proxy_logic.py:254-260).
SNAPSHOT_STATUS_SCHEMA = pa.schema(
    [
        ("ontology_id", pa.string()),
        ("version", pa.string()),
        ("format", pa.string()),  # ttl | nt | owl
        ("status", pa.int32()),
        ("status_https", pa.int32()),
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("term_iri", pa.string()),  # surface IRI as extracted (minus prose punct)
        ("canonical_iri", pa.string()),  # index IRI after truncation rewrite
        ("ontology_id", pa.string()),  # null => not in index (404 route)
        ("match_rank", pa.int32()),  # 0 exact .. 5 grandparent+/ ; -1 no match
        ("accept", pa.string()),
        ("policy", pa.string()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("doc_id", pa.string()),
        ("ontology_version", pa.string()),
        ("format", pa.string()),
    ]
)

#: non-served rows routed to a status/rejects table (reference mock
#: responses 403/404/406/500, utils/mock_responses.py) -- errors are DATA,
#: not exceptions (download_ontologies.py:28-49 error-chain idea, M13).
STATUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("term_iri", pa.string()),
        ("status", pa.int32()),
        ("category", pa.string()),
        ("format", pa.string()),
    ]
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_IS_DEFINED_BY = "http://www.w3.org/2000/01/rdf-schema#isDefinedBy"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_OBJECT_PROPERTY = "http://www.w3.org/2002/07/owl#ObjectProperty"
OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"
OWL_EQUIVALENT_CLASS = "http://www.w3.org/2002/07/owl#equivalentClass"
