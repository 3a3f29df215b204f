"""TSV-driven conformance corpus, the reference's test strategy restated.

Each row of ``conformance_corpus.tsv`` (schema of the reference's
``tests/archivo_test_IRIs.tsv`` plus explicit policy/accept columns) is a
request IRI with a HAND-DERIVED expected status + category.  The corpus
becomes a tiny interleaved documents table routed through the real
detect+link stages -- no network, error dimensions encoded in the
synthetic origin/snapshot tables (FIXTURES.md §4).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from ontology_time_machine_ray.fixtures import ensure_fixtures
from ontology_time_machine_ray.schema import DOCUMENTS_SCHEMA
from ontology_time_machine_ray.sources.readers import read_conformance_tsv
from ontology_time_machine_ray.stages.detect_link import DetectLink

TSV = os.path.join(os.path.dirname(__file__), "conformance_corpus.tsv")


@pytest.fixture(scope="module")
def corpus():
    t = read_conformance_tsv(TSV)
    rows = [r for r in t.to_pylist() if r["enable_testcase"] == 1]
    assert len(rows) >= 15
    return rows


def test_conformance_corpus(ray_session, sf_dir, corpus):
    paths = ensure_fixtures(sf_dir)
    docs = pa.table(
        {
            "doc_id": [f"case-{i:03d}" for i in range(len(corpus))],
            "spans": [
                [{"kind": "text", "text": f"probe {r['iri']} end", "media_ref": "", "offset": 0}]
                for r in corpus
            ],
            "accept": [r["accept"] or None for r in corpus],
            "policy": [r["policy"] for r in corpus],
        },
        schema=DOCUMENTS_SCHEMA,
    ).append_column("method", pa.array([r["method"] for r in corpus]))
    stage = DetectLink(
        paths.ontology_index,
        paths.origins,
        paths.snapshot_content,
        paths.snapshot_status,
        emit="status",
    )
    out = {r["doc_id"]: (r["status"], r["category"]) for r in stage(docs).to_pylist()}
    failures = []
    for i, r in enumerate(corpus):
        got = out.get(f"case-{i:03d}")
        want = (int(r["expected_error"]), r["error_dimension"])
        if got != want:
            failures.append(f"{r['iri']} [{r['policy']}]: want {want}, got {got} ({r['comment']})")
    assert not failures, "\n".join(failures)


def test_conformance_served_rows_emit_triples(ray_session, sf_dir, corpus):
    """Rows whose category starts with 'served-' and is RDF must yield
    triples mentioning the requested IRI (the reference's semantic check:
    'served content describes the requested IRI',
    tests/test_integration.py:113-121 / parse_ontologies.py:13-18)."""
    paths = ensure_fixtures(sf_dir)

    def docs_for(rows):
        return pa.table(
            {
                "doc_id": [f"case-{i:03d}" for i, _ in rows],
                "spans": [
                    [{"kind": "text", "text": f"probe {r['iri']} end", "media_ref": "", "offset": 0}]
                    for _, r in rows
                ],
                "accept": [r["accept"] or None for _, r in rows],
                "policy": [r["policy"] for _, r in rows],
            },
            schema=DOCUMENTS_SCHEMA,
        ).append_column("method", pa.array([r["method"] for _, r in rows]))

    stage = DetectLink(
        paths.ontology_index,
        paths.origins,
        paths.snapshot_content,
        paths.snapshot_status,
        emit="triples",
    )
    served = [
        (i, r) for i, r in enumerate(corpus)
        if r["error_dimension"] in ("served-archivo", "served-origin")
    ]
    served_get = [(i, r) for i, r in served if r["method"] == "GET"]
    triples = stage(docs_for(served_get)).to_pylist()
    subjects = {t["subj"] for t in triples}
    for _, r in served_get:
        # fragment-stripped surface IRI appears in subject position
        assert r["iri"] in subjects or r["iri"].split("#")[0] in subjects, r["iri"]

    # HEAD rows resolve as served (checked by test_conformance_corpus)
    # but a headers-only response emits NO content-derived triples
    served_head = [(i, r) for i, r in served if r["method"] == "HEAD"]
    assert served_head, "corpus must carry HEAD conformance rows"
    head_triples = stage(docs_for(served_head)).to_pylist()
    assert head_triples == []
