"""Differential test: EntityLinker.resolve vs the independent oracle's
route() over the full (ontology × policy × accept) cross product.

Both read the same fixture tables but share no routing code; the oracle's
negotiation table is hand-derived.  Any divergence in the failover
cascade, as-of resolution, retry handling or reject codes fails here with
the exact combo."""

from __future__ import annotations

import pytest

from ontology_time_machine_ray.fixtures import ACCEPTS, POLICIES, ensure_fixtures, ont_id
from ontology_time_machine_ray.stages.link import EntityLinker

from oracle_py import NEGOTIATION, Oracle


@pytest.fixture(scope="module")
def pair(sf_dir):
    paths = ensure_fixtures(sf_dir)
    linker = EntityLinker(paths.origins, paths.snapshot_content, paths.snapshot_status)
    return linker, Oracle(paths)


def test_full_routing_cross_product(pair):
    linker, oracle = pair
    onts = [None] + [ont_id(k) for k in range(48)]
    mismatches = []
    for ont in onts:
        for policy in POLICIES:
            for accept in ACCEPTS:
                fmt, _ = NEGOTIATION[accept]
                # linker receives the PATCHED accept via resolve_format_vector
                # normally; emulate by passing the raw accept through its own
                # patching (kept separate from the oracle's hand table)
                from ontology_time_machine_ray.functions.negotiate import (
                    resolve_format_vector,
                )
                from ontology_time_machine_ray.config import OntoFormatConfig

                patched, fmts = resolve_format_vector([accept], [policy], OntoFormatConfig())
                r = linker.resolve(ont, policy, fmts[0], patched[0])
                want = oracle.route(ont, policy, accept)
                got = (r.served, r.status, r.category, r.version, r.fmt)
                if got != want:
                    mismatches.append((ont, policy, accept, got, want))
    assert not mismatches, mismatches[:5]


def test_served_origin_without_snapshot_still_emits_triple(tmp_path):
    """An ontology present in origins (200, RDF) but ABSENT from
    snapshot_content is served live with version=None; the triples stream
    must still emit its isDefinedBy triple (null version), matching the
    status stream -- not silently drop the group (pandas dropna)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.schema import RDFS_IS_DEFINED_BY

    origins = tmp_path / "origins.parquet"
    content = tmp_path / "content.parquet"
    status = tmp_path / "status.parquet"
    pq.write_table(
        pa.table({
            "ontology_id": ["o1"],
            "origin_status": pa.array([200], pa.int32()),
            "origin_content_type": ["text/turtle"],
        }),
        origins,
    )
    empty_list = pa.array([], pa.list_(pa.string()))
    pq.write_table(
        pa.table({
            "ontology_id": pa.array([], pa.string()),
            "version": pa.array([], pa.string()),
            "classes": empty_list, "properties": empty_list,
            "same_as_a": empty_list, "same_as_b": empty_list,
            "equiv_a": empty_list, "equiv_b": empty_list,
        }),
        content,
    )
    pq.write_table(
        pa.table({
            "ontology_id": pa.array([], pa.string()),
            "version": pa.array([], pa.string()),
            "format": pa.array([], pa.string()),
            "status": pa.array([], pa.int32()),
            "status_https": pa.array([], pa.int32()),
        }),
        status,
    )
    mentions = pa.table({
        "doc_id": ["d1"],
        "term_iri": ["http://x/o1#T"],
        "canonical_iri": ["http://x/o1"],
        "ontology_id": ["o1"],
        "accept": ["text/turtle"],
        "policy": ["original"],
    })
    triples = EntityLinker(str(origins), str(content), str(status), emit="triples")(mentions)
    df = triples.to_pandas()
    assert len(df) == 1
    assert df["pred"].iloc[0] == RDFS_IS_DEFINED_BY
    assert pd.isna(df["ontology_version"].iloc[0])
    st = EntityLinker(str(origins), str(content), str(status), emit="status")(mentions)
    assert st.to_pandas()["status"].tolist() == [200]

    # an index entry with NO origins row routes to an error status, never
    # a KeyError that kills the batch (errors are data, M13)
    linker = EntityLinker(str(origins), str(content), str(status))
    r = linker.resolve("ghost", "original", "ttl", "text/turtle")
    assert (r.served, r.status) == (False, 502)
    r2 = linker.resolve("ghost", "originalFailoverLiveLatest", "ttl", "text/turtle")
    assert not r2.served and r2.status in (404, 500)
