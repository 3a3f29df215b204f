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
