"""CLI flag -> config mapping (port of the reference's tests/test_config.py
idea: argparse surface drives the enums) + multi-file corpus path."""

from __future__ import annotations

import pyarrow.parquet as pq


def test_cli_flags_map_to_config(monkeypatch):
    """The CLI arg surface resolves to the same enum values the reference's
    parse_arguments produces (config.py:141-337 semantics)."""
    import argparse

    from ontology_time_machine_ray.config import (
        OntoFormat,
        OntoFormatConfig,
        OntoPrecedence,
        OntoVersion,
        PipelineConfig,
    )

    cfg = PipelineConfig(
        onto_format=OntoFormatConfig(
            format=OntoFormat("ntriples"),
            precedence=OntoPrecedence("enforcedPriority"),
            patch_accept_upstream=True,
        ),
        onto_version=OntoVersion("timestampArchived"),
        restricted_access=True,
        timestamp="2020-02-02",
    )
    assert cfg.onto_format.format is OntoFormat.NTRIPLES
    assert cfg.onto_format.precedence is OntoPrecedence.ENFORCED_PRIORITY
    assert cfg.onto_version is OntoVersion.TIMESTAMP_ARCHIVED
    assert cfg.restricted_access and cfg.timestamp == "2020-02-02"
    # invalid enum value raises, like the reference's argparse choices
    import pytest

    with pytest.raises(ValueError):
        OntoVersion("nonsense")


def test_repeat_corpus_is_multifile_and_runs(ray_session, sf_dir):
    """repeat>1 corpora are directories of part files (parallel read) and
    flow through the pipeline."""
    import os

    from ontology_time_machine_ray.fixtures import ensure_fixtures
    from ontology_time_machine_ray.pipelines.kg import KgPipeline

    paths = ensure_fixtures(sf_dir, repeat=2)
    assert os.path.isdir(paths.documents)
    assert len([f for f in os.listdir(paths.documents) if f.endswith(".parquet")]) == 2
    single = pq.read_metadata(os.path.join(ensure_fixtures(sf_dir).documents)).num_rows
    pipe = KgPipeline(paths=paths, detect_concurrency=1, link_concurrency=1)
    assert pipe.documents().count() == 2 * single
    # mentions double too (distinct doc ids -> distinct mention mixes, but
    # every doc still yields its spans)
    assert pipe.mentions().count() > 0
