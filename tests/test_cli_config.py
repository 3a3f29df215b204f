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


def test_cli_query_runner(ray_session, tmp_path, capsys):
    """The query subcommand runs any registry operator standalone and
    streams Dataset results to parquet without driver materialization."""
    import json
    import os

    import pyarrow.parquet as pq

    from ontology_time_machine_ray.__main__ import main

    out = str(tmp_path / "stats_out")
    rc = main(["query", "text_stats", "--sf-dir", "/root/testdata/sf0.001", "--out", out])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["query"] == "text_stats"
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    n = sum(pq.read_metadata(os.path.join(out, f)).num_rows for f in files)
    assert n == 500  # sf0.001 documents table

    rc = main(["query", "--list"])
    assert rc == 0
    listing = json.loads(capsys.readouterr().out.strip())
    assert "kg_mentions" in listing["queries"]
