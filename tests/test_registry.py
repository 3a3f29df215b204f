"""Stage-registry extension surface (SURVEY §2.9; stages/registry.py).

The analog of the reference's plugin hooks (custom_proxy.py:48,
proxy_wrapper.py:8-62): custom stages register by name and compose into
the KgPipeline chain from config, without editing the package.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from ontology_time_machine_ray.pipelines.kg import KgPipeline
from ontology_time_machine_ray.stages.registry import (
    ComposedStages,
    StageCtx,
    get_stage,
    list_stages,
    register_stage,
    unregister_stage,
)


def _sorted_triples(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _make_force_latest():
    """Example custom mention transform, built as a LOCAL function the
    way a user session would (locally-defined stages serialize by value
    into the actor args): pin every request's policy to latestArchived."""

    def force_latest_stage(batch: pa.Table, ctx: StageCtx) -> pa.Table:
        i = batch.column_names.index("policy")
        return batch.set_column(
            i, "policy", pa.array(["latestArchived"] * batch.num_rows, type=pa.string())
        )

    return force_latest_stage


def test_builtin_chain_matches_fused_path(ray_session, sf_dir):
    """stages=("detect", "link") reproduces the stock fused pipeline
    bit-for-bit -- the registry is a re-wiring, not a re-implementation."""
    stock = _sorted_triples(KgPipeline.for_sf_dir(sf_dir).triples())
    via_registry = _sorted_triples(
        KgPipeline.for_sf_dir(sf_dir, stages=("detect", "link")).triples()
    )
    pd.testing.assert_frame_equal(stock, via_registry)


def test_drop_unmatched_stage_is_triples_neutral(ray_session, sf_dir):
    """Inserting the builtin drop_unmatched filter between detect and
    link never changes the triples stream (unmatched mentions are never
    served) -- the canonical 'insert a custom filter' composition."""
    stock = _sorted_triples(KgPipeline.for_sf_dir(sf_dir).triples())
    filtered = _sorted_triples(
        KgPipeline.for_sf_dir(
            sf_dir, stages=("detect", "drop_unmatched", "link")
        ).triples()
    )
    pd.testing.assert_frame_equal(stock, filtered)
    # but it DOES thin the status stream to Archivo traffic only
    status = KgPipeline.for_sf_dir(
        sf_dir, stages=("detect", "drop_unmatched", "link")
    ).status().to_pandas()
    assert "not-in-archivo" not in set(status["category"])
    assert len(status) > 0


def test_custom_registered_stage_runs_inside_pipeline(ray_session, sf_dir):
    """A stage registered at runtime composes into KgPipeline and equals
    the config-level expression of the same semantics."""
    from dataclasses import replace

    from ontology_time_machine_ray.config import DEFAULT_CONFIG, OntoVersion

    register_stage("force_latest", _make_force_latest())
    try:
        via_stage = _sorted_triples(
            KgPipeline.for_sf_dir(
                sf_dir, stages=("detect", "force_latest", "link")
            ).triples()
        )
    finally:
        unregister_stage("force_latest")
    cfg = replace(
        DEFAULT_CONFIG, per_row_policy=False, onto_version=OntoVersion.LATEST_ARCHIVED
    )
    via_config = _sorted_triples(
        KgPipeline(paths=KgPipeline.for_sf_dir(sf_dir).paths, config=cfg).triples()
    )
    pd.testing.assert_frame_equal(via_stage, via_config)


def test_module_path_stage_resolution(ray_session, sf_dir):
    """Unregistered 'module.path:attr' names import user stages directly
    -- the ship-your-own-module plug point the CLI --stage flag uses."""
    from ontology_time_machine_ray.stages.registry import drop_unmatched_stage

    name = "ontology_time_machine_ray.stages.registry:drop_unmatched_stage"
    assert get_stage(name) is drop_unmatched_stage
    via_path = _sorted_triples(
        KgPipeline.for_sf_dir(sf_dir, stages=("detect", name, "link")).triples()
    )
    via_registry = _sorted_triples(
        KgPipeline.for_sf_dir(
            sf_dir, stages=("detect", "drop_unmatched", "link")
        ).triples()
    )
    pd.testing.assert_frame_equal(via_path, via_registry)
    with pytest.raises(TypeError, match="non-callable"):
        get_stage("ontology_time_machine_ray.stages.registry:_STAGES")


def test_registry_errors_and_contracts(ray_session, sf_dir):
    paths = KgPipeline.for_sf_dir(sf_dir).paths
    from ontology_time_machine_ray.config import DEFAULT_CONFIG

    ctx = StageCtx(paths=paths, config=DEFAULT_CONFIG)
    with pytest.raises(KeyError, match="unknown stage"):
        ComposedStages(["detect", "no_such_stage"], ctx)
    with pytest.raises(TypeError, match="must be callable"):
        register_stage("bad", 42)
    # a stage returning a non-Table fails loudly, naming the stage
    register_stage("wrong_type", lambda batch, ctx: batch.to_pandas())
    try:
        comp = ComposedStages(["detect", "wrong_type"], ctx)
        docs = pa.table(
            {
                "doc_id": ["d0"],
                "spans": [
                    [{"kind": "text", "text": "see http://onto1.example.org/ontology1 x",
                      "media_ref": "", "offset": 0}]
                ],
                "accept": ["text/turtle"],
                "policy": ["latestArchived"],
            }
        )
        with pytest.raises(TypeError, match="wrong_type"):
            comp(docs)
    finally:
        unregister_stage("wrong_type")
    # builtins stay registered
    assert {"detect", "link", "add_method", "drop_unmatched"} <= set(list_stages())
    # ctx.state never serializes (worker state rebuilds per worker)
    import pickle

    ctx.state["detector"] = object()
    assert pickle.loads(pickle.dumps(ctx)).state == {}
