"""End-to-end KG pipeline vs the independent Python oracle.

Gates (BASELINE.md / FIXTURES.md §6): triple P/R >= 0.95 vs reference
semantics (we assert exact set equality, which is stronger), per-row
span-sequence equality on the passthrough, exact dedup, and matching
status/report buckets.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ontology_time_machine_ray.fixtures import ensure_fixtures
from ontology_time_machine_ray.pipelines.kg import KgPipeline

from oracle_py import Oracle


@pytest.fixture(scope="module")
def pipeline(ray_session, sf_dir):
    return KgPipeline.for_sf_dir(sf_dir, detect_concurrency=1, link_concurrency=1)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    return Oracle(ensure_fixtures(sf_dir))


@pytest.fixture(scope="module")
def oracle_run(oracle):
    return oracle.run()


def _pr(got: set, want: set) -> tuple[float, float]:
    if not got or not want:
        return (0.0, 0.0)
    tp = len(got & want)
    return tp / len(got), tp / len(want)


def test_triples_match_oracle(pipeline, oracle_run):
    want, _ = oracle_run
    got_df = pipeline.triples().to_pandas()
    got = {(r.subj, r.pred, r.obj) for r in got_df.itertuples()}
    precision, recall = _pr(got, set(want))
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert got == set(want)  # stronger than the 0.95 gate
    # exact dedup: no (s,p,o) duplicates
    assert len(got_df) == len(got)
    # provenance tie-break matches the oracle's min rule
    for r in got_df.itertuples():
        assert (r.doc_id, r.ontology_version, r.format) == want[(r.subj, r.pred, r.obj)]


def test_canonical_triples_match_oracle(pipeline, oracle, oracle_run):
    want_raw, _ = oracle_run
    want = oracle.canonicalize(want_raw)
    got_df = pipeline.triples_canonical().to_pandas()
    got = {(r.subj, r.pred, r.obj) for r in got_df.itertuples()}
    precision, recall = _pr(got, set(want))
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert got == set(want)
    assert len(got_df) == len(got)


def test_status_report_matches_oracle(pipeline, oracle_run):
    _, statuses = oracle_run
    want = (
        pd.DataFrame(statuses, columns=["doc_id", "iri", "status", "category", "format"])
        .groupby(["category", "format"], dropna=False)
        .size()
    )
    got = pipeline.report().to_pandas().set_index(["category", "format"])["count()"]
    for (cat, fmt), n in want.items():
        key = (cat, fmt if isinstance(fmt, str) else None)
        assert int(got.get(key, 0)) == int(n), (key, n, got.get(key))
    assert int(got.sum()) == int(want.sum())


def test_span_sequence_passthrough(pipeline, sf_dir):
    """Per-row span-sequence equality (kind, text, media_ref, order) between
    the input corpus and the pipeline's view of it."""
    paths = ensure_fixtures(sf_dir)
    src = pq.read_table(paths.documents)
    out = pipeline.documents().to_pandas().sort_values("doc_id").reset_index(drop=True)
    src_df = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(src_df)
    for a, b in zip(src_df.itertuples(), out.itertuples()):
        assert a.doc_id == b.doc_id
        assert [(s["kind"], s["text"], s["media_ref"]) for s in a.spans] == [
            (s["kind"], s["text"], s["media_ref"]) for s in b.spans
        ]


def test_mentions_cover_all_ranks(pipeline):
    m = pipeline.mentions().to_pandas()
    # the corpus exercises exact, stripped-slash, parent(+/) and
    # grandparent(+/) truncation forms plus the not-in-index route
    assert {-1, 0, 1}.issubset(set(m["match_rank"].unique()))
    assert (m["match_rank"] >= -1).all() and (m["match_rank"] <= 5).all()


def test_incremental_canonical_equals_one_shot(ray_session, sf_dir, tmp_path):
    """Canonical build from the first half + update_canonical with the
    second half must equal the one-shot canonical store exactly --
    including the component-merge (moved-representative) path -- and a
    re-applied delta must be a no-op (moved == 0 path)."""
    import pyarrow.parquet as _pq

    from ontology_time_machine_ray.sources.writers import read_store_asof

    paths = ensure_fixtures(sf_dir)
    ids = sorted(_pq.read_table(paths.documents, columns=["doc_id"])["doc_id"].to_pylist())
    mid = ids[len(ids) // 2]

    full_out = str(tmp_path / "full")
    incr_out = str(tmp_path / "incr")
    cols = ["subj", "pred", "obj", "doc_id", "ontology_version", "format"]

    KgPipeline(paths=paths).materialize(full_out, canonical=True)
    KgPipeline(paths=paths, doc_id_range=(None, mid)).materialize(incr_out, canonical=True)
    delta = KgPipeline(paths=paths, doc_id_range=(mid, None))
    summary = delta.update_canonical(incr_out)

    full = (read_store_asof(full_out, columns=cols).to_pandas()
            .sort_values(cols).reset_index(drop=True))
    incr = (read_store_asof(incr_out, columns=cols).to_pandas()
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(full, incr)

    # idempotency: the repaired mapping already covers the delta, so the
    # re-application takes the touched-partitions-only path and changes
    # nothing
    again = KgPipeline(paths=paths, doc_id_range=(mid, None)).update_canonical(incr_out)
    assert again["moved_representatives"] == 0
    incr2 = (read_store_asof(incr_out, columns=cols).to_pandas()
             .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(incr, incr2)

    # the COW overwrite path must keep time travel exact: version 0 of
    # the incrementally-updated store == a fresh base-half canonical build
    base_out = str(tmp_path / "base")
    KgPipeline(paths=paths, doc_id_range=(None, mid)).materialize(base_out, canonical=True)
    v0 = (read_store_asof(incr_out, version=0, columns=cols).to_pandas()
          .sort_values(cols).reset_index(drop=True))
    base = (read_store_asof(base_out, columns=cols).to_pandas()
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(v0, base)
    print("first-update moved representatives:", summary["moved_representatives"])


def test_spo_cache_keys_on_live_session(ray_session):
    """Stale entries from a dead Ray cluster must be evicted, never
    served: the key is the driver NODE id (fresh per started cluster),
    not the job id (which restarts numbering at 01000000 and collides
    across shutdown+init)."""
    from ontology_time_machine_ray.pipelines import queries as q

    q._SPO_CACHE.clear()
    try:
        q._SPO_CACHE[("sfX", "dead-node-id")] = object()
        ds = q._spo_store("/root/testdata/sf0.001")
        assert ("sfX", "dead-node-id") not in q._SPO_CACHE  # evicted
        assert q._spo_store("/root/testdata/sf0.001") is ds  # live hit
        key = q._ray_session_key()
        assert key is not None and key != "01000000"
    finally:
        q._SPO_CACHE.clear()
