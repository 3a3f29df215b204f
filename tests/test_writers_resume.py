"""Partitioned materialization: lineage manifests + resume-skip semantics."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq


def _toy_ds():
    import ray.data as rd

    df = pd.DataFrame(
        {
            "subj": [f"s{i}" for i in range(100)],
            "pred": ["p"] * 100,
            "obj": [f"o{i}" for i in range(100)],
        }
    )
    return rd.from_pandas(df), df


def _read_all(out_dir: str) -> pd.DataFrame:
    parts = []
    for name in sorted(os.listdir(out_dir)):
        f = os.path.join(out_dir, name, "data.parquet")
        if os.path.exists(f):
            parts.append(pq.read_table(f).to_pandas())
    return pd.concat(parts, ignore_index=True)


def test_write_partitioned_and_resume(ray_session, tmp_path):
    from ontology_time_machine_ray.sources.writers import completed_partitions, write_partitioned

    out = str(tmp_path / "store")
    ds, df = _toy_ds()
    summary = write_partitioned(ds, out, num_partitions=8, config_hash="cfg1")
    assert sum(summary["partitions"].values()) == 100
    got = _read_all(out).sort_values(["subj"]).reset_index(drop=True)
    assert len(got) == 100
    assert set(got["subj"]) == set(df["subj"])
    done = completed_partitions(out, "cfg1")
    assert len(done) == len(summary["partitions"])

    # simulate a partial failure: kill two partitions, then resume
    victims = sorted(done)[:2]
    for v in victims:
        shutil.rmtree(os.path.join(out, f"part={v:05d}"))
    ds2, _ = _toy_ds()
    summary2 = write_partitioned(ds2, out, num_partitions=8, config_hash="cfg1")
    # only the two killed partitions were rewritten
    assert sorted(summary2["partitions"]) == victims
    assert sorted(summary2["skipped"]) == sorted(set(done) - set(victims))
    got2 = _read_all(out)
    assert len(got2) == 100

    # a config change invalidates every manifest
    ds3, _ = _toy_ds()
    summary3 = write_partitioned(ds3, out, num_partitions=8, config_hash="cfg2")
    assert sum(summary3["partitions"].values()) == 100
    assert summary3["skipped"] == []
    # manifests record the new config AND the hash layout
    m = json.load(open(os.path.join(out, "part=00000", "_manifest.json")))
    assert m["config_hash"] == "cfg2" and m["status"] == "DONE"
    assert m["num_partitions"] == 8 and m["partition_key"] == "subj"


def test_resume_with_different_layout_rewrites(ray_session, tmp_path):
    """A store written with another output_partitions (or key) is a
    DIFFERENT hash layout: resuming over it must not skip anything
    (ADVICE round 1: silently mixing layouts duplicates/loses rows)."""
    from ontology_time_machine_ray.sources.writers import write_partitioned

    out = str(tmp_path / "store")
    ds, _ = _toy_ds()
    write_partitioned(ds, out, num_partitions=4, config_hash="cfg1")

    ds2, _ = _toy_ds()
    summary = write_partitioned(ds2, out, num_partitions=8, config_hash="cfg1")
    assert summary["skipped"] == []  # nothing from the 4-way layout reused
    assert sum(summary["partitions"].values()) == 100
    # key change is likewise a new layout
    ds3, _ = _toy_ds()
    summary3 = write_partitioned(ds3, out, num_partitions=8, config_hash="cfg1", key="obj")
    assert summary3["skipped"] == []


def test_kg_materialize_smoke(ray_session, sf_dir, tmp_path):
    from ontology_time_machine_ray.pipelines.kg import KgPipeline

    p = KgPipeline.for_sf_dir(sf_dir, detect_concurrency=1, link_concurrency=1)
    out = str(tmp_path / "triples")
    summary = p.materialize(out, canonical=False)
    total = sum(summary["partitions"].values())
    assert total > 0
    lineage = json.load(open(os.path.join(out, "_lineage.json")))
    assert lineage["config_hash"] == p.config_hash()
    got = _read_all(out)
    assert len(got) == total
    assert not got.duplicated(["subj", "pred", "obj"]).any()


def test_update_partitioned_incremental_merge(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        update_partitioned,
        write_partitioned,
    )

    def mk(lo, hi, doc):
        df = pd.DataFrame(
            {
                "subj": [f"s{i % 40}" for i in range(lo, hi)],
                "pred": ["p"] * (hi - lo),
                "obj": [f"o{i % 60}" for i in range(lo, hi)],
                "doc_id": [doc] * (hi - lo),
            }
        )
        return rd.from_pandas(df), df

    kw = dict(
        num_partitions=8,
        config_hash="cfgU",
        key="subj",
        dedup_keys=["subj", "pred", "obj"],
        dedup_order=["doc_id"],
    )
    out_full = str(tmp_path / "full")
    out_incr = str(tmp_path / "incr")

    base_ds, base_df = mk(0, 80, "dA")
    delta_ds, delta_df = mk(40, 120, "dB")  # overlaps base on (s,p,o)
    all_ds = rd.from_pandas(pd.concat([base_df, delta_df], ignore_index=True))

    write_partitioned(all_ds, out_full, **kw)
    write_partitioned(base_ds, out_incr, **kw)
    summary = update_partitioned(delta_ds, out_incr, **kw)
    assert sum(summary["added"].values()) >= 0

    cols = ["subj", "pred", "obj", "doc_id"]
    full = _read_all(out_full)[cols].sort_values(cols).reset_index(drop=True)
    incr = _read_all(out_incr)[cols].sort_values(cols).reset_index(drop=True)
    # incremental build+update == one-shot build, incl. lineage tie-break
    pd.testing.assert_frame_equal(full, incr)

    # idempotent: re-applying the same delta changes nothing
    delta_ds2, _ = mk(40, 120, "dB")
    again = update_partitioned(delta_ds2, out_incr, **kw)
    assert all(a == 0 for a in again["added"].values())
    incr2 = _read_all(out_incr)[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(incr, incr2)

    # guard rails: unbuilt store / layout mismatch / missing key
    with pytest.raises(ValueError):
        update_partitioned(delta_ds2, str(tmp_path / "nope"), **kw)
    bad = dict(kw, num_partitions=16)
    with pytest.raises(ValueError):
        update_partitioned(delta_ds2, out_incr, **bad)
    with pytest.raises(ValueError):
        update_partitioned(delta_ds2, out_incr, num_partitions=8,
                           config_hash="cfgU", key="subj", dedup_keys=None)


def test_read_store_asof_time_travel(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        update_partitioned,
        write_partitioned,
    )

    kw = dict(
        num_partitions=4,
        config_hash="cfgT",
        key="subj",
        dedup_keys=["subj", "pred", "obj"],
        dedup_order=["doc_id"],
    )
    out = str(tmp_path / "tt")

    def mk(subjs, doc):
        df = pd.DataFrame(
            {"subj": subjs, "pred": ["p"] * len(subjs),
             "obj": ["o"] * len(subjs), "doc_id": [doc] * len(subjs)}
        )
        return rd.from_pandas(df), df

    base_ds, base_df = mk([f"s{i}" for i in range(20)], "dA")
    write_partitioned(base_ds, out, **kw)
    d1, _ = mk([f"s{i}" for i in range(10, 30)], "dB")  # overlap + new keys
    update_partitioned(d1, out, **kw)
    d2, _ = mk([f"s{i}" for i in range(25, 40)], "dC")
    update_partitioned(d2, out, **kw)

    def subjects(version):
        return set(
            read_store_asof(out, version=version, columns=["subj"])
            .to_pandas()["subj"]
        )

    assert subjects(0) == {f"s{i}" for i in range(20)}
    assert subjects(1) == {f"s{i}" for i in range(30)}
    assert subjects(2) == {f"s{i}" for i in range(40)}
    assert subjects(None) == subjects(2)
    # version 0 rows keep their original lineage (dedup kept dA rows)
    v1 = read_store_asof(out, version=1).to_pandas()
    assert set(v1[v1["subj"] == "s10"]["doc_id"]) == {"dA"}
    with pytest.raises(ValueError):
        read_store_asof(str(tmp_path / "absent"))


def test_vacuum_store_retention(ray_session, tmp_path):
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        update_partitioned,
        vacuum_store,
        write_partitioned,
    )

    kw = dict(num_partitions=2, config_hash="cfgV", key="subj",
              dedup_keys=["subj"], dedup_order=["doc_id"])
    out = str(tmp_path / "vac")

    def mk(subjs, doc):
        return rd.from_pandas(pd.DataFrame(
            {"subj": subjs, "doc_id": [doc] * len(subjs)}))

    write_partitioned(mk([f"s{i}" for i in range(8)], "dA"), out, **kw)
    update_partitioned(mk([f"s{i}" for i in range(8, 12)], "dB"), out, **kw)
    update_partitioned(mk([f"s{i}" for i in range(12, 16)], "dC"), out, **kw)

    removed = vacuum_store(out, keep_versions=1)
    assert removed  # something older than the newest preserved version went
    # newest time-travel point survives; older ones are gone
    assert len(read_store_asof(out, version=1).to_pandas()) == 12
    import pytest

    # a vacuumed version RAISES rather than silently returning partial data
    with pytest.raises(ValueError, match="vacuum"):
        read_store_asof(out, version=0)
    with pytest.raises(ValueError):
        vacuum_store(out, keep_versions=-1)


def test_update_retry_short_circuits(ray_session, tmp_path):
    """Task-retry idempotency: re-applying an update whose merge already
    landed at the SAME target version (lineage append lost, e.g. crash
    between rename and lineage write) must short-circuit -- no spurious
    data@{v} preservation, no inflated 'added' counts."""
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        update_partitioned,
        write_partitioned,
    )

    def mk(lo, hi, doc):
        df = pd.DataFrame(
            {
                "subj": [f"s{i % 40}" for i in range(lo, hi)],
                "pred": ["p"] * (hi - lo),
                "obj": [f"o{i % 60}" for i in range(lo, hi)],
                "doc_id": [doc] * (hi - lo),
            }
        )
        return rd.from_pandas(df)

    kw = dict(num_partitions=8, config_hash="cfgR", key="subj",
              dedup_keys=["subj", "pred", "obj"], dedup_order=["doc_id"])
    out = str(tmp_path / "store")
    write_partitioned(mk(0, 80, "dA"), out, **kw)
    update_partitioned(mk(40, 120, "dB"), out, **kw)

    before = _read_all(out)
    preserved_before = {
        name: sorted(f for f in os.listdir(os.path.join(out, name)) if f.startswith("data@"))
        for name in os.listdir(out) if name.startswith("part=")
    }

    # simulate the crash: drop the lineage record of the completed update
    lpath = os.path.join(out, "_lineage.json")
    lin = json.load(open(lpath))
    lin["updates"] = lin["updates"][:-1]
    json.dump(lin, open(lpath, "w"))

    # the "retry": same delta, recomputed new_version == manifest version
    again = update_partitioned(mk(40, 120, "dB"), out, **kw)
    assert all(a == 0 for a in again["added"].values())
    after = _read_all(out)
    cols = ["subj", "pred", "obj", "doc_id"]
    pd.testing.assert_frame_equal(
        before[cols].sort_values(cols).reset_index(drop=True),
        after[cols].sort_values(cols).reset_index(drop=True),
    )
    preserved_after = {
        name: sorted(f for f in os.listdir(os.path.join(out, name)) if f.startswith("data@"))
        for name in os.listdir(out) if name.startswith("part=")
    }
    assert preserved_before == preserved_after  # no spurious data@v files


def test_resumed_fill_in_stamps_current_version(ray_session, tmp_path):
    """A partition first written AFTER the store accumulated updates is
    stamped at the CURRENT store version, so as-of reads of older
    versions exclude it instead of silently including later data."""
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        update_partitioned,
        write_partitioned,
    )

    def mk(rows, doc):
        df = pd.DataFrame(
            {
                "subj": [f"s{i}" for i in rows],
                "pred": ["p"] * len(rows),
                "obj": [f"o{i}" for i in rows],
                "doc_id": [doc] * len(rows),
            }
        )
        return rd.from_pandas(df)

    kw = dict(num_partitions=4, config_hash="cfgV", key="subj",
              dedup_keys=["subj", "pred", "obj"], dedup_order=["doc_id"])
    out = str(tmp_path / "store")
    write_partitioned(mk(range(40), "dA"), out, **kw)   # version 0
    update_partitioned(mk(range(40, 60), "dB"), out, **kw)  # version 1
    v0_rows = len(read_store_asof(out, version=0).to_pandas())

    # simulate a lost partition dir, then a resumed fill-in write
    victim = sorted(n for n in os.listdir(out) if n.startswith("part="))[0]
    shutil.rmtree(os.path.join(out, victim))
    write_partitioned(mk(range(60), "dC"), out, **kw)  # resume fills victim only

    m = json.load(open(os.path.join(out, victim, "_manifest.json")))
    assert m["version"] == 1 and m["created_version"] == 1
    # as-of 0 treats the refilled partition as BORN at version 1 (a
    # resumed partition was never DONE at v0), so it contributes nothing
    # to v0 -- in particular none of the post-update dC rows leak back
    v0_after = read_store_asof(out, version=0).to_pandas()
    assert len(v0_after) < v0_rows  # victim's rows gone from v0 ...
    assert "dC" not in set(v0_after["doc_id"])  # ... and no later data leaked
    # the current version serves the refilled partition
    cur = read_store_asof(out).to_pandas()
    assert "dC" in set(cur["doc_id"])


def test_update_empty_delta_is_noop(ray_session, tmp_path):
    """A zero-row delta returns a no-op summary WITHOUT advancing the
    store version (an empty appended update would shift as-of reads)."""
    import json

    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        update_partitioned,
        write_partitioned,
    )

    base = pd.DataFrame(
        {"subj": [f"s{i}" for i in range(20)], "obj": [f"o{i}" for i in range(20)]}
    )
    out = str(tmp_path / "store")
    write_partitioned(
        rd.from_pandas(base), out, num_partitions=4, config_hash="h",
        dedup_keys=["subj"], dedup_order=["obj"],
    )
    empty = rd.from_pandas(base.iloc[:0])
    summary = update_partitioned(
        empty, out, num_partitions=4, config_hash="h",
        dedup_keys=["subj"], dedup_order=["obj"],
    )
    assert summary["updated"] == {} and summary["added"] == {}
    lin = json.load(open(os.path.join(out, "_lineage.json")))
    assert lin.get("updates", []) == []  # version NOT advanced
    assert len(read_store_asof(out).to_pandas()) == 20


def test_crash_mid_swap_recovers_without_data_loss(ray_session, tmp_path):
    """Simulate a crash between the two renames of the partition swap
    (live dir missing, .old aside holding the pre-merge data, .tmp
    holding the merged data): re-applying the delta must restore and
    re-merge, losing nothing -- the exact window where the old
    rmtree-then-rename destroyed the partition's history."""
    import shutil

    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        update_partitioned,
        write_partitioned,
    )

    base = pd.DataFrame(
        {"subj": [f"s{i}" for i in range(20)], "obj": [f"o{i}" for i in range(20)]}
    )
    out = str(tmp_path / "store")
    write_partitioned(
        rd.from_pandas(base), out, num_partitions=2, config_hash="h",
        dedup_keys=["subj"], dedup_order=["obj"],
    )
    delta = pd.DataFrame({"subj": ["zz1", "zz2"], "obj": ["a", "a"]})
    update_partitioned(
        rd.from_pandas(delta), out, num_partitions=2, config_hash="h",
        dedup_keys=["subj"], dedup_order=["obj"],
    )
    want = read_store_asof(out).to_pandas().sort_values("subj").reset_index(drop=True)

    # manufacture the mid-swap crash state on one touched partition:
    # live -> .old (as the first rename did), a stale .tmp left behind
    pdirs = [d for d in os.listdir(out) if d.startswith("part=") and "." not in d]
    victim = os.path.join(out, pdirs[0])
    shutil.copytree(victim, victim + ".tmp")  # the merged-but-unrenamed tmp
    os.rename(victim, victim + ".old")
    assert not os.path.isdir(victim)

    # re-applying the same delta heals the partition (idempotent merge)
    update_partitioned(
        rd.from_pandas(delta), out, num_partitions=2, config_hash="h",
        dedup_keys=["subj"], dedup_order=["obj"],
    )
    got = read_store_asof(out).to_pandas().sort_values("subj").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert not os.path.isdir(victim + ".old")


def test_update_rejects_different_delta_after_crashed_update(ray_session, tmp_path):
    """A partition stamped at version N by a crashed update (manifest
    written, lineage append lost) must REJECT a different delta at the
    same version -- silently short-circuiting would drop its rows -- while
    re-applying the IDENTICAL delta still short-circuits (idempotence)."""
    import json as _json

    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        update_partitioned,
        write_partitioned,
    )

    def mk(subjs, doc):
        df = pd.DataFrame(
            {"subj": subjs, "pred": ["p"] * len(subjs),
             "obj": ["o"] * len(subjs), "doc_id": [doc] * len(subjs)}
        )
        return rd.from_pandas(df)

    kw = dict(num_partitions=2, config_hash="cfgX", key="subj",
              dedup_keys=["subj", "pred", "obj"], dedup_order=["doc_id"])
    out = str(tmp_path / "store")
    write_partitioned(mk([f"s{i}" for i in range(20)], "d0"), out, **kw)

    # apply delta A, then simulate the crash: erase the lineage append so
    # the store version count rolls back while manifests stay stamped
    update_partitioned(mk([f"t{i}" for i in range(20)], "dA"), out, **kw)
    lpath = os.path.join(out, "_lineage.json")
    lin = _json.load(open(lpath))
    lin["updates"] = []
    _json.dump(lin, open(lpath, "w"))

    # DIFFERENT delta B at the same version: loud error, never silent loss
    with pytest.raises(Exception, match="DIFFERENT delta"):
        update_partitioned(mk([f"u{i}" for i in range(20)], "dB"), out, **kw)

    # identical delta A re-applied: idempotent no-op (rows added == 0)
    # that completes the crashed update's missing lineage append...
    again = update_partitioned(mk([f"t{i}" for i in range(20)], "dA"), out, **kw)
    assert sum(again["added"].values()) == 0

    # ...after which delta B merges normally at the NEXT version
    ok = update_partitioned(mk([f"u{i}" for i in range(20)], "dB"), out, **kw)
    assert sum(ok["added"].values()) == 20


def test_overwrite_sweeps_other_config_partitions(ray_session, tmp_path):
    """An overwrite rebuild under a NEW config must also empty partitions
    written under the OLD config (read_store_asof reads every DONE
    partition regardless of config, so leftovers would be double-served)."""
    import ray.data as rd

    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        write_partitioned,
    )

    def mk(subjs, doc):
        return rd.from_pandas(
            pd.DataFrame(
                {"subj": subjs, "pred": ["p"] * len(subjs),
                 "obj": ["o"] * len(subjs), "doc_id": [doc] * len(subjs)}
            )
        )

    out = str(tmp_path / "store")
    # config A: rows spread over many subjects -> many partitions hold data
    write_partitioned(mk([f"s{i}" for i in range(40)], "dA"), out,
                      num_partitions=8, config_hash="cfgA",
                      dedup_keys=["subj", "pred", "obj"], dedup_order=["doc_id"])
    # overwrite under config B with rows hashing to FEW partitions
    write_partitioned(mk(["s0", "s0", "s1"], "dB"), out,
                      num_partitions=8, config_hash="cfgB", overwrite=True,
                      dedup_keys=["subj", "pred", "obj"], dedup_order=["doc_id"])
    latest = read_store_asof(out, version=None,
                             columns=["subj", "pred", "obj", "doc_id"]).to_pandas()
    # ONLY config-B rows survive; config-A leftovers must be swept
    assert set(latest["doc_id"]) == {"dB"}
    assert len(latest) == 2  # s0 deduped


def test_read_store_entity_pruned_lookup(ray_session, tmp_path):
    """Point dereference agrees with the full read for EVERY subject
    (pinning the partition-hash round trip, incl. the uint64-scalar
    modulo trap), honors time travel, and returns an empty typed frame
    for unknown keys."""
    from ontology_time_machine_ray.sources.writers import (
        read_store_asof,
        read_store_entity,
        update_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "store")
    ds, df = _toy_ds()
    write_partitioned(ds, out, num_partitions=8, config_hash="cfg1")

    full = read_store_asof(out).to_pandas()
    for subj in df["subj"]:
        got = read_store_entity(out, subj)
        want = full[full["subj"] == subj]
        assert len(got) == 1
        assert got.iloc[0]["obj"] == want.iloc[0]["obj"], subj

    # unknown key: empty frame, requested columns materialized
    miss = read_store_entity(out, "nope", columns=["subj", "obj"])
    assert len(miss) == 0 and miss.columns.tolist() == ["subj", "obj"]

    # time travel: a subject merged in by an update is visible now but
    # NOT at version 0, via the SAME pruned path
    import ray.data as rd

    delta = rd.from_pandas(
        pd.DataFrame({"subj": ["s-new"], "pred": ["p"], "obj": ["o-new"]})
    )
    update_partitioned(
        delta, out, num_partitions=8, config_hash="cfg1",
        dedup_keys=["subj", "pred"], dedup_order=["obj"],
    )
    now = read_store_entity(out, "s-new")
    assert now["obj"].tolist() == ["o-new"]
    base = read_store_entity(out, "s-new", version=0, columns=["subj", "obj"])
    assert len(base) == 0
    # pre-existing subjects unchanged at both versions
    assert read_store_entity(out, "s3")["obj"].tolist() == ["o3"]
    assert read_store_entity(out, "s3", version=0)["obj"].tolist() == ["o3"]


def test_update_fast_path_matches_distributed(ray_session, tmp_path, monkeypatch):
    """The small-delta driver-grouped fast path and the sort-based
    distributed path must produce byte-identical stores (rows, manifests'
    versions, added counts) -- the guard only changes the exchange plan."""
    import ray.data as rd

    from ontology_time_machine_ray.sources import writers

    def mk(lo, hi, doc):
        df = pd.DataFrame(
            {
                "subj": [f"s{i % 40}" for i in range(lo, hi)],
                "pred": ["p"] * (hi - lo),
                "obj": [f"o{i % 60}" for i in range(lo, hi)],
                "doc_id": [doc] * (hi - lo),
            }
        )
        return rd.from_pandas(df), df

    kw = dict(
        num_partitions=8,
        config_hash="cfgF",
        key="subj",
        dedup_keys=["subj", "pred", "obj"],
        dedup_order=["doc_id"],
    )
    outs, summaries = [], []
    for limit in (None, 0):  # None = default fast path; 0 = forced distributed
        out = str(tmp_path / f"store_{limit}")
        base_ds, _ = mk(0, 80, "dA")
        writers.write_partitioned(base_ds, out, **kw)
        if limit is not None:
            monkeypatch.setattr(writers, "SMALL_DELTA_ROWS", limit)
        delta_ds, _ = mk(40, 120, "dB")
        summaries.append(writers.update_partitioned(delta_ds, out, **kw))
        outs.append(out)

    cols = ["subj", "pred", "obj", "doc_id"]
    a = _read_all(outs[0])[cols].sort_values(cols).reset_index(drop=True)
    b = _read_all(outs[1])[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert summaries[0]["updated"] == summaries[1]["updated"]
    assert summaries[0]["added"] == summaries[1]["added"]
    # both paths stamp the same store version and write_digest per partition
    for part in summaries[0]["updated"]:
        ma = json.load(open(os.path.join(outs[0], f"part={part:05d}", "_manifest.json")))
        mb = json.load(open(os.path.join(outs[1], f"part={part:05d}", "_manifest.json")))
        assert ma["version"] == mb["version"] == 1
        assert ma["write_digest"] == mb["write_digest"]
