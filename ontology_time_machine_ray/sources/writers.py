"""Resumable partitioned materialization with per-partition lineage.

The output triple store is laid out as one directory per hash partition
(``partition = stable_hash(subj) % P``), each holding its Parquet data plus
a ``_manifest.json`` recording row counts, the config hash and a DONE
marker.  A resumed run skips partitions whose manifest is complete -- the
engine analog of the reference's sha256 hash-skip on the index download
(``download_archivo_urls.py:41-46,65-74``, O3) and the checkpoint/lineage
requirement of ``north_rule``.  Writes are atomic: data lands in
``<part>.tmp`` and is renamed into place before the manifest is written,
so a killed run never leaves a partition that looks complete.

Lance note: the target store format at scale is Lance
(``Dataset.write_lance``); the ``lance`` module is not available in this
container, so the writer emits Parquet with the identical layout and flips
to Lance when importable.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd

from ontology_time_machine_ray.functions.hashing import stable_hash64_series

try:  # pragma: no cover - lance not shipped in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

#: Deltas at or below this row count merge via the driver-grouped fast
#: path (one bounded bounce + one task per touched partition) instead of
#: the sort-based groupby, whose two fixed all-to-all barriers dominate
#: small updates.  Same guarded-bounce family as canonicalize's
#: MAX_BROADCAST_NODES; overridable for bigger driver heaps.
SMALL_DELTA_ROWS = int(os.environ.get("OTM_SMALL_DELTA_ROWS", "2000000"))


def add_partition_column(df: pd.DataFrame, num_partitions: int, key: str = "subj") -> pd.DataFrame:
    part = (stable_hash64_series(df[key]) % num_partitions).astype("int32")
    return df.assign(partition=part)


def _swap_partition_dir(tmp: str, pdir: str) -> None:
    """Replace ``pdir`` with ``tmp`` WITHOUT a destructive window: the
    old directory is renamed aside before the new one lands, so at every
    instant at least one complete copy of the partition exists on disk.
    (The previous rmtree-then-rename had a crash window in which the
    merged data lived only in the .tmp dir -- and the retry path's
    .tmp cleanup would then delete the sole surviving copy.)  A crash
    mid-swap is healed by ``_recover_partition`` at the next write."""
    old = pdir + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(pdir):
        os.rename(pdir, old)
    os.rename(tmp, pdir)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _recover_partition(pdir: str) -> None:
    """Heal a partition directory after a crash mid-swap: if the live dir
    is missing but the .old aside exists, restore it (the re-applied
    delta/write then reproduces the merge -- updates are idempotent); if
    both exist the swap completed, sweep the leftover."""
    old = pdir + ".old"
    if os.path.isdir(old):
        if os.path.isdir(pdir):
            shutil.rmtree(old)
        else:
            os.rename(old, pdir)


def _recover_store(out_dir: str) -> None:
    """Heal every partition left mid-swap by a crashed writer: one
    driver-side directory listing (P entries, vocabulary-scale) at the
    start of each write/update, so a crashed swap on a partition the
    NEXT delta does not touch is still restored."""
    if not os.path.isdir(out_dir):
        return
    for name in os.listdir(out_dir):
        if name.startswith("part=") and name.endswith(".old"):
            _recover_partition(os.path.join(out_dir, name[: -len(".old")]))


def _manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}", "_manifest.json")


def _link_or_copy(src: str, dst: str) -> None:
    """Hardlink (no data copy; preserved files are immutable so shared
    inodes are safe), falling back to a copy on filesystems without link
    support."""
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _preserve_versions(pdir: str, tmp: str, old_version: int) -> None:
    """Copy-on-write preservation into the staging dir: the superseded
    ``data.parquet`` is linked in as ``data@{old_version}.parquet`` and
    every previously preserved ``data@`` file is carried forward
    (``read_store_asof`` picks the newest preserved file <= the requested
    version).  The ONE implementation shared by overwrite rewrites,
    incremental merges, and the stale-partition sweep."""
    if not os.path.isdir(pdir):
        return
    old_data = os.path.join(pdir, "data.parquet")
    tagged = os.path.join(tmp, f"data@{old_version}.parquet")
    if os.path.exists(old_data) and not os.path.exists(tagged):
        _link_or_copy(old_data, tagged)
    for name in os.listdir(pdir):
        if name.startswith("data@") and not os.path.exists(os.path.join(tmp, name)):
            _link_or_copy(os.path.join(pdir, name), os.path.join(tmp, name))


def _finalize_partition(tmp: str, pdir: str, manifest: dict) -> None:
    """Write the manifest INTO the staging dir, then swap atomically: a
    swapped-in partition is always manifest-complete.  Writing the
    manifest into the live dir after the swap had a crash window that
    left a DONE-looking dir with no (or truncated) manifest -- a retried
    overwrite would then preserve the just-written file as version-0
    history, and every later read/update would crash on the JSON."""
    with open(os.path.join(tmp, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    _swap_partition_dir(tmp, pdir)


def _group_digest(g) -> str:
    """Order-insensitive content digest of a group's rows (uint64 row
    hashes summed mod 2^64): deterministic across processes and row
    order, so a Ray task RETRY of the same write/delta reproduces it
    while a DIFFERENT delta at the same store version cannot."""
    import pandas as pd

    return str(int(pd.util.hash_pandas_object(g, index=False).sum()))


def _all_done_partitions(out_dir: str) -> set[int]:
    """Every DONE partition on disk regardless of config/layout: the
    overwrite stale sweep must replace partitions written under ANY
    previous config, or their rows would survive the rebuild and be
    served alongside the rewritten copies."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part=") or name.endswith((".tmp", ".old")):
            continue
        mpath = os.path.join(out_dir, name, "_manifest.json")
        if os.path.exists(mpath):
            try:
                m = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                continue
            if m.get("status") == "DONE":
                done.add(int(m["partition"]))
    return done


def completed_partitions(
    out_dir: str, config_hash: str, num_partitions: int | None = None,
    key: str | None = None,
) -> set[int]:
    """DONE partitions whose manifest matches config hash AND layout.

    A partition written under a different ``num_partitions`` or partition
    ``key`` belongs to a DIFFERENT hash layout -- resuming over it would
    silently mix layouts (duplicated/missing rows per partition), so a
    layout mismatch is treated as not-DONE."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part=") or name.endswith((".tmp", ".old")):
            continue
        mpath = os.path.join(out_dir, name, "_manifest.json")
        if os.path.exists(mpath):
            try:
                m = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                continue
            if m.get("status") != "DONE" or m.get("config_hash") != config_hash:
                continue
            if num_partitions is not None and m.get("num_partitions") != num_partitions:
                continue
            if key is not None and m.get("partition_key") != key:
                continue
            done.add(int(name.split("=")[1]))
    return done


def write_partitioned(
    ds,
    out_dir: str,
    num_partitions: int,
    config_hash: str,
    key: str = "subj",
    dedup_keys: list[str] | None = None,
    dedup_order: list[str] | None = None,
    inputs: list[str] | None = None,
    overwrite: bool = False,
) -> dict:
    """Materialize a Dataset into the partitioned layout, skipping
    partitions already complete for the same config (resume semantics).

    When ``dedup_keys`` is given, each partition drops duplicate keys
    (first row after sorting by ``dedup_keys + dedup_order``) before
    writing -- the dedup rides the partitioning shuffle for free, which is
    correct whenever ``key`` is one of ``dedup_keys`` (all duplicates of a
    key share its hash partition).

    ``overwrite=True`` REPLACES the content of every written partition
    (no resume skip) while keeping time travel intact: the superseded
    file is preserved copy-on-write like ``update_partitioned`` and the
    store version advances.  Used by the incremental CANONICAL update,
    whose component merges rewrite rows in place.

    Returns a summary lineage dict (also written to ``_lineage.json``).
    """
    if dedup_keys is not None:
        assert key in dedup_keys, "fused dedup requires the partition key in dedup_keys"
    os.makedirs(out_dir, exist_ok=True)
    _recover_store(out_dir)
    done = set() if overwrite else completed_partitions(
        out_dir, config_hash, num_partitions, key
    )
    lpath0 = os.path.join(out_dir, "_lineage.json")
    lin0 = json.load(open(lpath0)) if os.path.exists(lpath0) else {}
    # current store version = number of lineage updates; an overwrite
    # advances it, a resumed fill-in write stamps new partitions AT the
    # current version (never 0 -- a partition first written after N
    # updates must not be visible to as-of reads of versions < N)
    store_version = len(lin0.get("updates", []))
    new_version = store_version + 1 if overwrite else store_version

    with_part = ds.map_batches(
        lambda df: add_partition_column(df, num_partitions, key),
        batch_format="pandas",
    )
    if done:
        keep = set(range(num_partitions)) - done
        with_part = with_part.map_batches(
            lambda df: df[df["partition"].isin(keep)], batch_format="pandas"
        )

    summary = {"partitions": {}, "config_hash": config_hash, "inputs": inputs or []}
    # one shuffle groups each partition's rows; each group writes its own
    # directory atomically and returns one lineage row
    def _write_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["partition"].iloc[0])
        digest = _group_digest(g.drop(columns=["partition"]))
        pdir = os.path.join(out_dir, f"part={part:05d}")
        _recover_partition(pdir)
        mpath_pre = os.path.join(pdir, "_manifest.json")
        if overwrite and os.path.exists(mpath_pre):
            m_prev = json.load(open(mpath_pre))
            if int(m_prev.get("version", -1)) == new_version:
                if m_prev.get("write_digest") == digest:
                    # Ray task retry after a completed-but-unreported
                    # write: the swap already landed at this version with
                    # THIS content.  Re-writing would preserve the
                    # just-written file as a spurious
                    # data@{new_version}.parquet -- short-circuit.
                    return pd.DataFrame(
                        {"partition": [part], "rows": [int(m_prev.get("rows", 0))]}
                    )
                raise RuntimeError(
                    f"partition {part} is already stamped at version "
                    f"{new_version} by a DIFFERENT write (crashed run with "
                    "other content?) -- finish/re-run that write, or remove "
                    "the store and rebuild"
                )
        if dedup_keys is not None:
            g = g.sort_values(dedup_keys + (dedup_order or []), kind="stable").drop_duplicates(
                dedup_keys, keep="first"
            )
        tmp = pdir + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        g.drop(columns=["partition"]).to_parquet(os.path.join(tmp, "data.parquet"), index=False)
        created_version = new_version
        if overwrite and os.path.isdir(pdir):
            # copy-on-write replacement: preserve the superseded file and
            # carry forward older preserved versions (same contract as
            # update_partitioned._merge_group)
            mpath0 = os.path.join(pdir, "_manifest.json")
            old_version = 0
            if os.path.exists(mpath0):
                m_old = json.load(open(mpath0))
                old_version = int(m_old.get("version", 0))
                created_version = int(m_old.get("created_version", 0))
            _preserve_versions(pdir, tmp, old_version)
        manifest = {
            "status": "DONE",
            "partition": part,
            "rows": int(len(g)),
            "config_hash": config_hash,
            "num_partitions": num_partitions,
            "partition_key": key,
            "version": new_version,
            "created_version": created_version,
            "write_digest": digest,
        }
        _finalize_partition(tmp, pdir, manifest)
        return pd.DataFrame({"partition": [part], "rows": [len(g)]})

    lineage = (
        with_part.groupby("partition")
        .map_groups(_write_group, batch_format="pandas")
        .to_pandas()
    )
    for part, rows in lineage.itertuples(index=False):
        summary["partitions"][int(part)] = int(rows)
    summary["skipped"] = sorted(done)
    if overwrite:
        # a partition that received no group this run -- every row moved
        # elsewhere, OR it was written under a DIFFERENT config/layout
        # (read_store_asof reads every DONE partition regardless of
        # config, so other-config leftovers would be served as
        # duplicates) -- must be REPLACED by an empty partition at the
        # new version
        written = set(summary["partitions"])
        stale = _all_done_partitions(out_dir) - written
        for part in stale:
            pdir = os.path.join(out_dir, f"part={part:05d}")
            old_data = os.path.join(pdir, "data.parquet")
            m_old = json.load(open(_manifest_path(out_dir, part)))
            import pyarrow.parquet as _pq

            schema = _pq.read_schema(old_data)
            tmp = pdir + ".tmp"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
            _pq.write_table(schema.empty_table(), os.path.join(tmp, "data.parquet"))
            _preserve_versions(pdir, tmp, int(m_old.get("version", 0)))
            # stamped with the NEW config/layout: the emptied partition IS
            # part of the rebuilt store (0 rows)
            _finalize_partition(
                tmp,
                pdir,
                dict(
                    m_old, rows=0, version=new_version, config_hash=config_hash,
                    num_partitions=num_partitions, partition_key=key,
                ),
            )
            summary["partitions"][int(part)] = 0
    lpath = os.path.join(out_dir, "_lineage.json")
    if os.path.exists(lpath):
        # NO rewrite may erase update history: version numbering is
        # derived from the "updates" list, and manifests were just
        # stamped with versions computed FROM it -- dropping it here
        # (e.g. on a config-changed rebuild) would make the next
        # update's new_version collide with the stamped version and trip
        # the task-retry short-circuit into silently discarding the delta
        prev = json.load(open(lpath))
        if prev.get("updates"):
            summary["updates"] = prev["updates"]
    if overwrite:
        summary.setdefault("updates", []).append(
            {"overwrite": True, "partitions": sorted(summary["partitions"])}
        )
    with open(lpath, "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def update_partitioned(
    delta_ds,
    out_dir: str,
    num_partitions: int,
    config_hash: str,
    key: str = "subj",
    dedup_keys: list[str] | None = None,
    dedup_order: list[str] | None = None,
) -> dict:
    """Incrementally merge a DELTA of rows into an existing partitioned
    store: only partitions the delta hashes into are read, merged,
    deduped and atomically rewritten -- cost is proportional to the delta
    plus the touched partitions, never the store.

    Correctness contract: because per-key dedup keeps the minimum by
    ``dedup_keys + dedup_order`` and the existing partition already holds
    its per-key minimum, concat + dedup yields exactly the store a full
    rebuild over (old corpus + delta corpus) would produce.  The same
    argument makes updates IDEMPOTENT: re-applying a delta (e.g. after a
    mid-update crash) is a no-op, so the operation needs no separate
    resume machinery.

    The delta must be produced under the SAME config and hash layout as
    the store; a mismatch raises instead of silently mixing layouts.
    """
    if dedup_keys is None or key not in dedup_keys:
        raise ValueError("incremental merge requires the partition key in dedup_keys")
    _recover_store(out_dir)
    done = completed_partitions(out_dir, config_hash, num_partitions, key)
    if not done:
        raise ValueError(
            f"{out_dir} has no DONE partitions for config {config_hash} / "
            f"P={num_partitions} / key={key} -- build the store first "
            "(write_partitioned) or fix the config/layout mismatch"
        )

    with_part = delta_ds.map_batches(
        lambda df: add_partition_column(df, num_partitions, key),
        batch_format="pandas",
    )

    order = dedup_order or []

    # store version this update produces: one past the number of updates
    # already recorded in the lineage (initial build = version 0)
    lpath = os.path.join(out_dir, "_lineage.json")
    lin0 = json.load(open(lpath)) if os.path.exists(lpath) else {}
    new_version = len(lin0.get("updates", [])) + 1

    def _merge_group(g: pd.DataFrame) -> pd.DataFrame:
        # The small-delta fast path feeds this one per-partition frame per
        # batch (from_pandas keeps one block per frame on Ray 2.49.2 and
        # batch_size=None batches never span blocks).  That layout is a Ray
        # internals property, not a contract -- fail loudly if a future
        # version coalesces blocks, instead of merging rows into the wrong
        # partition file.
        assert g["partition"].nunique() == 1, (
            "merge batch spans partitions "
            f"{sorted(g['partition'].unique().tolist())} -- Ray block "
            "layout changed; route the delta through the grouped path"
        )
        part = int(g["partition"].iloc[0])
        g = g.drop(columns=["partition"])
        digest = _group_digest(g)
        pdir = os.path.join(out_dir, f"part={part:05d}")
        _recover_partition(pdir)
        mpath_pre = os.path.join(pdir, "_manifest.json")
        if os.path.exists(mpath_pre):
            m_prev = json.load(open(mpath_pre))
            if int(m_prev.get("version", -1)) == new_version:
                if m_prev.get("write_digest") == digest:
                    # Ray task retry (or an identical re-applied delta)
                    # after a completed-but-unreported merge: re-merging
                    # would preserve a spurious data@{new_version}.parquet
                    # and double-count 'added' -- return the recorded
                    # result.
                    return pd.DataFrame(
                        {"partition": [part],
                         "rows": [int(m_prev.get("rows", 0))],
                         "added": [0]}
                    )
                raise RuntimeError(
                    f"partition {part} is already stamped at version "
                    f"{new_version} by a DIFFERENT delta (a previous update "
                    "crashed before recording its lineage?) -- re-apply "
                    "that original delta to completion first, or rebuild "
                    "the store; merging this delta here would silently "
                    "drop its rows"
                )
        old_path = os.path.join(pdir, "data.parquet")
        n_old = 0
        old_version = 0
        created_version = new_version  # partition born in this update
        if os.path.exists(old_path):
            old = pd.read_parquet(old_path)
            n_old = len(old)
            g = pd.concat([old, g], ignore_index=True)
            mpath = os.path.join(pdir, "_manifest.json")
            if os.path.exists(mpath):
                m_old = json.load(open(mpath))
                old_version = int(m_old.get("version", 0))
                created_version = int(m_old.get("created_version", 0))
        g = g.sort_values(dedup_keys + order, kind="stable").drop_duplicates(
            dedup_keys, keep="first"
        )
        tmp = pdir + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        g.to_parquet(os.path.join(tmp, "data.parquet"), index=False)
        # copy-on-write time travel: preserve the superseded file tagged
        # with the store version it was written at, and carry forward any
        # previously preserved versions
        _preserve_versions(pdir, tmp, old_version)
        manifest = {
            "status": "DONE",
            "partition": part,
            "rows": int(len(g)),
            "config_hash": config_hash,
            "num_partitions": num_partitions,
            "partition_key": key,
            "version": new_version,
            "created_version": created_version,
            "write_digest": digest,
        }
        _finalize_partition(tmp, pdir, manifest)
        return pd.DataFrame(
            {"partition": [part], "rows": [len(g)], "added": [len(g) - n_old]}
        )

    # The delta is pinned ONCE here (detect+link executes exactly once)
    # and its size read from block metadata; the sort-based groupby below
    # would materialize it internally anyway, so the pin adds no memory
    # round over the large path.
    with_part = with_part.materialize()
    n_delta = with_part.count()
    if n_delta <= SMALL_DELTA_ROWS:
        # Small-delta fast path: the sort-based groupby costs two fixed
        # all-to-all barriers (sample + range exchange) that dominate
        # sub-second deltas (measured ~1.7 s flat at any delta size).
        # Below the guard, one bounded driver bounce groups the delta and
        # each touched partition becomes ONE block, merged by a plain
        # task-pool map -- same _merge_group, same order-insensitive
        # digest, so retries and idempotent re-application behave
        # identically to the distributed path.
        delta_df = with_part.to_pandas()
        # an empty materialized dataset round-trips to a column-less
        # frame, which groupby("partition") would KeyError on
        groups = (
            []
            if delta_df.empty
            else [g for _, g in delta_df.groupby("partition", sort=True)]
        )
        if groups:
            import ray.data as rd

            lineage = (
                rd.from_pandas(groups)
                .map_batches(_merge_group, batch_format="pandas", batch_size=None)
                .to_pandas()
            )
        else:
            lineage = pd.DataFrame(
                {"partition": pd.Series(dtype="int64"),
                 "rows": pd.Series(dtype="int64"),
                 "added": pd.Series(dtype="int64")}
            )
    else:
        lineage = (
            with_part.groupby("partition")
            .map_groups(_merge_group, batch_format="pandas")
            .to_pandas()
        )
    if lineage.empty:
        # empty delta: a no-op that must NOT advance the store version
        # (an appended empty update would shift every later as-of read)
        return {
            "updated": {},
            "added": {},
            "untouched": sorted(done),
            "config_hash": config_hash,
        }
    summary = {
        "updated": {int(p): int(r) for p, r, _ in lineage.itertuples(index=False)},
        "added": {int(p): int(a) for p, _, a in lineage.itertuples(index=False)},
        "untouched": sorted(done - set(int(p) for p in lineage["partition"])),
        "config_hash": config_hash,
    }
    lpath = os.path.join(out_dir, "_lineage.json")
    lin = json.load(open(lpath)) if os.path.exists(lpath) else {}
    lin.setdefault("updates", []).append(
        {"partitions": sorted(summary["updated"]),
         "rows_added": int(sum(summary["added"].values()))}
    )
    for p, r in summary["updated"].items():
        lin.setdefault("partitions", {})[str(p)] = r
    with open(lpath, "w") as f:
        json.dump(lin, f, indent=1)
    return summary


def _partition_file_asof(pdir: str, version: int | None) -> str | None:
    """Newest data file of ONE partition visible at ``version`` (None =
    current); None when the partition contributes nothing (no DONE
    manifest, or first created after ``version``); raises when the
    requested version was vacuumed away (partial data is never returned
    silently).  Pure per-partition local metadata -- the unit both the
    full time-travel scan and the pruned point lookup resolve with."""
    mpath = os.path.join(pdir, "_manifest.json")
    if not os.path.exists(mpath):
        return None
    m = json.load(open(mpath))
    if m.get("status") != "DONE":
        return None
    if version is None or int(m.get("version", 0)) <= version:
        return os.path.join(pdir, "data.parquet")
    best = -1
    for f in os.listdir(pdir):
        if f.startswith("data@") and f.endswith(".parquet"):
            v = int(f[len("data@"):-len(".parquet")])
            if v <= version and v > best:
                best = v
    if best >= 0:
        return os.path.join(pdir, f"data@{best}.parquet")
    if int(m.get("created_version", 0)) <= version:
        raise ValueError(
            f"{pdir}: version {version} no longer available "
            "(removed by vacuum_store)"
        )
    return None  # partition first created after `version`


def read_store_entity(
    out_dir: str,
    value: str,
    key: str = "subj",
    version: int | None = None,
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Partition-pruned point dereference (the serving path): the key's
    stable hash names its partition directory, so the lookup resolves
    and scans exactly ONE ``part=NNNNN`` file -- O(store/P) I/O instead
    of a store scan, the dividend the hash layout exists to pay.  The
    partition count comes from the store's own manifests (any DONE
    manifest records it; ``done_partitions`` enforces they agree), and
    the per-partition version resolution is the same time-travel logic
    as ``read_store_asof``.  A single file is a driver-side pyarrow
    read, not a Ray job -- this is the low-latency lookup a serving
    layer issues, and at 10^12 docs it still touches one file."""
    if not os.path.isdir(out_dir):
        raise ValueError(f"{out_dir} is not a store directory")
    num_partitions = None
    done_part = None
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part=") or name.endswith((".tmp", ".old")):
            continue
        mpath = os.path.join(out_dir, name, "_manifest.json")
        if os.path.exists(mpath):
            m = json.load(open(mpath))
            if m.get("status") == "DONE":
                num_partitions = int(m["num_partitions"])
                done_part = name
                break
    if num_partitions is None:
        raise ValueError(f"no DONE partitions in {out_dir}")
    import pyarrow.parquet as pq

    # int() BEFORE the modulo: a np.uint64 SCALAR % python-int promotes
    # to float64 (unlike the array form add_partition_column uses) and
    # silently rounds the 64-bit hash past 2^53 -- wrong partition
    part = int(stable_hash64_series(pd.Series([value], dtype=object))[0]) % num_partitions
    f = _partition_file_asof(os.path.join(out_dir, f"part={part:05d}"), version)
    if f is None or not os.path.exists(f):
        # entity's partition never written => no rows AND no parquet
        # dtypes to inherit; synthesize the store schema from the DONE
        # partition that supplied num_partitions (object dtype -- the
        # best available without reading data)
        if columns is None:
            columns = pq.read_schema(
                os.path.join(out_dir, f"part={done_part}", "data.parquet")
            ).names
        return pd.DataFrame({c: pd.Series(dtype=object) for c in columns})
    tbl = pq.read_table(f, columns=columns)
    hit = tbl.to_pandas()
    # filtered-to-empty keeps the parquet dtypes the read carried --
    # empty and non-empty results stay dtype-consistent
    return hit[hit[key] == value].reset_index(drop=True)


def read_store_asof(out_dir: str, version: int | None = None, columns: list[str] | None = None):
    """Time-travel read of a partitioned store: the content AS OF store
    ``version`` (initial build = 0, each ``update_partitioned`` = +1);
    ``None`` = current.

    ``update_partitioned`` is copy-on-write: the superseded file is kept
    as ``data@{v}.parquet`` tagged with the version it was written at, so
    each partition resolves independently to the newest file <= the
    requested version.  Partitions first created by a later update simply
    contribute nothing to earlier versions.  No store-wide snapshot
    coordination is needed -- version resolution is per-partition local
    metadata, which is what makes the read scale-free.
    """
    import ray.data as rd

    if not os.path.isdir(out_dir):
        raise ValueError(f"{out_dir} is not a store directory")
    files: list[str] = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part=") or name.endswith((".tmp", ".old")):
            continue
        f = _partition_file_asof(os.path.join(out_dir, name), version)
        if f is not None:
            files.append(f)
    if not files:
        raise ValueError(f"no partitions in {out_dir} visible at version {version}")
    ds = rd.read_parquet(files)
    if columns is not None:
        return ds.select_columns(columns)
    # drop the hive-style 'part' column read_parquet infers from the
    # part=NNNNN directory names -- a layout artifact, not store data
    return ds.drop_columns(["part"])


def vacuum_store(out_dir: str, keep_versions: int = 1) -> dict:
    """Retention for time-travel files: drop preserved ``data@v.parquet``
    files older than the newest ``keep_versions`` distinct versions per
    partition (0 = current only).  Purely local per-partition metadata,
    so it can run partition-parallel at scale; here a driver loop over
    the manifest directory is plenty (one stat per file).  Returns
    {partition: [versions removed]}."""
    if keep_versions < 0:
        raise ValueError("keep_versions must be >= 0")
    removed: dict[int, list[int]] = {}
    if not os.path.isdir(out_dir):
        raise ValueError(f"{out_dir} is not a store directory")
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("part=") or name.endswith((".tmp", ".old")):
            continue
        pdir = os.path.join(out_dir, name)
        versions = sorted(
            int(f[len("data@"):-len(".parquet")])
            for f in os.listdir(pdir)
            if f.startswith("data@") and f.endswith(".parquet")
        )
        drop = versions[: max(0, len(versions) - keep_versions)]
        for v in drop:
            os.remove(os.path.join(pdir, f"data@{v}.parquet"))
        if drop:
            removed[int(name.split("=")[1])] = drop
    return removed


def write_mapping(out_dir: str, mapping_df: pd.DataFrame) -> None:
    """Persist the (node, component) canonicalization mapping next to the
    store (atomic tmp+rename).  The canonical store cannot reconstruct
    its own mapping (rewrites drop the original sameAs edges), so the
    incremental canonical update needs this file.  This is the
    vocabulary-scale (driver-fits) path; above the broadcast limit use
    ``write_mapping_ds`` -- the mapping never touches the driver."""
    if "node" not in mapping_df.columns:  # empty CC output has no columns
        mapping_df = pd.DataFrame({"node": pd.Series(dtype="object"),
                                   "component": pd.Series(dtype="object")})
    tmp = os.path.join(out_dir, "_mapping.parquet.tmp")
    mapping_df.to_parquet(tmp, index=False)
    os.replace(tmp, os.path.join(out_dir, "_mapping.parquet"))
    dir_form = os.path.join(out_dir, "_mapping_parquet")
    if os.path.isdir(dir_form):
        shutil.rmtree(dir_form)


def write_mapping_ds(out_dir: str, mapping_ds) -> None:
    """Distributed mapping persistence (directory of parquet shards,
    atomic dir rename): for equivalence graphs too large to pull to the
    driver.  ``read_mapping`` accepts either form."""
    tmp = os.path.join(out_dir, "_mapping_parquet.tmp")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    mapping_ds.write_parquet(tmp)
    final = os.path.join(out_dir, "_mapping_parquet")
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    file_form = os.path.join(out_dir, "_mapping.parquet")
    if os.path.exists(file_form):
        os.remove(file_form)


def read_mapping(out_dir: str, max_rows: int | None = None) -> pd.DataFrame:
    """Load the persisted mapping (file or sharded-dir form).  With
    ``max_rows``, refuse (via parquet metadata, before reading) to pull a
    mapping larger than the caller can hold on the driver."""
    import glob as _glob

    import pyarrow.parquet as _pq

    path = os.path.join(out_dir, "_mapping.parquet")
    paths = [path] if os.path.exists(path) else sorted(
        _glob.glob(os.path.join(out_dir, "_mapping_parquet", "*.parquet"))
    )
    if not paths:
        raise ValueError(
            f"{out_dir} has no persisted mapping -- not a canonical store "
            "written by this engine (or written before mapping persistence)"
        )
    if max_rows is not None:
        n = sum(_pq.ParquetFile(p).metadata.num_rows for p in paths)
        if n > max_rows:
            raise ValueError(
                f"mapping has {n} nodes > driver limit {max_rows}; the "
                "broadcast mapping repair cannot hold it -- rebuild the "
                "store (or raise the OTM_MAX_BROADCAST_NODES env override "
                "of stages/canonicalize.MAX_BROADCAST_NODES on a bigger "
                "driver)"
            )
    return pd.concat([pd.read_parquet(p) for p in paths], ignore_index=True)


def write_ntriples(ds, out_dir: str, resume: bool = False) -> int:
    """Distributed N-Triples export of a DISTINCT (subj, pred, obj)
    Dataset -- the RDF OUTPUT side of the engine (the reference consumes
    and serves serialized ontologies; a KG build must also emit them).
    Each block formats its rows vectorized (`<s> <p> <o> .` per line)
    and writes ONE content-addressed shard via the atomic tmp+rename
    pattern, so a crashed export leaves only complete shards.

    The target directory must hold no prior export unless
    ``resume=True``: shard names are content-addressed PER BLOCK, so
    re-running into a populated directory is only a safe no-op when the
    block split is unchanged -- under a different partitioning the old
    and new shard sets would coexist and double the data on read.
    ``resume=True`` is for finishing a crashed export with the same
    input and parallelism; a fresh export should replace the directory
    (the kg_nt_roundtrip pattern).  Input rows must be globally
    distinct (byte-identical blocks would collapse onto one shard).
    Returns the number of triples written."""
    import hashlib

    import pandas as pd

    if (
        not resume
        and os.path.isdir(out_dir)
        and any(f.endswith(".nt") for f in os.listdir(out_dir))
    ):
        raise FileExistsError(
            f"{out_dir} already holds an export; remove it or pass resume=True "
            "(same input AND same block split only)"
        )
    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"n": pd.Series([], dtype="int64")})
        lines = ("<" + df["subj"] + "> <" + df["pred"] + "> <" + df["obj"] + "> .")
        body = "\n".join(sorted(lines)) + "\n"
        name = hashlib.md5(body.encode()).hexdigest()[:16]
        final = os.path.join(out_dir, f"part-{name}.nt")
        if not os.path.exists(final):
            tmp = final + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(body)
            os.replace(tmp, final)
        return pd.DataFrame({"n": [len(df)]})

    counts = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return int(counts["n"].sum())
