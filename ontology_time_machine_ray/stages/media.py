"""Multimodal span handling: media columns as opaque refs + typed metadata.

The interleaved corpus carries media spans (``kind="media"``,
``media_ref="media://..."``) that the text stages pass through untouched.
This module is the media-side pipeline:

* ``media_catalog``  -- explode media spans into one row per asset with
  deterministic metadata (SQL-checkable plumbing).
* ``MediaDecoder``   -- the actor-pool decode/feature stage.  The actual
  codec is STUBBED (image/audio libraries are not in this container): with
  ``fake=True`` it produces a deterministic byte-length-derived feature
  payload; with ``fake=False`` it raises ``NotImplementedError`` where the
  real decoder (PIL/libav) would run.  The Ray-side plumbing -- schema,
  actor signature, small-batch sizing for large binary payloads -- is real
  and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def explode_media(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy()
    flat = spans.flatten()
    if len(flat) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.string()), "span_idx": pa.array([], pa.int32()),
             "media_ref": pa.array([], pa.string())}
        )
    offsets = spans.offsets.to_numpy()
    span_idx = np.arange(len(flat), dtype=np.int32) - offsets[parent].astype(np.int32)
    mask = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
    sel = np.nonzero(mask)[0]
    doc_ids = batch.column("doc_id").take(pa.array(parent[sel]))
    return pa.table(
        {
            "doc_id": doc_ids,
            "span_idx": pa.array(span_idx[sel]),
            "media_ref": flat.field("media_ref").take(pa.array(sel)),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature stage for media assets.

    Real deployments pass ``fake=False`` and implement ``_decode`` with the
    codec of choice; batches must stay SMALL (``batch_size<=64``) because
    each row may carry megabytes of binary payload -- the map_batches
    caller sets that, not this class.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, ref: str) -> tuple[int, int, int]:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires an image/audio codec library; "
                "not available in this container"
            )
        # deterministic fake: dimensions derived from the ref string
        n = len(ref)
        return 64 + (n % 128), 64 + ((n * 7) % 128), n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        dims = [self._decode(r) for r in df["media_ref"]]
        w, h, nb = zip(*dims) if dims else ((), (), ())
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "span_idx": df["span_idx"].to_numpy(),
                "media_ref": df["media_ref"].to_numpy(),
                "width": np.array(w, dtype=np.int64),
                "height": np.array(h, dtype=np.int64),
                "n_bytes": np.array(nb, dtype=np.int64),
            }
        )


class MediaResizer:
    """Actor-pool resize stage (stub): clamps decoded dimensions into a
    target box preserving aspect ratio with integer arithmetic (the real
    implementation would transform pixel buffers; the metadata math and
    pipeline plumbing are identical)."""

    def __init__(self, max_side: int = 96, fake: bool = True):
        self.max_side = max_side
        self.fake = fake

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError("real resize requires an image codec library")
        w = df["width"].to_numpy()
        h = df["height"].to_numpy()
        side = np.maximum(w, h)
        # scale numerator/denominator kept integer: new = dim*max_side//side
        nw = np.where(side > self.max_side, w * self.max_side // side, w)
        nh = np.where(side > self.max_side, h * self.max_side // side, h)
        return df.assign(resized_w=nw.astype("int64"), resized_h=nh.astype("int64"))


class FrameSampler:
    """Actor-pool frame-sampling stage (stub): emits k deterministic frame
    indices per video-like asset (evenly spaced over a fake frame count
    derived from the payload size)."""

    def __init__(self, k: int = 3, fake: bool = True):
        self.k = k
        self.fake = fake

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError("real frame sampling requires a video codec library")
        rows = {"doc_id": [], "media_ref": [], "frame_idx": []}
        for did, ref, nb in zip(df["doc_id"], df["media_ref"], df["n_bytes"]):
            n_frames = 10 + (int(nb) % 90)  # deterministic fake frame count
            step = max(1, n_frames // self.k)
            for i in range(self.k):
                rows["doc_id"].append(did)
                rows["media_ref"].append(ref)
                rows["frame_idx"].append(min(i * step, n_frames - 1))
        return pd.DataFrame(
            {"doc_id": rows["doc_id"], "media_ref": rows["media_ref"],
             "frame_idx": pd.Series(rows["frame_idx"], dtype="int64")}
        )


def _media_pool_size() -> int:
    """Three chained pools must fit alongside read tasks: cap each at a
    quarter of the cluster (a chain of pools that reserves every CPU
    deadlocks a small cluster)."""
    import ray

    try:
        total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        total = 4
    return max(1, total // 4)


def media_pipeline(documents_path: str, concurrency: int | None = None) -> rd.Dataset:
    """explode -> decode -> resize -> frame-sample: the full multimodal
    chain as consecutive actor-pool stages over small batches."""
    c = concurrency or _media_pool_size()
    return (
        media_catalog(documents_path, concurrency=c)
        .map_batches(MediaResizer, batch_format="pandas", batch_size=64, concurrency=c)
        .map_batches(FrameSampler, batch_format="pandas", batch_size=64, concurrency=c)
    )


def media_catalog(documents_path: str, concurrency: int | None = None) -> rd.Dataset:
    """documents -> exploded media assets with decoded (stub) metadata."""
    return (
        rd.read_parquet(documents_path, columns=["doc_id", "spans"])
        .map_batches(explode_media, batch_format="pyarrow")
        .map_batches(
            MediaDecoder,
            batch_format="pandas",
            batch_size=64,  # large binary payloads: keep batches small
            concurrency=concurrency or _media_pool_size(),
        )
    )
