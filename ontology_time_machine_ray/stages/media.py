"""Multimodal span handling: media columns as opaque refs + typed metadata.

The interleaved corpus carries media spans (``kind="media"``,
``media_ref="media://..."``) that the text stages pass through untouched.
This module is the media-side pipeline:

* ``media_catalog``  -- explode media spans into one row per asset with
  deterministic metadata (SQL-checkable plumbing).
* ``MediaDecoder``   -- the actor-pool decode stage.  With ``fake=True``
  it produces deterministic ref-derived metadata (catalog plumbing);
  with ``fake=False`` it decodes REAL bytes in-container for the
  published formats (P6 PPM, RIFF/PCM WAV) -- the seam where PIL/libav
  would plug in for other containers.  ``MediaFeatureExtractor``,
  ``MediaResizer`` and ``MediaAHasher`` likewise transform actual pixel
  / PCM buffers (thumbnail sums, nearest-neighbor resample to re-emitted
  P6 bytes, average-hash).  No stub branch remains: malformed payloads
  set ``parse_ok=False`` instead of raising -- errors are data.  The
  Ray-side plumbing -- schema, actor signature, small-batch sizing for
  large binary payloads -- is real and tested.
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


import re as _re
import struct as _struct

#: P6 (binary) PPM header: magic, whitespace, width, height, maxval 255.
_PPM_HDR = _re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+255\s")


def decode_ppm(payload: bytes):
    """Parse a binary PPM (P6) image from BYTES: header dims + an exact
    pixel-buffer length check.  Returns ``(width, height)`` or ``None``
    (malformed/truncated)."""
    m = _PPM_HDR.match(payload)
    if m is None:
        return None
    w, h = int(m.group(1)), int(m.group(2))
    if w <= 0 or h <= 0 or len(payload) != m.end() + w * h * 3:
        return None
    return w, h


def decode_wav(payload: bytes):
    """Parse a RIFF/PCM WAV header from BYTES.  Returns ``(channels,
    sample_rate, n_frames)`` or ``None`` (malformed/truncated/non-PCM)."""
    b = payload
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE" or b[12:16] != b"fmt ":
        return None
    fmt_size, audio_fmt, channels, rate = _struct.unpack_from("<IHHI", b, 16)
    _, block_align, bits = _struct.unpack_from("<IHH", b, 28)
    data_off = 20 + fmt_size
    if (
        audio_fmt != 1  # PCM only
        or bits != 16
        or channels < 1
        # block_align must be consistent with channels x 16-bit samples,
        # or the downstream frombuffer/reshape in the feature extractor
        # crashes on a header that "parsed" here (errors are data)
        or block_align != channels * 2
        or len(b) < data_off + 8
        or b[data_off : data_off + 4] != b"data"
    ):
        return None
    (data_size,) = _struct.unpack_from("<I", b, data_off + 4)
    if len(b) < data_off + 8 + data_size:
        return None
    return channels, rate, data_size // block_align


class MediaDecoder:
    """Actor-pool decode/feature stage for media assets.

    Two modes:

    * ``fake=True`` (doc-side catalog plumbing): deterministic
      ref-derived metadata -- the batch carries only refs, payloads stay
      in the object store.
    * ``fake=False`` (REAL decode): the batch carries a binary
      ``payload`` column; PPM (P6) and RIFF/PCM WAV are parsed from
      bytes in-container (published file formats, no codec library --
      the seam where PIL/libav plug in for other containers).  Malformed
      payloads set ``parse_ok=False`` instead of raising: errors are
      data (the reference's error-chain idea, download_ontologies.py).

    Batches must stay SMALL (``batch_size<=64``) because each row may
    carry megabytes of binary payload -- the map_batches caller sets
    that, not this class.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, ref: str) -> tuple[int, int, int]:
        # deterministic fake: dimensions derived from the ref string
        n = len(ref)
        return 64 + (n % 128), 64 + ((n * 7) % 128), n

    def _decode_payloads(self, df: pd.DataFrame) -> pd.DataFrame:
        out = {
            "media_ref": [], "media_type": [], "parse_ok": [],
            "width": [], "height": [], "channels": [], "sample_rate": [],
            "n_frames": [], "n_bytes": [],
        }
        for ref, payload in zip(df["media_ref"], df["payload"]):
            b = bytes(payload) if payload is not None else b""
            mtype = ref.rsplit(".", 1)[-1]  # container routing by extension
            w = h = ch = rate = nf = 0
            ok = False
            if mtype == "ppm":
                dims = decode_ppm(b)
                if dims is not None:
                    w, h = dims
                    ok = True
            elif mtype == "wav":
                wav = decode_wav(b)
                if wav is not None:
                    ch, rate, nf = wav
                    ok = True
            out["media_ref"].append(ref)
            out["media_type"].append(mtype)
            out["parse_ok"].append(ok)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            out["sample_rate"].append(rate)
            out["n_frames"].append(nf)
            out["n_bytes"].append(len(b))
        return pd.DataFrame(
            {
                "media_ref": pd.Series(out["media_ref"], dtype="object"),
                "media_type": pd.Series(out["media_type"], dtype="object"),
                "parse_ok": pd.Series(out["parse_ok"], dtype="bool"),
                "width": pd.Series(out["width"], dtype="int64"),
                "height": pd.Series(out["height"], dtype="int64"),
                "channels": pd.Series(out["channels"], dtype="int64"),
                "sample_rate": pd.Series(out["sample_rate"], dtype="int64"),
                "n_frames": pd.Series(out["n_frames"], dtype="int64"),
                "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
            }
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            if "payload" not in df.columns:
                raise ValueError(
                    "MediaDecoder(fake=False) decodes BYTES: the batch "
                    "must carry a binary 'payload' column"
                )
            return self._decode_payloads(df)
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


#: thumbnail edge for the feature extractor (T x T nearest-neighbor).
THUMB_T = 2


class MediaFeatureExtractor:
    """Actor-pool decode + NUMERIC feature extraction from raw bytes --
    the stage downstream training pipelines run after decode (image
    thumbnail / audio energy), fully real in-container:

    * PPM: nearest-neighbor ``THUMB_T x THUMB_T`` thumbnail (integer
      index map ``src = t * dim // T``), per-channel pixel sums
      (``sum_r/g/b`` -- integer, so the oracle can replay the generator
      formulas bit-exactly).
    * WAV: PCM int16 decode of channel 0, sum of absolute samples
      (``sum_abs`` -- the integer stand-in for RMS energy).

    Malformed payloads keep ``parse_ok=False`` with zero features."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        T = THUMB_T
        out = {
            "media_ref": [], "media_type": [], "parse_ok": [],
            "sum_r": [], "sum_g": [], "sum_b": [], "sum_abs": [],
        }
        for ref, payload in zip(df["media_ref"], df["payload"]):
            b = bytes(payload) if payload is not None else b""
            mtype = ref.rsplit(".", 1)[-1]
            ok = False
            sr = sg = sb = sa = 0
            if mtype == "ppm":
                dims = decode_ppm(b)
                if dims is not None:
                    ok = True
                    w, h = dims
                    m = _PPM_HDR.match(b)
                    px = np.frombuffer(b, dtype=np.uint8, offset=m.end()).reshape(
                        h, w, 3
                    )
                    ys = (np.arange(T) * h) // T
                    xs = (np.arange(T) * w) // T
                    thumb = px[np.ix_(ys, xs)].astype(np.int64)
                    sr, sg, sb = (int(thumb[:, :, c].sum()) for c in range(3))
            elif mtype == "wav":
                wav = decode_wav(b)
                if wav is not None:
                    ok = True
                    ch, _rate, nf = wav
                    fmt_size = _struct.unpack_from("<I", b, 16)[0]
                    data_off = 20 + fmt_size + 8
                    pcm = np.frombuffer(
                        b, dtype="<i2", offset=data_off, count=nf * ch
                    ).reshape(nf, ch)
                    sa = int(np.abs(pcm[:, 0].astype(np.int64)).sum())
            out["media_ref"].append(ref)
            out["media_type"].append(mtype)
            out["parse_ok"].append(ok)
            out["sum_r"].append(sr)
            out["sum_g"].append(sg)
            out["sum_b"].append(sb)
            out["sum_abs"].append(sa)
        return pd.DataFrame(
            {
                "media_ref": pd.Series(out["media_ref"], dtype="object"),
                "media_type": pd.Series(out["media_type"], dtype="object"),
                "parse_ok": pd.Series(out["parse_ok"], dtype="bool"),
                "sum_r": pd.Series(out["sum_r"], dtype="int64"),
                "sum_g": pd.Series(out["sum_g"], dtype="int64"),
                "sum_b": pd.Series(out["sum_b"], dtype="int64"),
                "sum_abs": pd.Series(out["sum_abs"], dtype="int64"),
            }
        )


def media_features(assets_path: str, concurrency: int | None = None) -> rd.Dataset:
    """Asset store -> per-asset numeric features (thumbnail channel sums /
    PCM energy), decoded from bytes in an actor pool over small batches."""
    return rd.read_parquet(assets_path).map_batches(
        MediaFeatureExtractor,
        batch_format="pandas",
        batch_size=64,  # rows carry binary payloads
        concurrency=concurrency or _media_pool_size(),
    )


class MediaResizer:
    """Actor-pool resize stage.

    Two modes, same aspect-preserving integer box clamp
    (``new = dim * max_side // max(w, h)`` when the longest side exceeds
    the box):

    * ``fake=True`` (metadata-only plumbing): batches carry decoded
      ``width``/``height`` columns; only the target dimensions are
      computed -- the shape used when payloads live in a remote blob
      store and only the catalog is being planned.
    * ``fake=False`` (REAL pixel transform, codec-free): batches carry
      ``media_ref``/``payload``; each P6 PPM payload is decoded
      (``decode_ppm``), resampled to the target box with the same
      nearest-neighbor index gather the aHash thumbnailer uses
      (``px[np.ix_(ys, xs)]``), and re-emitted as a valid P6 PPM byte
      string plus dimensions.  Non-PPM / malformed payloads pass
      through with ``parse_ok=False`` (errors are data, M13)."""

    def __init__(self, max_side: int = 96, fake: bool = True):
        self.max_side = max_side
        self.fake = fake

    def _target(self, w, h):
        side = np.maximum(w, h)
        nw = np.where(side > self.max_side, w * self.max_side // side, w)
        nh = np.where(side > self.max_side, h * self.max_side // side, h)
        return nw, nh

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.fake:
            w = df["width"].to_numpy()
            h = df["height"].to_numpy()
            nw, nh = self._target(w, h)
            return df.assign(
                resized_w=nw.astype("int64"), resized_h=nh.astype("int64")
            )
        refs: list[str] = []
        oks: list[bool] = []
        ws: list[int] = []
        hs: list[int] = []
        payloads: list[bytes] = []
        for ref, payload in zip(df["media_ref"], df["payload"]):
            b = bytes(payload) if payload is not None else b""
            dims = decode_ppm(b)
            refs.append(ref)
            if dims is None:
                oks.append(False)
                ws.append(0)
                hs.append(0)
                payloads.append(b"")
                continue
            w, h = dims
            nw, nh = self._target(np.int64(w), np.int64(h))
            nw, nh = int(nw), int(nh)
            m = _PPM_HDR.match(b)
            px = np.frombuffer(b, dtype=np.uint8, offset=m.end()).reshape(h, w, 3)
            ys = (np.arange(nh) * h) // nh
            xs = (np.arange(nw) * w) // nw
            resized = np.ascontiguousarray(px[np.ix_(ys, xs)])
            oks.append(True)
            ws.append(nw)
            hs.append(nh)
            payloads.append(b"P6\n%d %d\n255\n" % (nw, nh) + resized.tobytes())
        return pd.DataFrame(
            {
                "media_ref": pd.Series(refs, dtype="object"),
                "parse_ok": pd.Series(oks, dtype="bool"),
                "resized_w": pd.Series(ws, dtype="int64"),
                "resized_h": pd.Series(hs, dtype="int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage (stub): emits k deterministic frame
    indices per video-like asset (evenly spaced over a fake frame count
    derived from the payload size)."""

    def __init__(self, k: int = 3, fake: bool = True):
        self.k = k
        self.fake = fake

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            # REAL path: n_frames comes from an actual decode (e.g. WAV
            # PCM frame count), not a payload-size heuristic
            rows = {"media_ref": [], "frame_idx": []}
            for ref, nf in zip(df["media_ref"], df["n_frames"]):
                n_frames = int(nf)
                if n_frames <= 0:
                    continue
                step = max(1, n_frames // self.k)
                for i in range(self.k):
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(min(i * step, n_frames - 1))
            return pd.DataFrame(
                {"media_ref": pd.Series(rows["media_ref"], dtype="object"),
                 "frame_idx": pd.Series(rows["frame_idx"], dtype="int64")}
            )
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


def media_decode_assets(assets_path: str, concurrency: int | None = None) -> rd.Dataset:
    """REAL byte-level decode of the media-asset store: binary payloads ->
    typed metadata (PPM dims / WAV audio params / parse_ok), an actor
    pool over small batches (each row carries the payload)."""
    return rd.read_parquet(assets_path).map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": False},
        batch_format="pandas",
        batch_size=64,
        concurrency=concurrency or _media_pool_size(),
    )


def media_decode_frames(assets_path: str, k: int = 3, concurrency: int | None = None) -> rd.Dataset:
    """Frame sampling over REAL decoded frame counts: decode the WAV
    assets, then sample ``k`` evenly spaced frame indices from the actual
    PCM frame count (parse failures and images contribute nothing)."""
    c = concurrency or _media_pool_size()
    return media_decode_assets(assets_path, concurrency=c).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k": k, "fake": False},
        batch_format="pandas",
        batch_size=64,
        concurrency=c,
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


class MediaAHasher:
    """Actor-pool perceptual hashing of image BYTES: the average-hash
    (aHash) every image-dedup pipeline starts with -- decode the PPM,
    integer-grayscale an 8x8 nearest-neighbor thumbnail, threshold each
    cell against the integer mean, pack the 64 bits.  All arithmetic is
    integer (``//`` everywhere), so the oracle can replay the asset
    generator's pixel formulas bit-exactly.  The hash ships as two
    uint32 halves (``ahash_hi``/``ahash_lo``) -- bit 63 would overflow a
    signed BIGINT in both engines.  Non-PPM and malformed payloads are
    skipped (audio has no aHash; errors are handled upstream by
    ``media_decode``'s parse_ok)."""

    T = 8

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        T = self.T
        refs: list[str] = []
        his: list[int] = []
        los: list[int] = []
        for ref, payload in zip(df["media_ref"], df["payload"]):
            if not ref.endswith(".ppm"):
                continue
            b = bytes(payload) if payload is not None else b""
            dims = decode_ppm(b)
            if dims is None:
                continue
            w, h = dims
            m = _PPM_HDR.match(b)
            px = np.frombuffer(b, dtype=np.uint8, offset=m.end()).reshape(h, w, 3)
            ys = (np.arange(T) * h) // T
            xs = (np.arange(T) * w) // T
            thumb = px[np.ix_(ys, xs)].astype(np.int64)
            gray = thumb.sum(axis=2) // 3  # integer grayscale per cell
            bits = (gray > gray.sum() // (T * T)).astype(np.uint64).ravel()
            packed = int((bits << np.arange(T * T, dtype=np.uint64)).sum())
            refs.append(ref)
            his.append(packed >> 32)
            los.append(packed & 0xFFFFFFFF)
        return pd.DataFrame(
            {
                "media_ref": pd.Series(refs, dtype="object"),
                "ahash_hi": pd.Series(his, dtype="int64"),
                "ahash_lo": pd.Series(los, dtype="int64"),
            }
        )


def media_phash_dedup(assets_path: str, concurrency: int | None = None) -> rd.Dataset:
    """Image near-dup detection by perceptual hash: aHash each decodable
    image in an actor pool, then ONE hash-bucketed pass labels every
    image with its cluster representative (min media_ref) and cluster
    size -- equal hashes <=> visually-identical-after-downscale images.
    Hamming-radius>0 matching would reuse the SimHash segment-blocking
    machinery (``dedup_docs``); radius 0 is the exact-cluster base case
    and needs no pair expansion at all."""
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    hashes = rd.read_parquet(assets_path).map_batches(
        MediaAHasher,
        batch_format="pandas",
        batch_size=64,  # rows carry binary payloads
        concurrency=concurrency or _media_pool_size(),
    )

    def label(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values("media_ref", kind="stable").copy()
        grp = out.groupby(["ahash_hi", "ahash_lo"], sort=False)
        out["cluster_rep"] = grp["media_ref"].transform("first")
        out["cluster_size"] = grp["media_ref"].transform("size").astype("int64")
        return out

    return grouped_apply(hashes, ["ahash_hi", "ahash_lo"], label)
