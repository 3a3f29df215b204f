"""Text-analysis operators + media plumbing tests."""

from __future__ import annotations

import pandas as pd
import pytest

from ontology_time_machine_ray.stages.media import MediaDecoder, explode_media
from ontology_time_machine_ray.stages.textops import (
    fingerprint_batch,
    lang_id_batch,
    quality_score_batch,
    text_stats_batch,
)


def test_text_stats_known_values():
    df = pd.DataFrame({"doc_id": [1], "text": ["the cat and the dog, of course!"]})
    out = text_stats_batch(df)
    assert out["n_chars"].iloc[0] == 31
    assert out["n_tokens"].iloc[0] == 7
    assert out["n_punct"].iloc[0] == 2  # ',' and '!'
    assert out["n_stopwords"].iloc[0] == 4  # the, and, the, of


def test_quality_score_components():
    # >=100 chars, stopwords present, punct <=10% of tokens (1 in 12)
    long_good = "the quick brown fox jumps over a lazy dog in the meadow. " * 10
    out = quality_score_batch(pd.DataFrame({"doc_id": [1, 2], "text": [long_good, "x!"]}))
    assert out["quality"].iloc[0] == 3
    assert out["quality"].iloc[1] <= 1


def test_lang_id_markers_and_ties():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat and the dog of it",
                "der hund und die katze und",
                "xyz qrs",  # no evidence
                "the und",  # tie en/de
            ],
        }
    )
    out = lang_id_batch(df)
    assert list(out["lang_pred"]) == ["en", "de", "unknown", "unknown"]


def test_fingerprint_is_md5_of_normalized():
    import hashlib

    out = fingerprint_batch(pd.DataFrame({"doc_id": [1], "text": ["  Hello World  "]}))
    assert out["fingerprint"].iloc[0] == hashlib.md5(b"hello world").hexdigest()


def test_media_explode_and_decode(ray_session, sf_dir):
    from ontology_time_machine_ray.fixtures import ensure_fixtures
    from ontology_time_machine_ray.stages.media import media_catalog

    paths = ensure_fixtures(sf_dir)
    cat = media_catalog(paths.documents).to_pandas()
    assert len(cat) > 0
    assert (cat["media_ref"].str.startswith("media://")).all()
    # deterministic fake decode invariants
    assert (cat["width"] == 64 + cat["n_bytes"] % 128).all()
    assert (cat["height"] == 64 + (cat["n_bytes"] * 7) % 128).all()


def test_media_decoder_real_path_needs_payload():
    dec = MediaDecoder(fake=False)
    with pytest.raises(ValueError):
        dec(pd.DataFrame({"media_ref": ["media://x.ppm"]}))  # no payload col


def test_decode_ppm_real_bytes():
    from ontology_time_machine_ray.stages.media import decode_ppm

    good = b"P6\n5 4\n255\n" + bytes(range(5 * 4 * 3))
    assert decode_ppm(good) == (5, 4)
    assert decode_ppm(good[:-1]) is None  # short pixel buffer
    assert decode_ppm(b"P5\n5 4\n255\n") is None  # wrong magic
    assert decode_ppm(b"P6\n5") is None  # truncated header


def test_decode_wav_real_bytes():
    import struct

    from ontology_time_machine_ray.stages.media import decode_wav

    channels, rate, n_frames = 2, 16000, 7
    block = channels * 2
    data = bytes(n_frames * block)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert decode_wav(wav) == (channels, rate, n_frames)
    assert decode_wav(wav[:-1]) is None  # truncated data
    assert decode_wav(b"RIFX" + wav[4:]) is None  # wrong magic
    # non-PCM audio format rejected
    bad = bytearray(wav)
    bad[20] = 3
    assert decode_wav(bytes(bad)) is None
    # channels=0 rejected (would IndexError in the feature extractor)
    zero_ch = bytearray(wav)
    struct.pack_into("<H", zero_ch, 22, 0)
    assert decode_wav(bytes(zero_ch)) is None
    # block_align inconsistent with channels x 16-bit rejected (would
    # ValueError in np.frombuffer downstream)
    bad_align = bytearray(wav)
    struct.pack_into("<H", bad_align, 32, 1)
    assert decode_wav(bytes(bad_align)) is None


def test_media_decoder_flags_corrupted_assets(ray_session, sf_dir):
    from ontology_time_machine_ray.fixtures import ensure_fixtures
    from ontology_time_machine_ray.stages.media import media_decode_assets

    paths = ensure_fixtures(sf_dir)
    out = media_decode_assets(paths.media_assets).to_pandas()
    assert len(out) == 512
    bad = out[~out["parse_ok"]]
    assert len(bad) > 0 and (bad["n_bytes"] == 5).all()
    ppm = out[(out["media_type"] == "ppm") & out["parse_ok"]]
    assert (ppm["width"] > 0).all() and (ppm["channels"] == 0).all()
    wav = out[(out["media_type"] == "wav") & out["parse_ok"]]
    assert (wav["n_frames"] > 0).all() and (wav["width"] == 0).all()


def test_explode_media_empty_batch():
    import pyarrow as pa

    from ontology_time_machine_ray.schema import DOCUMENTS_SCHEMA

    empty = pa.table({f.name: pa.array([], type=f.type) for f in DOCUMENTS_SCHEMA})
    out = explode_media(empty)
    assert out.num_rows == 0


def test_media_pipeline_resize_and_frames(ray_session, sf_dir):
    from ontology_time_machine_ray.fixtures import ensure_fixtures
    from ontology_time_machine_ray.stages.media import media_pipeline

    paths = ensure_fixtures(sf_dir)
    frames = media_pipeline(paths.documents).to_pandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] >= 0).all()
    # exactly k=3 frames per asset
    per_asset = frames.groupby(["doc_id", "media_ref"]).size()
    assert (per_asset == 3).all()


def test_media_resizer_bounds():
    import pandas as pd

    from ontology_time_machine_ray.stages.media import MediaResizer

    df = pd.DataFrame({"width": [200, 50], "height": [100, 80], "n_bytes": [1, 2]})
    out = MediaResizer(max_side=96)(df)
    assert out["resized_w"].tolist() == [96, 50]
    assert out["resized_h"].tolist() == [48, 80]


def test_media_resizer_real_pixels():
    """fake=False transforms actual PPM pixel buffers: the output is a
    valid P6 payload at the clamped dimensions whose pixels are the
    nearest-neighbor gather of the source; small images pass through at
    original size byte-identically; malformed payloads emit
    parse_ok=False instead of raising."""
    import numpy as np
    import pandas as pd

    from ontology_time_machine_ray.stages.media import MediaResizer, decode_ppm

    # 8x4 image with a distinct value per pixel
    w, h = 8, 4
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    big = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
    small_px = np.full((2, 2, 3), 7, dtype=np.uint8)
    small = b"P6\n2 2\n255\n" + small_px.tobytes()
    df = pd.DataFrame(
        {
            "media_ref": ["a.ppm", "b.ppm", "c.ppm"],
            "payload": [big, small, b"NOT A PPM"],
        }
    )
    out = MediaResizer(max_side=4, fake=False)(df).set_index("media_ref")

    assert out.loc["a.ppm", "parse_ok"]
    assert (out.loc["a.ppm", "resized_w"], out.loc["a.ppm", "resized_h"]) == (4, 2)
    rp = out.loc["a.ppm", "payload"]
    assert decode_ppm(rp) == (4, 2)  # output is itself a valid P6 PPM
    hdr_end = rp.index(b"255\n") + 4
    got_px = np.frombuffer(rp, dtype=np.uint8, offset=hdr_end).reshape(2, 4, 3)
    ys = (np.arange(2) * h) // 2
    xs = (np.arange(4) * w) // 4
    assert (got_px == px[np.ix_(ys, xs)]).all()

    # under the box: identity, payload byte-identical
    assert out.loc["b.ppm", "parse_ok"]
    assert out.loc["b.ppm", "payload"] == small

    assert not out.loc["c.ppm", "parse_ok"]
    assert out.loc["c.ppm", "payload"] == b""


def test_winnow_shared_run_guarantee(ray_session, tmp_path):
    """Winnowing property: two docs sharing a run of >= w + k - 1 tokens
    must share at least one fingerprint; disjoint docs share none."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import winnow_fingerprints

    k, w = 3, 4
    shared = " ".join(f"run{i}" for i in range(k + w - 1))
    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "text": [
                "alpha beta gamma " + shared + " delta epsilon zeta",
                "one two three four " + shared + " five six",
                "totally different words only here never shared at all",
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    got = winnow_fingerprints(str(tmp_path), k=k, w=w).to_pandas()
    fps = {d: set(g["fp"]) for d, g in got.groupby("doc_id")}
    assert fps["a"] & fps["b"], "shared run must yield a common fingerprint"
    assert not (fps["a"] & fps.get("c", set()))
    assert not (fps["b"] & fps.get("c", set()))
    # density: ~2/(w+1) of positions selected -> far fewer fps than shingles
    n_shingles_a = len(docs.loc[0, "text"].split()) - k + 1
    assert len(fps["a"]) < n_shingles_a


def test_tokens_bpe_counts(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import tokens_bpe

    docs = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "text": ["don't stop", "x2  y!!", None],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    got = tokens_bpe(str(tmp_path)).to_pandas().set_index("doc_id")["n_bpe_tokens"]
    # don | 't | <sp>stop ; x | 2 | "  " (ws run) | y | !! ; None -> 0
    assert got["a"] == 3
    assert got["b"] == 5
    assert got["c"] == 0


def test_pii_scrub_redacts_and_counts(ray_session, tmp_path):
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        pii_scrub,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "reach me at bob.jones+spam@mail.example.com today",
                "server 192.168.001.1 rebooted; backup at 10.0.0.255",
                "call +1 415 555 0137 or +44-20-7946-0958",
                "no pii here, just w1 w2 w3 (v1.2.3 is not an ip)",
                None,
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    got = pii_scrub(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[1, "n_emails"] == 1 and "<EMAIL>" in got.loc[1, "clean_text"]
    assert got.loc[2, "n_ips"] == 2 and got.loc[2, "clean_text"].count("<IP>") == 2
    assert got.loc[3, "n_phones"] == 2 and got.loc[3, "clean_text"].count("<PHONE>") == 2
    assert got.loc[4, ["n_emails", "n_phones", "n_ips"]].sum() == 0
    assert got.loc[4, "clean_text"] == docs.loc[3, "text"]
    assert got.loc[5, "clean_text"] == ""
    # nothing redactable survives in any cleaned text
    for pat in (PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE):
        assert not got["clean_text"].str.contains(pat, regex=True).any()
    # independent scalar-re oracle for the counts
    for _, row in docs.dropna().iterrows():
        g = got.loc[row["doc_id"]]
        assert g["n_emails"] == len(re.findall(PII_EMAIL_RE, row["text"]))
        assert g["n_phones"] == len(re.findall(PII_PHONE_RE, row["text"]))
        assert g["n_ips"] == len(re.findall(PII_IP_RE, row["text"]))


def test_inverted_index_matches_scalar_oracle(ray_session, tmp_path):
    from collections import Counter, defaultdict

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import inverted_index

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "the cat sat on the mat",
                "The dog and the cat",
                "dog dog dog",
                None,
                "",
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    got = (
        inverted_index(str(tmp_path))
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )

    post = defaultdict(list)
    for _, row in docs.dropna().iterrows():
        for term, tf in sorted(Counter(row["text"].lower().split()).items()):
            post[term].append((row["doc_id"], tf))
    want = pd.DataFrame(
        [
            {
                "term": t,
                "df": len(e),
                "total_tf": sum(tf for _, tf in e),
                "postings": ",".join(f"{d}:{tf}" for d, tf in sorted(e)),
            }
            for t, e in sorted(post.items())
        ]
    )
    pd.testing.assert_frame_equal(got[["term", "df", "total_tf", "postings"]], want)
    assert got.loc[got["term"] == "the", "postings"].item() == "1:2,2:2"
    assert got.loc[got["term"] == "dog", "total_tf"].item() == 4

    # df bounds: min_df drops singletons, max_df elides stopword-grade terms
    bounded = inverted_index(str(tmp_path), min_df=2, max_df=2).to_pandas()
    assert set(bounded["term"]) == {"cat", "dog", "the"} - {
        t for t, e in post.items() if len(e) > 2
    }

    # batch-size invariance: the (doc_id, term) grain never crosses batches
    import ray.data as rd

    one_per_block = rd.read_parquet(str(tmp_path / "documents.parquet")).repartition(5)
    again = (
        inverted_index(str(tmp_path), docs_ds=one_per_block)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again[["term", "df", "total_tf", "postings"]], want)


def test_tfidf_topk_matches_scalar_oracle(ray_session, tmp_path):
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import TFIDF_SCALE, tfidf_topk

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple apple banana the the the",
                "banana cherry the",
                "cherry cherry cherry apple the",
                None,
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    k = 2
    got = (
        tfidf_topk(str(tmp_path), k=k)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )

    tfs = {r["doc_id"]: Counter(r["text"].lower().split()) for _, r in docs.dropna().iterrows()}
    dfs = Counter(t for c in tfs.values() for t in c)
    rows = []
    for d, c in tfs.items():
        scored = sorted(
            ((t, tf, dfs[t], tf * TFIDF_SCALE // dfs[t]) for t, tf in c.items()),
            key=lambda x: (-x[3], x[0]),
        )
        for rank, (t, tf, df_, sc) in enumerate(scored[:k], 1):
            rows.append(
                {"doc_id": d, "term": t, "tf": tf, "df": df_, "score": sc, "rank": rank}
            )
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(
        got[["doc_id", "term", "tf", "df", "score", "rank"]], want
    )
    # the stopword-grade 'the' (df=3) never outranks a rarer term with
    # equal tf: doc 2's top term is the df=2 'banana', not 'cherry'? both
    # df=2 -- tie broken by term asc
    assert got[got["doc_id"] == 2].iloc[0]["term"] == "banana"
    # empty/None docs contribute no rows
    assert 4 not in set(got["doc_id"])


def test_winnow_dup_pairs_vs_naive(ray_session, tmp_path):
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import winnow_dup_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"intro words {shared} outro one",
                f"different opening {shared} and a tail",
                "completely unrelated text with no overlap at all here",
                "tiny",
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    got = winnow_dup_pairs(str(tmp_path), min_shared=1).to_pandas()

    def naive_fps(text, k=3, w=4):
        toks = text.lower().split()
        hs = [
            int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:13], 16)
            for i in range(len(toks) - k + 1)
        ]
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    fps = {r["doc_id"]: naive_fps(r["text"]) for _, r in docs.iterrows()}
    want = {
        (a, b): len(fps[a] & fps[b])
        for a in fps
        for b in fps
        if a < b and fps[a] & fps[b]
    }
    assert {(r["a"], r["b"]): r["n_shared"] for _, r in got.iterrows()} == want
    # the winnowing guarantee: an 8-token shared run (>= w+k-1 = 6) MUST
    # produce at least one common fingerprint for the pair (1, 2)
    assert (1, 2) in want and want[(1, 2)] >= 1


def test_dup_ngrams_vs_naive(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import dup_ngrams

    shared = "one two three four five six"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{shared} and unique tail a",
                f"prefix b {shared}",
                "no overlap with anything else at all",
                "short",  # < n tokens: absent from output
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    n = 3
    got = dup_ngrams(str(tmp_path), n=n).to_pandas().set_index("doc_id")

    def grams_of(text):
        t = text.split()
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    gsets = {r["doc_id"]: grams_of(r["text"]) for _, r in docs.iterrows() if len(r["text"].split()) >= n}
    for d, gs in gsets.items():
        others = set().union(*(g for o, g in gsets.items() if o != d))
        assert got.loc[d, "n_grams"] == len(gs)
        assert got.loc[d, "n_dup_grams"] == len(gs & others)
    assert 4 not in got.index
    # the 6-token shared run yields 4 shared 3-grams in both docs
    assert got.loc[1, "n_dup_grams"] == 4 and got.loc[2, "n_dup_grams"] == 4
    assert got.loc[3, "n_dup_grams"] == 0


def test_decontaminate_fallback_matches_broadcast(ray_session, sf_dir):
    """Forcing broadcast_budget=0 must route decontaminate/corpus_clean
    through the gram-bucketed semi-join fallback with IDENTICAL output to
    the broadcast path (the _canonicalize_partitioned test pattern)."""
    from ontology_time_machine_ray.stages.textops import corpus_clean, decontaminate

    def norm(df):
        return (
            df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True)
            .astype({c: "int64" for c in df.columns if df[c].dtype.kind == "i"})
        )

    a = norm(decontaminate(sf_dir).to_pandas())
    b = norm(decontaminate(sf_dir, broadcast_budget=0).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0  # the fixture plants contamination; empty = broken test

    ca = corpus_clean(sf_dir).to_pandas()
    cb = corpus_clean(sf_dir, broadcast_budget=0).to_pandas()
    ca = ca.sort_values(["fingerprint", "doc_id"]).reset_index(drop=True)
    cb = cb.sort_values(["fingerprint", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ca.astype({"doc_id": "int64", "fingerprint": "string"}),
        cb.astype({"doc_id": "int64", "fingerprint": "string"}),
    )
    assert len(ca) > 0


def test_dedup_segments_vs_naive(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import SEG_W, dedup_segments

    seg_a = " ".join(f"w{i}" for i in range(SEG_W))          # full segment
    seg_b = " ".join(f"x{i}" for i in range(SEG_W))
    tail = "odd bits"                                         # partial segment
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{seg_a} {seg_b} {tail}",          # 3 segments, all first
                f"{seg_a} {tail}",                  # seg_a dup, tail dup
                f"{seg_b} {seg_b}",                 # second copy dups the first
                "UNIQUE little doc",                # lowercased, kept
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    got = dedup_segments(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()

    # brute force: global first occurrence by (doc_id, seg_idx)
    seen, want = {}, {d: [0, 0, 0] for d in docs["doc_id"]}
    for d, text in sorted(zip(docs["doc_id"], docs["text"])):
        toks = text.lower().split()
        for si in range(0, (len(toks) + SEG_W - 1) // SEG_W):
            seg = " ".join(toks[si * SEG_W : (si + 1) * SEG_W])
            want[d][0] += 1
            if seg not in seen:
                seen[seg] = (d, si)
                want[d][1] += 1
                want[d][2] += len(seg.split())
    for d, (n_segs, n_kept, n_tok) in want.items():
        assert got.loc[d, "n_segs"] == n_segs
        assert got.loc[d, "n_kept"] == n_kept
        assert got.loc[d, "n_tokens_kept"] == n_tok
    # doc 2 repeats doc 1's seg_a; doc 3's two seg_b copies both dup doc 1
    assert got.loc[2, "n_kept"] < got.loc[2, "n_segs"]
    assert got.loc[3, "n_kept"] == 0 and got.loc[3, "n_segs"] == 2


def test_media_feature_extractor_hand_payloads(ray_session):
    """Extractor on hand-built payloads: a 2x2 PPM with known pixels, a
    3-frame stereo WAV with known samples (incl. a negative), and a
    truncated payload."""
    import struct

    import numpy as np
    import pandas as pd

    from ontology_time_machine_ray.stages.media import MediaFeatureExtractor

    # 2x2 image, pixel bytes 0..11 -> thumbnail IS the image (T=2, dims=2)
    ppm = b"P6\n2 2\n255\n" + bytes(range(12))
    # channel sums: r = 0+3+6+9, g = 1+4+7+10, b = 2+5+8+11
    samples = np.array([[100, 7], [-200, 8], [300, 9]], dtype="<i2")
    data = samples.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = pd.DataFrame(
        {
            "media_ref": [
                "media://t/0.ppm", "media://t/1.wav", "media://t/2.ppm",
            ],
            "payload": [ppm, wav, ppm[:5]],
        }
    )
    out = MediaFeatureExtractor()(df)
    assert out["parse_ok"].tolist() == [True, True, False]
    assert out.loc[0, ["sum_r", "sum_g", "sum_b"]].tolist() == [18, 22, 26]
    assert out.loc[1, "sum_abs"] == 100 + 200 + 300  # channel 0 only
    assert out.loc[2, ["sum_r", "sum_g", "sum_b", "sum_abs"]].tolist() == [0, 0, 0, 0]


def test_bm25_topk_matches_scalar_oracle(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import BM25_SCALE, bm25_topk

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "alpha beta beta gamma",
                "alpha alpha alpha",      # high tf, short doc
                "beta gamma gamma delta epsilon zeta eta theta",  # long doc
                "delta epsilon",          # no query terms
                None,                     # null text
            ],
        }
    )
    p = tmp_path / "documents.parquet"
    pq.write_table(pa.Table.from_pandas(docs), p)
    q = ("alpha", "gamma")
    got = bm25_topk(str(tmp_path), query_terms=q, k=3)

    # scalar replay of the documented formula
    toks = docs["text"].fillna("").str.lower().str.findall(r"\S+")
    dl = toks.str.len()
    n, tot = len(docs), int(dl.sum())
    rows = []
    for i in range(len(docs)):
        score, hits = 0, 0
        for t in q:
            tf = toks[i].count(t)
            if not tf:
                continue
            df = sum(1 for u in toks if t in u)
            score += (BM25_SCALE * (n - df + 1) * 22 * tf * tot) // (
                (df + 1) * (10 * tot * tf + 3 * tot + 9 * int(dl[i]) * n)
            )
            hits += 1
        if hits:
            rows.append((docs["doc_id"][i], score, hits))
    exp = (
        pd.DataFrame(rows, columns=["doc_id", "score", "n_hits"])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(3)
        .reset_index(drop=True)
    )
    exp["rank"] = exp.index + 1
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_dtype=False
    )
    # doc 4 (no hits) and doc 5 (null) never appear
    assert not set(got["doc_id"]) & {4, 5}


def test_classifier_score_matches_hashlib_replay():
    """classifier_score_batch vs an independent hashlib-md5 replay of the
    hashed linear model (no DuckDB anywhere in the expected path)."""
    import hashlib

    from ontology_time_machine_ray.stages.textops import (
        CLF_BUCKETS,
        CLF_WEIGHT_MOD,
        classifier_score_batch,
    )

    def md5_13(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    def expected_score(text: str) -> int:
        total = 0
        for tok in text.lower().split():
            b = md5_13(tok) % CLF_BUCKETS
            total += md5_13(f"clfw:{b}") % CLF_WEIGHT_MOD - CLF_WEIGHT_MOD // 2
        return total

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "spam spam spam spam spam spam",
                "",  # empty doc: score 0, kept
                "a b c d e f g h i j k l m n o p q",
            ],
        }
    )
    out = classifier_score_batch(docs)
    assert out["clf_score"].tolist() == [expected_score(t) for t in docs["text"]]
    assert out["keep"].tolist() == [int(s >= 0) for s in out["clf_score"]]
    assert out["clf_score"].dtype == "int64"


def test_classifier_weights_are_process_stable():
    from ontology_time_machine_ray.stages import textops

    w1 = textops._clf_weights()
    w2 = textops._clf_weights()
    assert w1 is w2  # cached once per process (the per-actor model load)
    assert len(w1) == textops.CLF_BUCKETS
    assert int(w1.min()) >= -1000 and int(w1.max()) <= 1000


def test_dedup_incremental_planted_duplicates(ray_session, tmp_path):
    """Cross-snapshot dedup drops (a) delta docs whose fingerprint exists
    in the base snapshot and (b) later within-delta copies; unique delta
    docs survive; base docs never appear in the output."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import dedup_incremental

    # max doc_id 7 -> split = 4: base = {0..3}, delta = {4..7}
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6, 7],
            "text": [
                "old one",
                "old two",
                "  Shared ACROSS snapshots  ",  # base copy (normalized)
                "old three",
                "shared across snapshots",  # dup of base doc 2 -> dropped
                "fresh delta doc",  # unique -> kept
                "repeated delta",  # first delta copy -> kept
                "repeated delta",  # second delta copy -> dropped
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    out = dedup_incremental(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [5, 6]
    assert out["fingerprint"].str.len().eq(32).all()


def test_media_phash_clusters_identical_images(ray_session, tmp_path):
    """aHash dedup: byte-identical images (and a scaled-up copy with the
    same 8x8 thumbnail pattern) share a hash and cluster together; a
    different image, audio, and corrupt payloads stay out."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.media import MediaAHasher, media_phash_dedup

    def ppm(w, h, fn):
        px = bytes(fn(y, x, c) % 256 for y in range(h) for x in range(w) for c in range(3))
        return f"P6\n{w} {h}\n255\n".encode() + px

    # gradient image, its byte-identical copy, and an 2x-upscaled version
    # (nearest-neighbor thumbnail of the upscale == thumbnail of the base)
    base = ppm(8, 8, lambda y, x, c: 10 + 20 * x + 3 * y)
    double = ppm(16, 16, lambda y, x, c: 10 + 20 * (x // 2) + 3 * (y // 2))
    other = ppm(8, 8, lambda y, x, c: 200 - 25 * x)
    assets = pd.DataFrame(
        {
            "media_ref": [
                "media://t/00000.ppm",
                "media://t/00001.ppm",
                "media://t/00002.ppm",
                "media://t/00003.ppm",
                "media://t/00004.wav",
                "media://t/00005.ppm",
            ],
            "payload": [base, base, double, other, b"RIFFxxxx", b"P6\n99"],
        }
    )
    pq.write_table(pa.Table.from_pandas(assets), str(tmp_path / "assets.parquet"))
    out = media_phash_dedup(str(tmp_path / "assets.parquet")).to_pandas()
    # wav + corrupt ppm skipped
    assert sorted(out["media_ref"]) == [f"media://t/0000{i}.ppm" for i in (0, 1, 2, 3)]
    by_ref = out.set_index("media_ref")
    trio = by_ref.loc[[f"media://t/0000{i}.ppm" for i in (0, 1, 2)]]
    assert trio["cluster_size"].tolist() == [3, 3, 3]
    assert (trio["cluster_rep"] == "media://t/00000.ppm").all()
    assert by_ref.loc["media://t/00003.ppm", "cluster_size"] == 1
    # hash equals an independent scalar recomputation of the base image
    # (all three channels carry the same value, so gray = 3*v // 3)
    vals = np.array(
        [
            [(3 * ((10 + 20 * x + 3 * y) % 256)) // 3 for x in range(8)]
            for y in range(8)
        ]
    )
    bits = (vals > vals.sum() // 64).astype(np.uint64).ravel()
    packed = int((bits << np.arange(64, dtype=np.uint64)).sum())
    assert int(by_ref.loc["media://t/00000.ppm", "ahash_hi"]) == packed >> 32
    assert int(by_ref.loc["media://t/00000.ppm", "ahash_lo"]) == packed & 0xFFFFFFFF


def test_quality_score_zero_token_doc_gets_no_ratio_points():
    """Blank/whitespace docs must not collect the stopword/punctuation
    ratio points through 0>=0 / 0<=0 -- the quality gate exists to drop
    them."""
    out = quality_score_batch(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", "   ", None]})
    )
    assert out["quality"].tolist() == [0, 0, 0]


import pytest


@pytest.mark.parametrize("ids", [["d1", "d2", "d3", "d4"], [1, 2, 3, 4]])
def test_dedup_substrings_vs_naive(ray_session, tmp_path, ids):
    """Keep-first substring cut vs a row-at-a-time Python replay: every
    occurrence of a duplicated n-gram except the corpus-wide first (min
    (doc_id, pos)) covers its n token positions; survivors re-join.
    Parametrized over string AND int64 doc_ids: the shipped corpora use
    BIGINT ids, and an early version of the operator silently dropped
    every cut for int ids (sparse-index NaN alignment promoted the cut
    frame's ids to float64, which hash to different buckets)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.textops import dedup_substrings

    shared = "alpha beta gamma delta"
    docs = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [
                f"{shared} tail one two",          # first occurrence: kept whole
                f"lead in {shared} out",           # dup occurrence: cut
                f"x {shared} y {shared} z",        # two dup occurrences, one doc
                "nothing duplicated here at all",  # untouched
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))
    n = 4
    got = (
        dedup_substrings(str(tmp_path), n=n, min_len=None)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # naive replay
    toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
    occ = {}
    for d in sorted(toks):  # doc_id order = keep-first order
        t = toks[d]
        for i in range(len(t) - n + 1):
            occ.setdefault(" ".join(t[i : i + n]), []).append((d, i))
    cover = {d: set() for d in toks}
    for gram, places in occ.items():
        for d, i in sorted(places)[1:]:  # all but the global first
            cover[d].update(range(i, i + n))
    for d, t in toks.items():
        keep = [w for i, w in enumerate(t) if i not in cover[d]]
        assert got.loc[d, "clean_text"] == " ".join(keep), d
        assert got.loc[d, "n_tokens"] == len(t)
        assert got.loc[d, "n_removed"] == len(t) - len(keep)
    # the planted run was actually cut somewhere
    assert got["n_removed"].sum() > 0
    assert got.loc[ids[0], "n_removed"] == 0  # first occurrence survives


def test_dedup_substrings_maximal_runs(ray_session):
    """Maximal-run (min_len) semantics, Lee et al. 2022 §4.1: a
    duplicated region only comes out when the merged run of covered
    positions reaches ``min_len`` tokens; shorter incidental duplicates
    survive.  One doc carries a LONG (12-token) copy of another doc's
    text plus a SHORT (4-token) copy from a third -- with n=4 and
    min_len=10, the long run is removed, the short one kept, and with
    min_len=None both are removed."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.textops import dedup_substrings

    long_run = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12"  # 12 tokens
    short_dup = "s1 s2 s3 s4"  # 4 tokens
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"{long_run} filler_a filler_b",
                f"{short_dup} other tokens here now",
                f"head {long_run} mid {short_dup} tail",
            ],
        }
    )

    got = (
        dedup_substrings("unused", n=4, min_len=10, docs_ds=rd.from_pandas(docs))
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 3: the 12-token run is removed (>= min_len), the 4-token
    # duplicate survives (its run is < 10)
    assert got.loc[3, "clean_text"] == f"head mid {short_dup} tail"
    assert got.loc[3, "n_removed"] == 12
    assert got.loc[1, "n_removed"] == 0  # first occurrences untouched
    assert got.loc[2, "n_removed"] == 0

    got_all = (
        dedup_substrings("unused", n=4, min_len=None, docs_ds=rd.from_pandas(docs))
        .to_pandas()
        .set_index("doc_id")
    )
    assert got_all.loc[3, "clean_text"] == "head mid tail"
    assert got_all.loc[3, "n_removed"] == 16


def test_dedup_substrings_suffix_array_equivalence(ray_session):
    """With ``n == min_len`` the n-gram restatement is EXACT Lee et al.
    semantics: positions removed = positions inside a duplicated
    substring of length >= min_len whose occurrence is not the
    corpus-wide first.  The reference here is an independent
    suffix-array implementation -- sort all suffixes of each doc's
    token sequence, group window-equal suffixes via the sorted order
    (adjacent suffixes sharing a >= m-token prefix), keep each group's
    global first, cover the rest.  Random small-vocab corpora so
    duplication is dense and runs overlap."""
    import numpy as np
    import ray.data as rd

    from ontology_time_machine_ray.stages.textops import dedup_substrings

    m = 4  # n == min_len: exact semantics
    for seed in (7, 8, 9):
        rng = np.random.RandomState(seed)
        words = [f"w{j}" for j in range(4)]
        n_docs = 10
        texts = [
            " ".join(rng.choice(words, size=rng.randint(0, 14)))
            for _ in range(n_docs)
        ]
        ids = list(range(n_docs))
        docs = pd.DataFrame({"doc_id": ids, "text": texts})
        got = (
            dedup_substrings(
                "unused", n=m, min_len=m, docs_ds=rd.from_pandas(docs)
            )
            .to_pandas()
            .set_index("doc_id")
        )

        # suffix-array reference: every m-token window is a "suffix
        # truncated to m"; sorting them groups equal windows.  Each
        # group's min (doc, pos) is exempt; other members cover
        # [pos, pos+m).  (Runs are automatically >= m, so the run
        # filter is the identity here -- as in the engine.)
        toks = {d: t.split() for d, t in zip(ids, texts)}
        suffixes = []  # (window_tuple, doc, pos)
        for d in ids:
            t = toks[d]
            for i in range(len(t) - m + 1):
                suffixes.append((tuple(t[i : i + m]), d, i))
        suffixes.sort()
        cover: dict[int, set] = {d: set() for d in ids}
        j = 0
        while j < len(suffixes):
            k = j
            while k < len(suffixes) and suffixes[k][0] == suffixes[j][0]:
                k += 1
            group = sorted((d, i) for _, d, i in suffixes[j:k])
            for d, i in group[1:]:
                cover[d].update(range(i, i + m))
            j = k
        for d in ids:
            t = toks[d]
            keep = [w for i, w in enumerate(t) if i not in cover[d]]
            assert got.loc[d, "clean_text"] == " ".join(keep), (seed, d)
            assert got.loc[d, "n_removed"] == len(t) - len(keep), (seed, d)


def test_dup_run_stats_hand_corpus(ray_session):
    """Run statistics vs hand computation: a long shared region forms
    one merged run in BOTH docs (detection is symmetric -- no
    keep-first), an isolated short duplicate its own n-length run, a
    unique doc reports zeros."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.textops import dup_run_stats

    long_run = "r1 r2 r3 r4 r5 r6 r7 r8"  # 8 tokens, n=4 -> one run of 8
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"{long_run} only_here_a only_here_b",
                f"pref {long_run} suff",
                "entirely unique tokens in this one",
            ],
        }
    )
    got = (
        dup_run_stats("unused", n=4, docs_ds=rd.from_pandas(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for d in (1, 2):
        assert got.loc[d, "n_runs"] == 1, d
        assert got.loc[d, "longest_run"] == 8, d
        assert got.loc[d, "covered_tokens"] == 8, d
    assert got.loc[3, "n_runs"] == 0
    assert got.loc[3, "covered_tokens"] == 0
    assert got.loc[1, "n_tokens"] == 10
