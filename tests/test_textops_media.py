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


def test_media_decoder_real_path_is_stubbed():
    dec = MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode("media://x")


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
