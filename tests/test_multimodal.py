from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from document_extraction_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", "image/png", b"\x89PNG fake bytes here", 64, 64, 0),
        (1, "audio", "audio/wav", bytes(range(256)), 0, 0, 1000),
        (2, "video", "video/mp4", b"", 0, 0, 0),            # empty -> decode_failed
        (3, "image", "image/png", None, 0, 0, 0),           # null  -> decode_failed
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_feature_schema_and_shapes(spark, media):
    out = MM.extract_media_features(media)
    assert out.schema == MM.FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    ok = rows[1]
    assert not ok["decode_failed"]
    assert ok["n_bytes"] == 256
    feats = np.array(ok["features"])
    assert feats.shape == (MM.FEATURE_DIM,)
    assert abs(feats.sum() - 1.0) < 1e-5   # L1-normalized histogram
    # uniform bytes 0..255 -> uniform 16-bin histogram
    assert np.allclose(feats, 1.0 / MM.FEATURE_DIM, atol=1e-6)


def test_decode_failures_flagged_not_crashed(spark, media):
    rows = {r["media_id"]: r for r in MM.extract_media_features(media).collect()}
    assert rows[2]["decode_failed"] and rows[3]["decode_failed"]
    assert rows[0]["decode_failed"] is False


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.real_decode(b"x", "image/png")


def test_resize_shapes_and_failures(spark, media):
    out = {r["media_id"]: r for r in MM.resize_images(media, 8, 8).collect()}
    assert len(out) == 4
    assert len(out[1]["payload"]) == 64
    assert out[1]["decode_failed"] is False
    assert out[2]["decode_failed"] and out[2]["payload"] is None
    assert out[3]["decode_failed"] is True
    # deterministic: same input -> same bytes
    again = {r["media_id"]: r for r in MM.resize_images(media, 8, 8).collect()}
    assert again[1]["payload"] == out[1]["payload"]


def test_frame_sampling_fanout(spark, media):
    frames = MM.sample_frames(media, n_frames=4, frame_bytes=16).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {0, 1}  # empty/null payloads produce no frames
    for mid, rows in by_media.items():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
        assert all(len(r["frame"]) == 16 for r in rows)
    # media 1 has duration 1000ms -> evenly spaced timestamps
    ts = sorted(r["frame_ts_ms"] for r in by_media[1])
    assert ts == [0, 333, 666, 1000]


def test_fake_decode_deterministic():
    s = pd.Series([b"hello world", b"hello world"])
    out = MM.fake_decode_features(s)
    assert list(out["features"][0]) == list(out["features"][1])
