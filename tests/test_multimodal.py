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


def test_fake_decode_deterministic():
    s = pd.Series([b"hello world", b"hello world"])
    out = MM.fake_decode_features(s)
    assert list(out["features"][0]) == list(out["features"][1])
