"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched kernels over ``mapInPandas``.

The decode step itself is **stubbed** (this container has no image/audio
libraries — see the task brief): :func:`fake_decode_features` is a
deterministic byte-level feature extractor standing in for a real
PIL/ffmpeg decode. Everything around it — schema, batch shape, partitioning,
UDF signature — is the real production plumbing, and is tested.

This is the engine's generalization of the reference's page-image path
(/root/reference/src/pdf_extractor/extractor.py:21-32: PDF -> PNG bytes list);
here one row = one media object, metadata typed instead of implicit.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),      # opaque encoded bytes
        T.StructField("width", T.IntegerType()),       # typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("decode_failed", T.BooleanType()),
    ]
)


def real_decode(payload: bytes, mime: str):
    """Placeholder for the real decode (PIL.Image.open / av.open). The
    container ships no media libs; production swaps this in unchanged —
    the Spark plumbing does not move."""
    raise NotImplementedError("media codecs not available in this environment")


def fake_decode_features(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in 'decode + feature extraction': a 16-bin byte
    histogram over the payload, L1-normalized. Vectorized with NumPy over the
    whole Arrow batch (no per-row Python beyond the buffer view)."""
    feats = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    n_bytes = np.zeros(len(payloads), dtype=np.int64)
    failed = np.zeros(len(payloads), dtype=bool)
    for i, buf in enumerate(payloads):
        if buf is None or len(buf) == 0:
            failed[i] = True
            continue
        arr = np.frombuffer(buf, dtype=np.uint8)
        n_bytes[i] = arr.size
        hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
        feats[i] = hist / max(arr.size, 1)
    return pd.DataFrame(
        {
            "n_bytes": n_bytes,
            "features": [row for row in feats],
            "decode_failed": failed,
        }
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table -> per-object feature rows, Arrow-batched."""
    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(media.sparkSession)

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = fake_decode_features(pdf["payload"])
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[[f.name for f in FEATURES_SCHEMA.fields]]

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(kernel, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("decode_failed", T.BooleanType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize plumbing (stub decode): the production kernel decodes
    with PIL and re-encodes; the stand-in deterministically resamples the
    raw byte stream to ``width*height`` bytes so batch shape, schema, and
    partition behavior are the real thing."""

    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(media.sparkSession)

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            m = len(pdf)
            payloads = pdf["payload"].tolist()
            lens = np.fromiter(
                (0 if b is None else len(b) for b in payloads), np.int64, m
            )
            failed = lens == 0
            out_payload: list = [None] * m
            # vectorize across ROWS, grouped by payload length: rows of the
            # same length share one gather index, so the resample is a single
            # 2-D fancy-index per length group instead of per-row Python
            for length in np.unique(lens[~failed]):
                rows = np.nonzero(lens == length)[0]
                idx = np.linspace(0, length - 1, n).astype(np.int64)
                mat = np.frombuffer(
                    b"".join(payloads[i] for i in rows), dtype=np.uint8
                ).reshape(len(rows), length)
                resampled = mat[:, idx]
                for j, i in enumerate(rows):
                    out_payload[i] = resampled[j].tobytes()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": np.full(m, width, dtype=np.int32),
                    "height": np.full(m, height, dtype=np.int32),
                    "payload": out_payload,
                    "decode_failed": failed,
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Video frame sampling plumbing (stub decode): emits ``n_frames``
    evenly-spaced byte windows per media object with synthetic timestamps —
    a 1->N row fan-out through mapInPandas, the same plan shape as a real
    ffmpeg-backed sampler."""

    from document_extraction_spark.session import ensure_worker_package

    ensure_worker_package(media.sparkSession)

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                if buf is None or len(buf) < frame_bytes:
                    continue
                step = max((len(buf) - frame_bytes) // max(n_frames - 1, 1), 1)
                for i in range(n_frames):
                    off = min(i * step, len(buf) - frame_bytes)
                    ts = int(dur) * i // max(n_frames - 1, 1) if dur else 0
                    rows.append((mid, i, ts, bytes(buf[off:off + frame_bytes])))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"]
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )


def synth_media_df(spark, documents: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic fake media table from the documents corpus:
    payload bytes = utf-8 of the text (opaque to the pipeline)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).alias("height").cast("int"),
        F.lit(0).cast("long").alias("duration_ms"),
    )
