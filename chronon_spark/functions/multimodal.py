"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched `mapInPandas` stages.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this environment, so the
actual byte→pixels/samples step is stubbed: `decoder="fake"` derives
deterministic features from the bytes' digest (making the full Spark plumbing
— schema, partitioning, batch iteration, UDF signatures — real and testable),
while `decoder="real"` raises NotImplementedError at the exact call site a
deployment would plug PIL/librosa into.

Scale notes: binary payloads dominate I/O — `mapInPandas` keeps them off the
driver and inside Arrow batches; `spark.sql.files.maxPartitionBytes` and
`arrow.maxRecordsPerBatch` bound batch memory; feature extraction is
embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
    ]
)


def synth_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{kind}:{i}".encode()).digest() * 8  # 256 bytes
        rows.append((i, kind, bytearray(payload), (64, 48, 16000, 100, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: tile the digest of the
    payload's hex into a (h, w) float array in [0, 1). Hashing the HEX text
    (not the raw bytes) keeps the whole chain replayable by a SQL oracle —
    DuckDB's sha256 takes VARCHAR only."""
    d = hashlib.sha256(payload.hex().encode()).digest()
    base = np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 256.0
    return np.resize(base, (h, w))


def extract_image_features(
    media: DataFrame, resize_to: tuple[int, int] = (8, 8), decoder: str = "fake"
) -> DataFrame:
    """decode → resize (mean-pool) → flatten to a feature vector.

    `mapInPandas` streams Arrow batches; each batch decodes vectorized-ish in
    numpy. The `real` decoder is the single plug-point for PIL.
    """
    out_w, out_h = resize_to

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ids = [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if decoder == "real":
                    raise NotImplementedError(
                        "plug PIL.Image.open(io.BytesIO(payload)) here; "
                        "decode libs are not available in this environment"
                    )
                w = int(meta["width"] or 64) if meta is not None else 64
                h = int(meta["height"] or 48) if meta is not None else 48
                img = _fake_decode(bytes(payload), w, h)
                # mean-pool resize to (out_h, out_w)
                ph, pw = h // out_h, w // out_w
                pooled = img[: ph * out_h, : pw * out_w].reshape(out_h, ph, out_w, pw).mean(axis=(1, 3))
                feats.append(pooled.ravel().astype(np.float32))
                ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "feat": [list(map(float, f)) for f in feats],
                    "out_width": out_w,
                    "out_height": out_h,
                }
            )

    return media.mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index.
    Frame decode itself is the stubbed step; the explode/partition shape is
    the real thing (this is where 100 TB of video fans out ~frames/every_n×)."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
