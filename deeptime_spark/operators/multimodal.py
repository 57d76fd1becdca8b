"""Multimodal (image/audio/video) column plumbing.

Training-data-pipeline surface (BASELINE.json north star): media as opaque
``binary`` columns with typed metadata structs; decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages. The codec
libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the decode
kernels are STUBBED behind ``DETERMINISTIC_FAKE`` (a seeded hash-derived
payload) or raise NotImplementedError — the Spark-side contract (schema,
batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema contract for media rows: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

# Feature-extraction output: fixed-width embedding per media row.
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

DETERMINISTIC_FAKE = True  # container has no codecs; see module docstring
_FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decode+featurize kernel: a seeded
    RNG keyed on an md5 of the payload (process-salt-free, stable across
    runs and executors — unlike builtin hash())."""
    import hashlib

    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "little")
    return np.random.default_rng(seed).normal(size=dim)


def extract_features(media: DataFrame, dim: int = _FEATURE_DIM) -> DataFrame:
    """media rows -> (media_id, feature array<double>).

    Real pipeline shape: Arrow batches through mapInPandas, one output row
    per input row, payload column dropped immediately after the UDF so the
    (large) binaries never travel further than the decode stage. Swap
    ``_fake_decode`` for a PIL/ffmpeg kernel in a codec-enabled image.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            if not DETERMINISTIC_FAKE:
                raise NotImplementedError("codec libraries unavailable in this container")
            feats = [
                _fake_decode(bytes(p) if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(decode, schema=FEATURE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Planning stage of video frame sampling: one output row per sampled
    timestamp (metadata only — pure JVM sequence/explode; the decode of the
    actual frame joins through ``extract_features`` in a codec image)."""
    n_frames = F.greatest((F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1))
    return (
        video.where(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))
        .select("media_id", "frame_idx", "frame_ts_ms", "mime")
    )


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: fabricate media rows from the documents
    table (payload = utf8 text bytes) so the plumbing has a real input."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
