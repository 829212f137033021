"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns next to typed
metadata (the same posture as ``pages.html``). The Spark-side plumbing
— schema contracts, Arrow batch shape, partition-friendly UDF
signatures — is real and tested; the *codec* step is a clearly-marked
stub (decode libraries are not in this container): ``decode_stub``
raises NotImplementedError unless ``fake=True``, in which case it
produces a deterministic fake decode so downstream feature plumbing
is exercisable end-to-end.

At scale: binary payloads dominate bytes, so every operator here
column-prunes before the Python boundary and streams per Arrow batch
(bounded memory ~ batch_rows x max_payload).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, LongType,
                               StringType, StructField, StructType)

from sketchlib.core import hashing

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("payload", BinaryType(), False),   # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("width", LongType(), True),        # image/video
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),  # audio/video
])


def media_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Cheap JVM-side metadata: byte length + 64-bit content hash
    (xxhash64, built-in) — never ships the payload to Python."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.xxhash64(F.col(payload_col)).alias("payload_xxh64"))


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Codec boundary. Real decode needs PIL/ffmpeg — absent here.

    ``fake=True`` returns a deterministic pseudo-decode (seeded from the
    payload's own bytes) with the right shape contract:
      image -> float32[64] "pixel stats", audio -> float32[64] "frames",
      video -> float32[64] "frame sample".
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/soundfile/ffmpeg (not in this "
            "container); pass fake=True for the deterministic stub")
    pad = (-len(payload)) % 8
    u = np.frombuffer(payload + b"\x00" * pad, dtype=np.uint64)
    seed = hashing.fold64(u, seed={"image": 1, "audio": 2, "video": 3}.get(kind, 0))
    rng = np.random.default_rng(seed & 0xFFFFFFFF)
    return rng.standard_normal(64).astype(np.float32)


def extract_features(df: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload", kind_col: str = "kind",
                     fake: bool = True) -> DataFrame:
    """(media_id, feature: array<float>[64]) via mapInPandas.

    Streams one Arrow batch of payloads at a time; the decode loop is
    per-item (codecs are inherently per-item) but everything around it
    is batch-shaped, so swapping ``decode_stub`` for a real codec is a
    one-line change.
    """
    sel = df.select(F.col(id_col).cast("long").alias("_id"),
                    F.col(kind_col).alias("_kind"),
                    F.col(payload_col).alias("_payload"))
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [decode_stub(bytes(p), k, fake=fake)
                     for p, k in zip(pdf["_payload"], pdf["_kind"])]
            yield pd.DataFrame({"media_id": pdf["_id"].to_numpy(),
                                "feature": feats})

    return sel.mapInPandas(fn, schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Deterministic frame-sampling plan for video rows: one output row
    per sampled timestamp (JVM-side sequence explode; the decode of
    each sampled frame is the stubbed step)."""
    vids = df.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                             F.lit(int(every_ms)))).alias("sample_ms"))


def make_fake_media(spark, n: int = 300, seed: int = 5):
    """Deterministic fake media table matching MEDIA_SCHEMA (tests)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        size = int(rng.integers(100, 5000))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        k = kinds[i]
        rows.append((i, k, payload,
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[k],
                     int(rng.integers(16, 1920)) if k != "audio" else None,
                     int(rng.integers(16, 1080)) if k != "audio" else None,
                     int(rng.integers(1000, 60000)) if k != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
