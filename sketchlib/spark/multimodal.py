"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns next to typed
metadata (the same posture as ``pages.html``). The Spark-side plumbing
— schema contracts, Arrow batch shape, partition-friendly UDF
signatures — is real and tested. Codecs:

- **audio/WAV is REAL** (stdlib ``wave``): ``decode_wav`` parses
  8/16/32-bit PCM to a mono float32 waveform, ``wav_feature_vector``
  reduces it to the 64-dim RMS-energy envelope the feature contract
  specifies. ``encode_wav`` synthesizes fixtures.
- image / video / non-WAV audio remain a clearly-marked stub
  (PIL/ffmpeg are not in this container): ``decode_stub`` raises
  NotImplementedError unless ``fake=True``, which produces a
  deterministic fake decode so downstream plumbing stays exercisable.

At scale: binary payloads dominate bytes, so every operator here
column-prunes before the Python boundary and streams per Arrow batch
(bounded memory ~ batch_rows x max_payload).
"""

from __future__ import annotations

import io
import wave
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


FEATURE_DIM = 64


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono float waveform in [-1, 1] -> 16-bit PCM WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(rate))
        pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
               * 32767.0).astype("<i2")
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL codec: 8/16/32-bit PCM WAV -> mono float32 waveform in [-1,1].

    stdlib ``wave`` only — no external decode libraries needed.
    Multi-channel input is averaged to mono.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return x.astype(np.float32)


def wav_feature_vector(waveform: np.ndarray,
                       n_bins: int = FEATURE_DIM) -> np.ndarray:
    """RMS-energy envelope over ``n_bins`` equal time bins — the 64-dim
    audio feature of the extract_features contract."""
    x = np.asarray(waveform, dtype=np.float32)
    if len(x) == 0:
        return np.zeros(n_bins, dtype=np.float32)
    pad = (-len(x)) % n_bins
    if pad:
        x = np.pad(x, (0, pad))
    return np.sqrt((x.reshape(n_bins, -1).astype(np.float64) ** 2)
                   .mean(axis=1)).astype(np.float32)


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Codec boundary for the kinds WITHOUT a real decoder here
    (image / video / non-WAV audio). Real decode needs PIL/ffmpeg —
    absent in this container; WAV audio has the real ``decode_wav``.

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


def _decode_one(payload: bytes, kind: str, mime: str | None,
                fake: bool) -> np.ndarray:
    """Dispatch: declared-WAV audio -> real codec; everything else ->
    stub. Audio with unknown/missing mime only tries the real decoder
    when the payload self-identifies as RIFF/WAVE — arbitrary audio
    bytes under fake=True must keep flowing through the deterministic
    stub, not die in wave.Error."""
    if kind == "audio":
        is_declared = mime == "audio/wav"
        is_riff = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        if is_declared or (mime is None and is_riff):
            return wav_feature_vector(decode_wav(payload))
    return decode_stub(payload, kind, fake=fake)


def extract_features(df: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload", kind_col: str = "kind",
                     mime_col: str | None = "mime",
                     fake: bool = True) -> DataFrame:
    """(media_id, feature: array<float>[64]) via mapInPandas.

    Streams one Arrow batch of payloads at a time; the decode loop is
    per-item (codecs are inherently per-item) but everything around it
    is batch-shaped. WAV audio decodes for real (``decode_wav`` +
    RMS-envelope features); other kinds go through ``decode_stub``
    (NotImplementedError unless ``fake=True``).
    """
    cols = [F.col(id_col).cast("long").alias("_id"),
            F.col(kind_col).alias("_kind"),
            F.col(payload_col).alias("_payload")]
    has_mime = mime_col is not None and mime_col in df.columns
    if has_mime:
        cols.append(F.col(mime_col).alias("_mime"))
    sel = df.select(*cols)
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mimes = pdf["_mime"] if has_mime else [None] * len(pdf)
            feats = [_decode_one(bytes(p), k, m, fake)
                     for p, k, m in zip(pdf["_payload"], pdf["_kind"], mimes)]
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
    """Deterministic fake media table matching MEDIA_SCHEMA (tests).

    Audio rows carry REAL (tiny) PCM WAV payloads — synthesized sine
    mixtures through ``encode_wav`` — so the real decode path is
    exercised end-to-end; image/video payloads stay opaque bytes for
    the stub path.
    """
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, n)]
    rate = 8000
    rows = []
    for i in range(n):
        k = kinds[i]
        if k == "audio":
            n_samp = int(rng.integers(400, 4000))
            t = np.arange(n_samp) / rate
            f0, f1 = rng.uniform(100, 1000, 2)
            wavef = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * f1 * t)
            payload = encode_wav(wavef, rate)
            dur = int(round(1000 * n_samp / rate))
        else:
            size = int(rng.integers(100, 5000))
            payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
            dur = int(rng.integers(1000, 60000)) if k == "video" else None
        rows.append((i, k, payload,
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[k],
                     int(rng.integers(16, 1920)) if k != "audio" else None,
                     int(rng.integers(16, 1080)) if k != "audio" else None,
                     dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
