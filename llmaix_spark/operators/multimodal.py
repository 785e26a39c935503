"""Multimodal column plumbing: opaque binary media + typed metadata.

The reference's only non-text modality is PDF/image OCR
(webapp/input_processing/routes.py:398-495 — page rasterize → tesseract/
surya subprocess). The Spark-native generalization treats any media as an
opaque `binary` column with a typed metadata struct, processed by
Arrow-batched `mapInPandas` stages:

  decode_media     bytes → features  (REAL plumbing, STUBBED codec: the
                   image/audio libraries aren't in this container, so the
                   decoder is a deterministic fake keyed on content bytes;
                   swap `_decode_one` for PIL/librosa in production)
  frame_sample     deterministic frame/offset sampling plan (pure exprs)

Schema, batch shape, partitioning and UDF signatures are real and tested;
only the codec call is fake — clearly marked below.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

FEATURE_DIM = 8


def _decode_one(payload: bytes, kind: str) -> list[float]:
    """STUB CODEC — deterministic fake feature extraction.

    Production swaps this for a real decoder (PIL.Image.open /
    soundfile.read / pyav frame grab). The container has none of those
    libs, so features are derived from a content digest: stable, testable
    plumbing with zero external deps. Raises ValueError on empty payload
    so the error-isolation path (one bad row never kills the batch —
    reference webapp/llm_processing/routes.py:955-960) stays exercised.
    """
    if not payload:
        raise ValueError(f"empty {kind} payload")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_media(media: DataFrame) -> DataFrame:
    """binary media table → per-item features via mapInPandas.

    Real Spark plumbing: Arrow batches of (media_id, kind, payload),
    row-level error isolation, explicit output schema. Repartition by a
    hash of media_id upstream if payload sizes are skewed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "kind": [],
                "n_bytes": [],
                "content_hash": [],
                "feature": [],
                "decode_error": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(raw))
                out["content_hash"].append(
                    hashlib.sha256(raw).hexdigest()[:16]
                )
                try:
                    out["feature"].append(_decode_one(raw, kind))
                    out["decode_error"].append(None)
                except Exception as e:  # row-level isolation
                    out["feature"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Deterministic frame-sampling plan for video rows: pure column
    exprs emitting (media_id, frame_idx, offset_ms) — the work list a
    downstream decode_media-style stage would consume."""
    # clamp malformed negative durations to 0 BEFORE the floor — a
    # negative n would make sequence(0, n-1) DESCEND (landmine #3) and
    # emit frames at negative offsets
    dur = F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(0))
    n = F.least(
        F.floor(dur / every_ms) + 1,
        F.lit(max_frames),
    ).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n - 1),
                    lambda i: i * F.lit(every_ms),
                )
            ).alias("frame_idx", "offset_ms"),
        )
    )
