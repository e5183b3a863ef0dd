"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition shape, Arrow batch signatures) is
real and tested; the actual media decoding is STUBBED because no image/audio
libraries exist in this container. Each decoder seam is a module-level
callable you replace in production (e.g. with PIL / torchaudio / pyav);
the deterministic fake lets the distributed plumbing be exercised in tests.

Design for 100 TB of media:
- binary columns stay opaque until the LAST moment (no decode in shuffles);
- all per-item work runs in `mapInPandas` — Arrow batches of bytes in,
  Arrow batches of features out, never per-row Python overhead;
- feature extraction emits fixed-size float arrays so downstream similarity
  ops (operators/similarity.py) apply unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes | None) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hashes bytes into a
    FEATURE_DIM float vector. Replace via set_decoder() in production."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    for i in range(FEATURE_DIM):
        out[i] = float(arr[i::FEATURE_DIM].sum() % 997) / 997.0
    return out.astype(np.float32)


_DECODER: Callable[[bytes | None], np.ndarray] = _fake_decode


def set_decoder(fn: Callable[[bytes | None], np.ndarray]) -> None:
    """Install a real decoder (PIL/librosa/…). Must return FEATURE_DIM
    float32 features per payload."""
    global _DECODER
    _DECODER = fn


def real_decode_unavailable(*_a, **_k):
    raise NotImplementedError(
        "media decoding libraries (PIL/librosa/pyav) are not installed in "
        "this environment; install one and call set_decoder()"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """media table → (media_id, kind, features: array<float>).

    One mapInPandas over the payload column: Arrow ships binary batches to
    Python, vectorized numpy per batch, fixed-size feature arrays out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_DECODER(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    schema = "media_id long, kind string, features array<float>"
    return df.select("media_id", "kind", "payload").mapInPandas(batches, schema)


def validate_media(df: DataFrame) -> DataFrame:
    """Cheap structural checks that DON'T decode: payload present, mime
    sane for kind, dims/duration present where the kind requires them.
    Pure Column exprs — rides the scan."""
    checks = [
        F.when(F.col("payload").isNull(), F.lit("not_null:payload")),
        F.when(
            (F.col("kind") == "image")
            & (F.col("width").isNull() | F.col("height").isNull()),
            F.lit("image_dims_missing"),
        ),
        F.when(
            F.col("kind").isin("audio", "video") & F.col("duration_ms").isNull(),
            F.lit("duration_missing"),
        ),
        F.when(
            F.col("mime").isNotNull()
            & ~F.col("mime").rlike("^(image|audio|video)/[a-z0-9.+-]+$"),
            F.lit("bad_mime"),
        ),
    ]
    return df.withColumn("_violations", F.array_compact(F.array(*checks)))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp.
    The decode of each frame is the stubbed seam; the row explosion and
    partition shape (what actually matters for cluster sizing) are real."""
    # one frame per every_ms tick strictly before the end of the video
    n_frames = F.ceil(F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        df.filter((F.col("kind") == "video") & (F.coalesce("duration_ms", F.lit(0)) > 0))
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )
