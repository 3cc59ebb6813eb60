"""Multimodal column plumbing: image/audio/video as opaque binary.

Design for a 100 TB media corpus:
- media rows carry `payload: binary` + typed metadata (kind, n_bytes,
  sha256); large payloads stay columnar in parquet and are never
  collected to the driver;
- decode / feature-extract run as `mapInPandas` over Arrow batches:
  each task decodes its partition's payloads vectorized, emitting a
  fixed-schema feature frame — the partitioning (and therefore the
  shuffle story) is identical to any other column op;
- the actual codec step is STUBBED in this sandbox (no image/audio
  libs baked in): `decode_features(..., fake=True)` produces a
  deterministic byte-hash "feature" vector so the Spark-side schema,
  batching, and partition plumbing are real and tested;
  `fake=False` raises NotImplementedError where a real
  PIL/torchaudio/ffmpeg call would go.

The reference treats every payload as JSON text (no binary columns);
this is training-pipeline surface beyond it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_text(df: DataFrame, id_col: str, text_col: str, kind: str = "text") -> DataFrame:
    """Wrap a text column as a media table (utf-8 payload bytes) —
    the sandbox stand-in for real image/audio ingestion. All metadata
    computed JVM-side."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature: bytes of sha512(payload) scaled
    to [-1, 1). Stable across runs/engines."""
    h = hashlib.sha512(payload or b"").digest()
    raw = (h * ((dim // len(h)) + 1))[:dim]
    return [(b - 128) / 128.0 for b in raw]


def decode_features(
    media: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """Decode payloads into fixed-dim feature vectors via mapInPandas
    (Arrow-batched; one Python worker pass per partition, no per-row
    round trips). `fake=False` is the real-codec slot."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real codecs (PIL/torchaudio/ffmpeg) not available in "
                    "this sandbox; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": [_fake_feature(p, dim) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    stubs (media_id, frame_idx) without decoding — the shuffle-free
    fan-out a real sampler would feed. Decode itself is the stubbed
    step above."""
    n_frames = (F.col("n_bytes") / F.lit(1000)).cast("int") + 1  # fake duration proxy
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
