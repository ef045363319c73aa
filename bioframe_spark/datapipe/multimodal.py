"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs. The
Spark-side plumbing — schemas, batching, partition sizing, UDF signatures
— is real and tested; the actual codec calls are STUBBED (the container
has no image/audio libraries) behind ``DecodeUnavailable`` or a
deterministic fake, clearly marked below.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths: codec libraries are not installed."""


def _decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: would call PIL/opencv. Not available in this container."""
    raise DecodeUnavailable("image decode requires PIL/opencv")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake featureizer (stands in for a real embedding
    model): bytes → fixed-dim float vector via chunked byte sums."""
    if payload is None:
        payload = b""
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + byte) % 997
    return [float(v) / 997.0 for v in acc]


def extract_features(df: DataFrame, use_fake: bool = True,
                     batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over media payloads via
    ``mapInPandas`` — the shape a real decode/embed stage would use
    (per-batch model init amortization, binary in / array<float> out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise DecodeUnavailable("real decoders not installed")
            feats = [_fake_feature(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame timestamp)
    without decoding — the explode is pure SQL; the decode of each frame
    would attach via ``extract_features`` on the exploded rows."""
    return df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("meta.duration_ms") / every_ms)
                                            .cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize (stands in for PIL/opencv): deterministic payload
    rescale to width*height bytes by repeat/truncate — keeps batch shape,
    size accounting, and meta propagation real while the codec is fake."""
    if payload is None:
        payload = b""
    target = max(width * height, 1)
    if len(payload) == 0:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_images(df: DataFrame, width: int, height: int,
                  use_fake: bool = True) -> DataFrame:
    """Arrow-batched image resize via ``mapInPandas``: binary in, binary
    out with the meta struct updated to the new dimensions — exactly the
    plumbing a PIL/opencv stage needs (per-batch library init, payload
    size change mid-plan). Non-image rows pass through untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise DecodeUnavailable("real image codecs not installed")
            out_payload, out_meta = [], []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                if r["media_type"] == "image":
                    out_payload.append(_fake_resize(r["payload"], width, height))
                    meta = dict(meta or {})
                    meta["width"], meta["height"] = width, height
                else:
                    out_payload.append(r["payload"])
                out_meta.append(meta)
            pdf = pdf.assign(payload=out_payload, meta=out_meta)
            yield pdf

    return df.mapInPandas(run, MEDIA_SCHEMA)


def audio_chunk_plan(df: DataFrame, window_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: one row per (media, window) without
    decoding — chunk boundaries from metadata only; per-chunk decode
    attaches via ``extract_features`` on the chunk rows."""
    n_chunks = F.greatest(
        F.ceil(F.col("meta.duration_ms") / F.lit(window_ms)).cast("long"),
        F.lit(1),
    )
    return df.filter(F.col("media_type") == "audio").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "meta",
    ).select(
        "media_id", "chunk_idx",
        (F.col("chunk_idx") * window_ms).alias("chunk_start_ms"),
        F.least((F.col("chunk_idx") + 1) * window_ms,
                F.col("meta.duration_ms")).alias("chunk_end_ms"),
    )
