"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs. The
Spark-side plumbing — schemas, batching, partition sizing, UDF
signatures — is real and tested. Codecs are injectable engines:
``wav_feature_engine`` is a REAL stdlib audio decoder (works
everywhere), ``pil_image_engine``/``pil_resize_engine`` are real
optional-import Pillow codecs (DecodeUnavailable when absent), and the
deterministic fakes remain the dependency-free default.
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


# --------------------------------------------------------------------------
# codec engines — the injectable boundary (mirrors the indexed readers'
# pysam_tabix_engine pattern, ``sources/fileops.py``): an engine is a
# plain callable shipped to executors by cloudpickle; real libraries are
# imported INSIDE the closure (per-executor), availability is checked at
# engine CONSTRUCTION (driver-side, fail fast).
#   feature engine: (payload: bytes, media_type: str, meta) -> list[float]
#   resize engine:  (payload: bytes, width: int, height: int) -> bytes
# --------------------------------------------------------------------------

def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake featureizer (stands in for a real embedding
    model): bytes → fixed-dim float vector via chunked byte sums."""
    if payload is None:
        payload = b""
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + byte) % 997
    return [float(v) / 997.0 for v in acc]


def fake_feature_engine(dim: int = 8):
    """Default engine: deterministic byte-sum vectors for any payload."""
    def run(payload, media_type, meta):
        return _fake_feature(payload, dim)
    return run


def wav_feature_engine(dim: int = 8):
    """REAL audio codec (stdlib ``wave`` — no optional deps): decode a
    WAV payload and emit per-slice RMS energy over ``dim`` equal time
    slices, normalized to [0, 1]. 16-bit PCM only (the overwhelmingly
    common WAV encoding); anything else raises DecodeUnavailable so
    callers can fall back."""
    def run(payload, media_type, meta):
        import io
        import math
        import struct
        import wave

        try:
            with wave.open(io.BytesIO(payload or b"")) as w:
                sw, nch = w.getsampwidth(), w.getnchannels()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError, struct.error, ValueError, OSError) as e:
            # a corrupt header can raise from readframes too, not just open
            raise DecodeUnavailable(f"not a WAV payload: {e}")
        if sw != 2:
            raise DecodeUnavailable(f"only 16-bit PCM supported, got {sw*8}-bit")
        if len(raw) % 2:
            raise DecodeUnavailable("corrupt WAV: odd-length 16-bit data chunk")
        try:
            # truncated data chunks can fail here, not at open
            samples = struct.unpack(f"<{len(raw) // 2}h", raw)
        except struct.error as e:
            raise DecodeUnavailable(f"corrupt WAV data chunk: {e}")
        if nch > 1:  # mixdown: mean over channels per frame
            samples = [sum(samples[i:i + nch]) / nch
                       for i in range(0, len(samples) - nch + 1, nch)]
        n = len(samples)
        if n == 0:
            return [0.0] * dim
        out = []
        for k in range(dim):
            lo, hi = k * n // dim, max((k + 1) * n // dim, k * n // dim + 1)
            sl = samples[lo:min(hi, n)] or [0]
            rms = math.sqrt(sum(s * s for s in sl) / len(sl))
            out.append(min(rms / 32768.0, 1.0))
        return out
    return run


def pil_image_engine(dim: int = 8):
    """REAL image codec (optional-import PIL): decode, grayscale,
    resize to ``dim`` pixels, emit normalized intensities. Raises
    DecodeUnavailable at construction when PIL is not installed —
    driver-side fail-fast, like the pysam engine constructors."""
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        raise DecodeUnavailable("pil_image_engine requires Pillow")

    def run(payload, media_type, meta):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload or b"")).convert("L")
        img = img.resize((dim, 1))
        return [p / 255.0 for p in img.getdata()]
    return run


def extract_features(df: DataFrame, use_fake: bool = True,
                     batch_hint: int = 1024, engine=None) -> DataFrame:
    """Arrow-batched feature extraction over media payloads via
    ``mapInPandas`` — the shape a real decode/embed stage uses (per-batch
    engine reuse, binary in / array<float> out).

    ``engine``: a feature engine callable (see module header). Default:
    ``fake_feature_engine()`` when ``use_fake`` (deterministic, no
    codec deps), else ``pil_image_engine()`` (raises DecodeUnavailable
    if Pillow is absent). ``wav_feature_engine()`` is a real stdlib
    audio decoder available everywhere."""
    if engine is None:
        engine = fake_feature_engine() if use_fake else pil_image_engine()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                engine(p, t, m)
                for p, t, m in zip(pdf["payload"], pdf["media_type"],
                                   pdf["meta"])
            ]
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
    """Fake resize engine (stands in for PIL/opencv): deterministic
    payload rescale to width*height bytes by repeat/truncate — keeps
    batch shape, size accounting, and meta propagation real while the
    codec is fake."""
    if payload is None:
        payload = b""
    target = max(width * height, 1)
    if len(payload) == 0:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def pil_resize_engine(fmt: str = "PNG"):
    """REAL image resize (optional-import PIL); raises DecodeUnavailable
    at construction when Pillow is absent."""
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        raise DecodeUnavailable("pil_resize_engine requires Pillow")

    def run(payload, width, height):
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload or b""))
        out = io.BytesIO()
        img.resize((width, height)).save(out, format=img.format or fmt)
        return out.getvalue()
    return run


def resize_images(df: DataFrame, width: int, height: int,
                  use_fake: bool = True, engine=None) -> DataFrame:
    """Arrow-batched image resize via ``mapInPandas``: binary in, binary
    out with the meta struct updated to the new dimensions — exactly the
    plumbing a PIL/opencv stage needs (per-batch library init, payload
    size change mid-plan). Non-image rows pass through untouched.

    ``engine``: a resize engine ``(payload, width, height) -> bytes``.
    Default: the deterministic fake when ``use_fake``, else
    ``pil_resize_engine()``."""
    if engine is None:
        engine = _fake_resize if use_fake else pil_resize_engine()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                if r["media_type"] == "image":
                    out_payload.append(engine(r["payload"], width, height))
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
