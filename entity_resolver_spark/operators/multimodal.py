"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partitioning by media type,
Arrow-batched UDF signatures, batch shaping via ``mapInPandas`` — is real and
tested; the actual codec work is STUBBED (this container has no image/audio
libraries): ``decode_stub=True`` produces deterministic fake features,
``decode_stub=False`` raises ``NotImplementedError`` at the seam where a real
decoder (PIL/torchaudio/ffmpeg) plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 64

_FEATURES_SCHEMA = (
    "media_id string, media_type string, n_bytes int, features array<float>"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded pseudo-random
    bytes) for exercising the plumbing."""
    rng = np.random.RandomState(seed)
    rows = []
    types = ["image", "audio", "video"]
    for i in range(n):
        mt = types[i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        meta = (
            (64 + i % 32, 48 + i % 32, None, "png")
            if mt == "image"
            else (None, None, 1000 + i * 10, "opus" if mt == "audio" else "h264")
        )
        rows.append((f"m{i:05d}", mt, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature extraction: hash-seeded pseudo-features.
    Stands in for decode->resize->embed; same shape contract as the real op."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**32)
    return np.random.RandomState(seed).rand(dim).astype(np.float32)


def extract_features(
    media: DataFrame, decode_stub: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """binary payload -> fixed-width feature vector via ``mapInPandas``.

    Batch shape: the function receives Arrow record batches per partition and
    yields same-length pandas frames — the exact seam where a vectorized
    image/audio decoder would run. Partitioning upstream should be by
    ``media_type`` so one task binds one codec (see ``partition_by_type``).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — plug the "
                    "decoder in here; the stub path exercises the plumbing"
                )
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "features": feats,
                }
            )

    return media.mapInPandas(op, schema=_FEATURES_SCHEMA)


_LINEAGE_SCHEMA = (
    "media_id string, media_type string, status string, error string, "
    "attempt int, n_bytes int, features array<float>"
)


def extract_features_with_lineage(
    media: DataFrame, decoder=None, dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode with PER-ROW failure isolation — the reference's C3 pattern
    (embedding failed-request queue with categorized errors + attempt counts,
    /root/reference/src/embedding_and_indexing.py:399-543) applied to the one
    stage here that can fail per item: media decoding. One corrupt payload
    must not kill the task; it becomes a ``status='failed'`` lineage row
    carrying the error class and attempt number, and ``retry_failed``
    re-drives exactly those keys.

    ``decoder`` is the pluggable codec (payload -> feature ndarray); default
    is the deterministic stub. An ``attempt`` column on the input (added by
    ``retry_failed``) is passed through; absent means attempt 1. The per-row
    loop is legitimate at this seam — real decode is per-item C-library work.
    """
    dec = decoder or (lambda p: _fake_decode(p, dim))
    cols = [
        "media_id", "media_type", "status", "error", "attempt", "n_bytes", "features",
    ]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            attempts = pdf["attempt"] if "attempt" in pdf.columns else [1] * len(pdf)
            recs = []
            for mid, mtype, payload, att in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], attempts
            ):
                n_bytes = 0 if payload is None else len(payload)
                try:
                    f = dec(payload)
                    recs.append(
                        (mid, mtype, "ok", None, int(att), n_bytes,
                         [float(x) for x in f])
                    )
                except Exception as exc:  # noqa: BLE001 — the queue wants the class
                    recs.append(
                        (mid, mtype, "failed", f"{type(exc).__name__}: {exc}",
                         int(att), n_bytes, None)
                    )
            yield pd.DataFrame(recs, columns=cols)

    return media.mapInPandas(op, schema=_LINEAGE_SCHEMA)


def retry_failed(
    media: DataFrame,
    lineage: DataFrame,
    decoder=None,
    dim: int = FEATURE_DIM,
    max_attempts: int = 3,
) -> DataFrame:
    """Re-drive ONLY the failed keys below the attempt cap (the reference's
    retry queue consumption, embedding_and_indexing.py:1043-1097 — minus
    wall-clock backoff, which has no batch meaning). Returns fresh lineage
    rows with attempt+1; callers union these over the prior ok rows."""
    todo = lineage.where(
        (F.col("status") == "failed") & (F.col("attempt") < max_attempts)
    ).select("media_id", (F.col("attempt") + 1).alias("attempt"))
    return extract_features_with_lineage(media.join(todo, "media_id"), decoder, dim)


def partition_by_type(media: DataFrame, partitions_per_type: int = 8) -> DataFrame:
    """Repartition so tasks see (almost always) one media_type — codec
    affinity: a task binds one decoder — while keeping
    ``partitions_per_type`` tasks of parallelism per type. Range partitioning
    keeps equal (type, salt) tuples together; only boundary partitions can
    mix types."""
    return media.repartitionByRange(
        3 * partitions_per_type,
        F.col("media_type"),
        F.pmod(F.xxhash64("media_id"), F.lit(partitions_per_type)),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (posexplode over the sampling grid); the frame decode itself is the
    stubbed seam. Demonstrates fan-out shaping for video at scale."""
    video = media.where(F.col("media_type") == "video")
    grid = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return video.select(
        "media_id", F.posexplode(grid).alias("frame_idx", "ts_ms")
    )
