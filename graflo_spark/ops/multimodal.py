"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature kernels are STUBBED (image/audio libs are not in this
container — each raises NotImplementedError or produces a deterministic
fake, clearly marked). The Spark-side plumbing is real and tested: schemas,
Arrow batch shapes, mapInPandas signatures, partition sizing.

At 100 TB: binary payloads dominate partition size — ``target_rows_per_batch``
keeps Arrow batches bounded, and callers should set
``spark.sql.files.maxPartitionBytes`` so one partition's payloads fit in
executor memory.
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
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image(payload: bytes) -> "object":  # pragma: no cover - stub
    """STUB: real implementation would be PIL/opencv decode."""
    raise NotImplementedError("image decode requires PIL/opencv (not in container)")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector (byte histogram folds) so the
    plumbing is testable without media libraries."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload[:4096]):
        acc[i % dim] += b
    total = max(sum(acc), 1)
    return [a / total for a in acc]


def extract_features(
    media: DataFrame, dim: int = 8, target_rows_per_batch: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real decode is stubbed behind `_fake_feature` (marked); batch shape,
    schema and partitioning are production-real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": chunk["payload"].map(
                            lambda p: len(p) if p is not None else 0
                        ),
                        "feature": chunk["payload"].map(
                            lambda p: _fake_feature(p, dim)
                        ),
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, target_rows_per_batch: int = 64
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id, frame_idx,
    ts_ms, frame_payload) rows. Decode is stubbed: frame payload is a
    deterministic slice marker, NOT a real decoded frame."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for _, r in pdf.iterrows():
                dur = r["duration_ms"] or 0
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    # STUB: a real impl decodes the frame at ts via ffmpeg
                    rows["frame_payload"].append(bytes(f"frame@{ts}", "utf8"))
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=schema)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8"
        ).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("id") % 5 * 1000).cast("long").alias("duration_ms"),
    )
