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

from collections.abc import Callable, Iterator

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
    media: DataFrame,
    dim: int = 8,
    target_rows_per_batch: int = 256,
    feature_kernel: "Callable[[bytes | None, int], list[float]] | None" = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``feature_kernel(payload, dim) -> list[float]`` is the injection seam: a
    PIL/torch-equipped deployment plugs a real decode+embed kernel without
    touching the Spark plumbing (it is pickled into the task closure, so it
    must be a module-level callable). The default is the deterministic
    ``_fake_feature`` byte-histogram — the test/oracle path in this
    container, which has no media libraries. Batch shape, schema and
    partitioning are production-real either way.
    """
    kernel = feature_kernel if feature_kernel is not None else _fake_feature

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
                            lambda p: kernel(p, dim)
                        ),
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_frame(payload: bytes | None, ts_ms: int) -> bytes:
    """STUB frame decode: a real kernel seeks to ``ts_ms`` via ffmpeg and
    returns the encoded frame; this returns a deterministic marker."""
    return bytes(f"frame@{ts_ms}", "utf8")


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    target_rows_per_batch: int = 64,
    frame_kernel: "Callable[[bytes | None, int], bytes] | None" = None,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id, frame_idx,
    ts_ms, frame_payload) rows. ``frame_kernel(payload, ts_ms) -> bytes`` is
    the injection seam for a real ffmpeg decoder; the default ``_fake_frame``
    is a deterministic slice marker, NOT a real decoded frame."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    kernel = frame_kernel if frame_kernel is not None else _fake_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for _, r in pdf.iterrows():
                dur = r["duration_ms"] or 0
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["frame_payload"].append(kernel(r["payload"], ts))
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
