"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition up when the scan has fewer partitions than cores.

    Single-row-group parquet files are unsplittable, so a small benchmark
    input arrives as ONE task and per-row-heavy operators (shingling, token
    hashing) serialize on a single core. At production scale the input is
    already parallel and this is a no-op — the check costs only plan
    translation, no job.
    """
    sc = df.sparkSession.sparkContext
    # On a cluster the input is already parallel — skip even the partition
    # probe: df.rdd forces a plan conversion per call, a measurable tax on
    # microsecond-sensitive composition paths.
    if not sc.master.startswith("local"):
        return df
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
