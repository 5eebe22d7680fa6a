"""SparkSession factory tuned for both local testing and large-cluster use.

All knobs default to scale-safe values: AQE on (runtime re-planning, skew-join
handling), adaptive coalescing of shuffle partitions, and arrow-accelerated
Python interop for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "graflo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Runtime re-planning: coalesce small shuffle partitions, split skewed
        # ones, convert SMJ->broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for the Pandas-UDF escape hatches.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark has no ns-precision timestamp: surface parquet TIMESTAMP(NANOS)
        # as a long (epoch nanos); readers convert via timestamp_micros(ns/1000).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Whole-stage-codegen compile cache (r14, guide §1.2 step 3 "configs
        # ... fix a stability problem"). The default cache holds only 100
        # compiled fragments; a session that runs the full operator surface
        # (the bench alone compiles several hundred distinct fragments)
        # thrashes it, and every eviction re-pays a Janino compile ON the
        # first task that needs the fragment — measured on this box as
        # 10-50 s stalls landing on RANDOM queries once the working set
        # exceeded 100 (driver jstack: task thread RUNNABLE inside
        # org.codehaus.janino.UnitCompiler for 53 s; bench totals decayed
        # 43→166→233 s run-to-run). Entries are compiled classes keyed by
        # source text — a few KB each, bounded memory.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
        # JIT code cache: the JVM default (240 MB) fills under the same
        # churn (C2 had burned 21.7 s CPU 66 s into the bench JVM with the
        # sweeper running hot), which is what makes each Janino compile
        # slow in the first place. 512 MB removes the sweep pressure:
        # first-run bench total 106 s → 57 s with everything else equal.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
