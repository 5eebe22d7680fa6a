"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual inventory lives in :mod:`graflo_spark.catalog` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full star-schema graph build over sf0.001 -> golden
    per-type vertex/edge counts."""
    from graflo_spark.catalog import entry_flagship

    return entry_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graflo_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graflo_spark.catalog import ORACLES

    return dict(ORACLES)
