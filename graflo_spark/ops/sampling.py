"""Deterministic sampling and dataset splitting for training pipelines.

`df.sample()` is seed-stable only for a fixed partitioning — repartition the
input (or rerun after AQE picks a different layout) and the sample changes.
Training-data pipelines need sampling that is a pure function of the ROW, so
the same document lands in the same split on every run, on any cluster
layout, and a re-ingested corpus reproduces its train/val/test membership
exactly. Everything here keys on ``xxhash64(id, salt)``: one JVM-side hash
per row, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hash buckets per unit of rate resolution: rates are exact to 1e-6
_RESOLUTION = 1_000_000


def _bucket(id_col: str, salt: str) -> F.Column:
    """Stable bucket in [0, _RESOLUTION) — a pure function of (id, salt)."""
    return F.pmod(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)),
        F.lit(_RESOLUTION),
    )


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by id: the same id is kept
    or dropped on EVERY run regardless of partitioning, cluster size, or
    Spark version. Different ``salt`` values give independent samples."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    # round, not truncate: int(0.7 * 1e6) is 699999 under binary floats
    return df.filter(_bucket(id_col, salt) < round(rate * _RESOLUTION))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. train/val/test) by
    hash range — disjoint, exhaustive, and reproducible: membership is a
    pure function of (id, salt), so re-running on a regrown corpus keeps
    every previously-seen id in its original split (the property that
    prevents test-set leakage across dataset versions). Weights must sum to
    1 (±1e-6). Returns ``df`` with ``split_col`` added."""
    if not weights:
        raise ValueError("at least one split required")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = _bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        # round, not truncate: float accumulation would drift boundaries
        # one bucket low (int(0.7*1e6) == 699999) and break the exact-to-
        # 1e-6 rate contract
        cond = b < round(acc * _RESOLUTION)
        expr = (
            F.when(cond, F.lit(name)) if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)
