"""Deterministic hash sampling / splitting: partition-layout invariance,
split disjointness+stability under corpus growth, rate accuracy."""

import pytest
from pyspark.sql import functions as F

from graflo_spark.ops.sampling import hash_sample, hash_split


def test_hash_sample_layout_invariant_and_rate(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    kept1 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect()}
    # different partitioning, same sample — df.sample() fails this
    kept2 = {r["doc_id"] for r in hash_sample(
        df.repartition(7), "doc_id", 0.3).collect()}
    assert kept1 == kept2
    assert abs(len(kept1) / 20_000 - 0.3) < 0.02  # rate accurate
    # independent salts give different (overlapping-by-chance) samples
    kept3 = {r["doc_id"] for r in hash_sample(
        df, "doc_id", 0.3, salt="other").collect()}
    assert kept3 != kept1

    with pytest.raises(ValueError, match="rate"):
        hash_sample(df, "doc_id", 1.5)


def test_hash_split_disjoint_exhaustive_stable(spark):
    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, "doc_id", w)
    by_split = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_split) == {"train", "val", "test"}
    assert sum(by_split.values()) == 10_000  # exhaustive + disjoint
    assert abs(by_split["train"] / 10_000 - 0.8) < 0.02

    # corpus growth: previously-seen ids keep their split (no test leakage)
    small = {r["doc_id"]: r["split"]
             for r in hash_split(df.filter("doc_id < 1000"), "doc_id", w).collect()}
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(full[i] == s for i, s in small.items())

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", {"a": 0.5, "b": 0.4})


def test_portable_hash_membership_differs_only_in_hash(spark):
    """portable_hash swaps the bucket hash (md5-60bit, SQL-replayable) but
    keeps every contract: layout invariance, disjoint/exhaustive splits,
    and mix proportions from the no-upsampling target."""
    from graflo_spark.ops.sampling import hash_sample, hash_split, mix_corpora

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = hash_sample(df, "doc_id", 0.5, portable_hash=True)
    s2 = hash_sample(df.repartition(13), "doc_id", 0.5, portable_hash=True)
    a = {r["doc_id"] for r in s1.collect()}
    b = {r["doc_id"] for r in s2.collect()}
    assert a == b  # layout-invariant
    assert abs(len(a) - 1000) < 100

    sp = hash_split(df, "doc_id", {"train": 0.8, "val": 0.2},
                    portable_hash=True)
    counts = {r["split"]: r["n"] for r in
              sp.groupBy("split").agg(__import__("pyspark").sql.functions
                                      .count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert abs(counts["train"] - 1600) < 120

    even = df.filter("doc_id % 2 = 0")
    odd = df.filter("doc_id % 2 = 1")
    mixed = mix_corpora({"e": even, "o": odd}, {"e": 0.75, "o": 0.25},
                        "doc_id", portable_hash=True)
    mc = {r["source_name"]: r["n"] for r in
          mixed.groupBy("source_name").agg(
              __import__("pyspark").sql.functions.count("*").alias("n"))
          .collect()}
    # T = min(1000/.75, 1000/.25) = 1333.3: e kept fully-ish, o at ~333
    assert mc["e"] == 1000 and abs(mc["o"] - 333) < 60
