"""Bigram-LM quality scoring (ops.lm): hand-computed probabilities,
in-domain vs gibberish separation, short-doc behavior."""

import math

from pyspark.sql import functions as F

from graflo_spark.ops.lm import lm_cross_entropy, train_bigram_lm


def test_lm_hand_computed_probabilities(spark):
    # training slice = doc 0 only (0 % 20 == 0): "a b a b a"
    docs = spark.createDataFrame(
        [(0, "a b a b a"), (1, "a b"), (2, "b a"), (3, "z z")],
        ["doc_id", "text"])
    lm = train_bigram_lm(docs, "doc_id", "text")
    # training bigrams: (a,b) x2, (b,a) x2; unigram histories a:2... wait
    # w1 counts: a appears as history in (a,b),(a,b) -> 2? positions:
    # a b a b a -> pairs (a,b),(b,a),(a,b),(b,a): c(a,*)=2, c(b,*)=2
    # vocab {a, b} -> v = 3
    assert lm.v == 3
    got = {r["id"]: (r["n_bigrams"], r["cross_entropy"])
           for r in lm_cross_entropy(docs, "doc_id", "text", lm).collect()}
    p_ab = (2 + 1) / (2 + 3)       # seen bigram
    p_zz = (0 + 1) / (0 + 3)       # fully OOV
    assert got[1] == (1, -math.log(p_ab))
    assert abs(got[2][1] - -math.log((2 + 1) / (2 + 3))) < 1e-12
    assert abs(got[3][1] - -math.log(p_zz)) < 1e-12
    # gibberish scores strictly worse than in-domain text
    assert got[3][1] > got[1][1]


def test_lm_separates_prose_from_shuffled_corpus(spark, sf_dir):
    """On the shipped corpus: in-domain documents score lower than the
    same documents with tokens REVERSED (destroying bigram statistics
    while keeping the unigram distribution identical)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = train_bigram_lm(docs, "doc_id", "text")
    fwd = lm_cross_entropy(docs, "doc_id", "text", lm)
    rev_docs = docs.select(
        "doc_id",
        F.array_join(F.reverse(F.split(F.trim("text"), r"\s+")), " ")
        .alias("text"))
    rev = lm_cross_entropy(rev_docs, "doc_id", "text", lm)
    f_avg = fwd.agg(F.avg("cross_entropy")).first()[0]
    r_avg = rev.agg(F.avg("cross_entropy")).first()[0]
    assert f_avg < r_avg  # real word order is more predictable


def test_lm_short_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "one"), (2, None), (3, "")],
        ["doc_id", "text"])
    lm = train_bigram_lm(docs, "doc_id", "text")
    ids = {r["id"] for r in
           lm_cross_entropy(docs, "doc_id", "text", lm).collect()}
    assert ids == {0}  # <2 tokens / NULL / empty emit no row


def test_ccnet_buckets_exact_and_approx(spark, sf_dir):
    """Equal-size tiers in exact mode; approx mode agrees on ~all
    assignments (sketch boundaries); head tier scores below tail."""
    from graflo_spark.ops.lm import ccnet_quality_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = train_bigram_lm(docs, "doc_id", "text")
    exact = ccnet_quality_buckets(docs, "doc_id", "text", lm)
    sizes = {r["bucket"]: r["n"] for r in
             exact.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # equal tiers
    means = {r["label"]: r["m"] for r in exact.groupBy("label").agg(
        F.avg("cross_entropy").alias("m")).collect()}
    assert means["head"] < means["middle"] < means["tail"]

    approx = ccnet_quality_buckets(docs, "doc_id", "text", lm, exact=False)
    both = exact.select("id", F.col("bucket").alias("b1")).join(
        approx.select("id", F.col("bucket").alias("b2")), "id")
    agree = both.filter(F.col("b1") == F.col("b2")).count() / both.count()
    assert agree > 0.95


def test_ccnet_buckets_frozen_cuts_replay(spark):
    """cuts=... skips the sketch and buckets by the given literals — the
    replay mode the catalog's approx driver branch runs; wrong arity is
    rejected."""
    import pytest

    from graflo_spark.ops.lm import ccnet_quality_buckets

    docs = spark.createDataFrame(
        [(i, " ".join(str((i * 7 + j) % 5) for j in range(20)))
         for i in range(40)],
        ["doc_id", "text"])
    lm = train_bigram_lm(docs, "doc_id", "text", train_mod=4)
    scored = ccnet_quality_buckets(
        docs, "doc_id", "text", lm, exact=False, cuts=[1.0, 2.0])
    rows = scored.collect()
    for r in rows:
        want = 1 + (r["cross_entropy"] > 1.0) + (r["cross_entropy"] > 2.0)
        assert r["bucket"] == want
    with pytest.raises(ValueError, match="2 cuts"):
        ccnet_quality_buckets(
            docs, "doc_id", "text", lm, exact=False, cuts=[1.0])
