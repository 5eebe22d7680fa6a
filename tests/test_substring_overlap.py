"""MOSS-style substring-overlap pairs (ops.dedup.substring_overlap_pairs)."""

from pyspark.sql import functions as F

from graflo_spark.ops.dedup import (
    minhash_lsh_candidates,
    substring_overlap_pairs,
)

BOILER = (
    "this software is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied warranties "
    "of merchantability and fitness for a particular purpose"
)


def _docs(spark):
    # docs 0 and 1 share the boilerplate paragraph verbatim but their bodies
    # are disjoint vocabularies many times longer -> whole-doc Jaccard is
    # low; docs 2 and 3 share nothing with anyone
    body_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(60))
    body_b = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(60))
    rows = [
        (0, body_a + " " + BOILER),
        (1, BOILER + " " + body_b),
        (2, " ".join(f"eta{i} theta{i}" for i in range(80))),
        (3, " ".join(f"iota{i} kappa{i}" for i in range(80))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_finds_verbatim_overlap_minhash_misses(spark):
    docs = _docs(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in substring_overlap_pairs(
            docs, "doc_id", "text", min_shared=5).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] >= 5
    # whole-document MinHash at a dedup-grade threshold does NOT pair them:
    # the shared span is a small fraction of either document
    cands = minhash_lsh_candidates(docs, "doc_id", "text").filter(
        F.col("est_jaccard") >= 0.5).collect()
    assert cands == []


def test_max_df_drops_universal_boilerplate(spark):
    # every doc shares the boilerplate: with max_df below the corpus size
    # the shared fingerprints are stop-listed and no pair survives
    rows = [(i, BOILER + " " + " ".join(f"w{i}x{j}" for j in range(40)))
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dense = substring_overlap_pairs(
        docs, "doc_id", "text", min_shared=5).count()
    assert dense == 15  # all C(6,2) pairs — the blow-up max_df exists for
    capped = substring_overlap_pairs(
        docs, "doc_id", "text", min_shared=5, max_df=3).count()
    assert capped == 0


def test_winnowing_guarantee_floor(spark):
    # a shared run of exactly k + window - 1 = 10 chars guarantees >= 1
    # shared fingerprint
    docs = spark.createDataFrame(
        [(0, "aaaaaaaaaaaaaaaaaaaaABCDEFGHIJ"), (1, "ABCDEFGHIJzzzzzzzzzzzzzzzzzz")],
        "doc_id long, text string",
    )
    pairs = substring_overlap_pairs(
        docs, "doc_id", "text", min_shared=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
