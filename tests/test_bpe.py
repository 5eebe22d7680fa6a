"""Sample-trained BPE (ops.bpe): classic-corpus merges, determinism,
round-trip, distributed encode parity with driver-side encode, and the
tokenizer-accurate packing integration."""

import pytest
from pyspark.sql import functions as F

from graflo_spark.ops.bpe import (
    BpeVocab,
    _encode_word,
    bpe_encode,
    bpe_token_count,
    train_bpe,
)


def _classic(spark):
    # the canonical BPE example corpus: low/lower/newest/widest families
    rows = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_learns_frequent_pairs_and_is_deterministic(spark):
    docs = _classic(spark)
    v1 = train_bpe(docs, "text", num_merges=10)
    v2 = train_bpe(docs, "text", num_merges=10)
    assert v1.merges == v2.merges
    # the classic result: 'es'+'t▁' family merges dominate ('newest' x6 +
    # 'widest' x3 give pair (e,s) count 9, the max)
    assert v1.merges[0] == ("e", "s")
    # every merge's parts are concatenations of earlier symbols
    assert all(isinstance(a, str) and isinstance(b, str)
               for a, b in v1.merges)


def test_encode_round_trip_and_eow(spark):
    docs = _classic(spark)
    vocab = train_bpe(docs, "text", num_merges=20)
    got = {r["id"]: list(r["tokens"])
           for r in bpe_encode(docs, "doc_id", "text", vocab).collect()}
    # round-trip: stripping the end-of-word marker and concatenating
    # reproduces the original token stream
    for i, text in [(0, "low low low low low"), (1, "lower lower"),
                    (2, "newest " * 6), (3, "widest " * 3)]:
        joined = "".join(got[i]).replace("▁", " ").strip()
        assert joined == text.strip()
    # frequent whole words compress to ONE token
    assert got[0].count("low▁") == 5
    assert "newest▁" in got[2]


def test_distributed_encode_equals_driver_encode(spark):
    docs = _classic(spark)
    vocab = train_bpe(docs, "text", num_merges=15)
    ranks = vocab.ranks
    got = {r["id"]: list(r["tokens"])
           for r in bpe_encode(
               docs.repartition(3), "doc_id", "text", vocab).collect()}
    for r in docs.collect():
        want = []
        for w in r["text"].split():
            want.extend(_encode_word(w, ranks))
        assert got[r["doc_id"]] == want


def test_unseen_words_null_text_and_counts(spark):
    vocab = train_bpe(_classic(spark), "text", num_merges=10)
    docs = spark.createDataFrame(
        [(0, "glorp low"), (1, None)], ["doc_id", "text"])
    got = {r["id"]: (list(r["tokens"]), r["n_tok"])
           for r in bpe_encode(docs, "doc_id", "text", vocab).collect()}
    toks0, n0 = got[0]
    assert n0 == len(toks0) and n0 >= 2
    assert "".join(toks0).replace("▁", " ").strip() == "glorp low"
    assert got[1] == ([], 0)


def test_vocab_save_load_and_token_count_feeds_packing(spark, tmp_path):
    from graflo_spark.ops.packing import pack_chunks

    docs = _classic(spark)
    vocab = train_bpe(docs, "text", num_merges=12)
    p = str(tmp_path / "vocab.json")
    vocab.save(p)
    assert BpeVocab.load(p).merges == vocab.merges

    counts = bpe_token_count(docs, "doc_id", "text", vocab)
    spans = pack_chunks(counts, "id", "n_tok", chunk_tokens=4)
    # pack invariants under the BPE counts: per-doc span coverage == n_tok
    per_doc = {r["id"]: r["n_tok"] for r in counts.collect()}
    covered = {
        r["id"]: 0 for r in spans.select("id").distinct().collect()}
    for r in spans.collect():
        covered[r["id"]] += r["doc_tok_end"] - r["doc_tok_start"]
    assert covered == {k: v for k, v in per_doc.items() if v > 0}


def test_sampled_training_is_layout_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v1 = train_bpe(docs, "text", num_merges=30, sample_fraction=0.5)
    v2 = train_bpe(docs.repartition(7), "text", num_merges=30,
                   sample_fraction=0.5)
    assert v1.merges == v2.merges
    assert len(v1.merges) == 30
