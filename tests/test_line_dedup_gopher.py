"""Corpus-wide line dedup (ops/dedup.dedup_lines — C4/Dolma scrub) and the
Gopher quality rule set (ops/textstats.gopher_quality_rules)."""

from pyspark.sql import functions as F

from graflo_spark.ops.dedup import dedup_lines
from graflo_spark.ops.textstats import gopher_quality_rules


def test_dedup_lines_keeps_first_occurrence_corpus_wide(spark):
    docs = [
        (0, "alpha beta\ncommon line\ngamma"),
        (1, "delta\ncommon line\nepsilon\n\nzeta"),
        (2, "common line"),
        (3, None),
        (4, "unique\n\nanother"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    # doc 0 owns "common line" (smallest (id, pos)); later copies vanish
    assert out[0] == "alpha beta\ncommon line\ngamma"
    assert out[1] == "delta\nepsilon\n\nzeta"
    assert out[2] == ""          # fully-duplicated doc -> empty, not dropped
    assert out[3] is None        # NULL passes through
    assert out[4] == "unique\n\nanother"
    # blank lines are structure: both docs keep theirs despite "duplication"
    assert "\n\n" in out[1] and "\n\n" in out[4]


def test_dedup_lines_portable_matches_production_hash(spark):
    docs = [(i, f"line a\nline {i % 3}\nline b") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fast = {r["doc_id"]: r["text"] for r in dedup_lines(df).collect()}
    port = {r["doc_id"]: r["text"]
            for r in dedup_lines(df, portable_hash=True).collect()}
    assert fast == port
    # owner semantics: doc 0 keeps everything, doc 1 and 2 keep only their
    # first-novel middle line, docs 3+ keep nothing
    assert fast[0] == "line a\nline 0\nline b"
    assert fast[1] == "line 1"
    assert fast[2] == "line 2"
    assert fast[3] == ""


def test_dedup_lines_respects_custom_id_column_named_id(spark):
    df = spark.createDataFrame(
        [(0, "x\ny"), (1, "x\nz")], "id long, text string")
    out = {r["id"]: r["text"]
           for r in dedup_lines(df, id_col="id").collect()}
    assert out == {0: "x\ny", 1: "z"}


def test_gopher_rules_each_gate_and_conjunction(spark):
    good = " ".join(["the be to of and that have with word nine"] * 6)
    rows = [
        (0, good),                                   # every gate passes
        (1, "short doc"),                            # word count + stopwords
        (2, "# " + " ".join(["#tag"] * 60)),         # symbol ratio
        (3, "- a\n- b\n- c"),                        # bullet lines
        (4, ("end..." + "\n") * 4 + "plain"),        # ellipsis lines
        (5, " ".join(["12345"] * 60)),               # alpha words (+ others)
        (6, None),                                   # NULL -> all false
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in gopher_quality_rules(df).collect()}
    assert got[0]["gopher_pass"] is True
    assert all(v for k, v in got[0].items() if k.startswith("r_"))
    assert got[1]["r_word_count"] is False
    assert got[1]["r_stopwords"] is False
    assert got[2]["r_symbol_ratio"] is False
    assert got[3]["r_bullet_lines"] is False
    assert got[4]["r_ellipsis_lines"] is False
    assert got[5]["r_alpha_words"] is False
    assert got[6]["gopher_pass"] is False
    assert not any(v for k, v in got[6].items() if k.startswith("r_"))
    for d in (1, 2, 3, 4, 5):
        assert got[d]["gopher_pass"] is False


def test_gopher_word_count_bounds_are_parameters(spark):
    df = spark.createDataFrame(
        [(0, "the be to of and that have with extra words here now ok")],
        "doc_id long, text string")
    strict = gopher_quality_rules(df, min_words=50).collect()[0]
    loose = gopher_quality_rules(df, min_words=5).collect()[0]
    assert strict["r_word_count"] is False
    assert loose["r_word_count"] is True and loose["gopher_pass"] is True
