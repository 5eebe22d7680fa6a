"""Decontamination (benchmark n-gram overlap), PII scrub, and repetition
stats: planted-positive/negative correctness, normalization robustness,
plan shape (broadcast, no corpus shuffle before the overlap count)."""

from pyspark.sql import functions as F

from graflo_spark.ops.decontam import (
    benchmark_ngrams,
    contamination_flags,
    decontaminate,
)
from graflo_spark.ops.pii import redact_pii, scrub_pii
from graflo_spark.ops.textstats import (
    dup_line_frac,
    token_repetition_frac,
    top_ngram_frac,
)


def _docs(spark):
    rows = [
        # 0: verbatim copy of benchmark question -> contaminated
        (0, "what is the capital of france paris is the capital"),
        # 1: case/whitespace-perturbed copy -> still contaminated (normalization)
        (1, "What  IS the   Capital of FRANCE paris is. unrelated tail here"),
        # 2: clean document, zero overlap
        (2, "spark shuffles partition data across executors for joins"),
        # 3: shares a sub-threshold fragment only (shorter than n)
        (3, "the capital gains tax rose again this year in france maybe"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bench(spark):
    return spark.createDataFrame(
        [(100, "what is the capital of france")], ["qid", "text"]
    )


def test_contamination_flags_planted(spark):
    flags = contamination_flags(
        _docs(spark), _bench(spark), "doc_id", "text", ngram_n=5
    )
    got = {r["id"]: (r["n_overlap"], r["contaminated"]) for r in flags.collect()}
    assert set(got) == {0, 1, 2, 3}  # every doc reported
    assert got[0][1] and got[0][0] >= 2  # both 5-grams of the question hit
    assert got[1][1]  # normalization catches case/whitespace edits
    assert got[2] == (0, False)
    assert got[3] == (0, False)  # 4-token fragment < n=5 never matches


def test_decontaminate_removes_only_flagged(spark):
    clean = decontaminate(_docs(spark), _bench(spark), "doc_id", "text", ngram_n=5)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}
    assert clean.columns == ["doc_id", "text"]  # schema preserved


def test_benchmark_grams_distinct_and_nonempty(spark):
    grams = benchmark_ngrams(_bench(spark), "text", ngram_n=5)
    rows = [r["gram"] for r in grams.collect()]
    assert len(rows) == len(set(rows)) == 2  # 6 tokens -> 2 distinct 5-grams
    assert all(g for g in rows)


def test_contamination_plan_broadcasts_bench(spark):
    plan = contamination_flags(
        _docs(spark), _bench(spark), "doc_id", "text", ngram_n=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDFs anywhere


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a.user+tag@example.co.uk or call +1 (555) 123 4567 now"),
            (1, "server at 192.168.254.7 answered"),
            (2, "no pii here at all"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in scrub_pii(df, "text", out_col="clean").collect()}
    assert out[0]["n_pii_email"] == 1 and out[0]["n_pii_phone"] == 1
    assert "<EMAIL>" in out[0]["clean"] and "<PHONE>" in out[0]["clean"]
    assert "example" not in out[0]["clean"] and "4567" not in out[0]["clean"]
    assert out[1]["n_pii_ipv4"] == 1 and out[1]["clean"] == "server at <IPV4> answered"
    assert out[2]["clean"] == "no pii here at all"
    assert out[3]["clean"] is None  # NULL text propagates, no crash
    # NULL text must count 0, not NULL/-1: the audit columns stay summable
    assert out[3]["n_pii_email"] == 0 and out[3]["n_pii_phone"] == 0
    # redaction order: the phone pattern must not chew on redacted IPs
    assert "<PHONE>" not in out[1]["clean"]


def test_pii_phone_without_country_code(spark):
    """Plain US formats (no +1) are the common case and must redact."""
    df = spark.createDataFrame(
        [
            (0, "call 555-123-4567 now"),
            (1, "or (555) 123 4567 works"),
            (2, "dotted 555.123.4567 too"),
            (3, "id 1234567890 is not a phone"),  # no separators
            (4, "ip 10.0.254.7 is not a phone either"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in scrub_pii(df, "text").collect()}
    for i in (0, 1, 2):
        assert out[i]["n_pii_phone"] == 1, out[i]
        assert "<PHONE>" in out[i]["text"]
    assert out[3]["n_pii_phone"] == 0 and "<PHONE>" not in out[3]["text"]
    assert out[4]["n_pii_phone"] == 0 and "<IPV4>" in out[4]["text"]


def test_pii_redact_in_place_default(spark):
    df = spark.createDataFrame([(0, "x bob@corp.io y")], ["doc_id", "text"])
    out = scrub_pii(df, "text").collect()[0]
    assert out["text"] == "x <EMAIL> y"


def test_contamination_expr_matches_flags(spark):
    from graflo_spark.ops.decontam import (
        collect_benchmark_grams,
        contamination_expr,
    )

    docs, bench = _docs(spark), _bench(spark)
    grams = collect_benchmark_grams(bench, "text", ngram_n=5)
    expr_out = {
        r["doc_id"]: r["c"]
        for r in docs.select(
            "doc_id", contamination_expr(grams, 5, F.col("text")).alias("c")
        ).collect()
    }
    flag_out = {
        r["id"]: r["contaminated"]
        for r in contamination_flags(docs, bench, "doc_id", "text", 5).collect()
    }
    assert expr_out == flag_out  # literal-array path == join path


def test_streaming_text_hygiene_pipeline(spark, tmp_path):
    """The full training-data hygiene chain — decontamination predicate,
    PII scrub, quality gate, split assignment — is stateless Column logic,
    so it must run unchanged inside a Structured Streaming plan."""
    from graflo_spark.ops.decontam import (
        collect_benchmark_grams,
        contamination_expr,
    )
    from graflo_spark.ops.sampling import hash_split
    from graflo_spark.ops.textstats import token_count
    from graflo_spark.streaming import replay_as_stream

    docs, bench = _docs(spark), _bench(spark)
    grams = collect_benchmark_grams(bench, "text", ngram_n=5)

    def hygiene(df):
        clean = scrub_pii(df, "text")
        gated = clean.filter(
            ~contamination_expr(grams, 5, F.col("text"))
            & (token_count(F.col("text")) >= 5)
        )
        return hash_split(gated, "doc_id", {"train": 0.8, "val": 0.2})

    stream = replay_as_stream(spark, docs)
    q = (
        hygiene(stream)
        .writeStream.format("memory")
        .queryName("hygiene_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hygiene_out").collect()
    want = hygiene(docs).collect()  # identical batch-mode result
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in want}
    assert {r["doc_id"] for r in got} == {2, 3}  # 0,1 contaminated
    assert {r["doc_id"]: r["split"] for r in got} == {
        r["doc_id"]: r["split"] for r in want
    }


def test_streaming_hygiene_into_packing_store(spark, tmp_path):
    """The full streaming ingest story end-to-end: a replayed document
    stream runs the hygiene gates per micro-batch inside foreachBatch,
    survivors append to an incremental PackingStore — and the resulting
    span table equals batch-mode hygiene + one-shot packing of the same
    survivors (modulo cross-batch arrival order, fixed here by replaying
    in doc_id order)."""
    from graflo_spark.ops.packing import PackingStore, pack_chunks
    from graflo_spark.ops.textstats import token_count
    from graflo_spark.streaming import replay_as_stream

    docs = _docs(spark)  # 4 docs; ids 2,3 pass the min-token gate below

    def hygiene(df):
        return (
            scrub_pii(df, "text")
            .filter(token_count(F.col("text")) >= 8)
            .select("doc_id", token_count(F.col("text")).alias("n_tok"))
        )

    store = PackingStore(spark, str(tmp_path / "pk"), chunk_tokens=4)

    def sink(batch, _bid):
        store.pack_batch(hygiene(batch))

    # range-partitioned files replay as id-ordered micro-batches (listing
    # order == part-file order == range order), so the incremental stream
    # sees the same arrival order the one-shot packing sorts by
    q = (
        replay_as_stream(
            spark,
            docs.repartitionByRange(2, F.col("doc_id"))
            .sortWithinPartitions("doc_id"),
        )
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["chunk_id"]): (r["doc_tok_start"], r["doc_tok_end"])
        for r in store.spans().collect()
    }
    want = {
        (r["id"], r["chunk_id"]): (r["doc_tok_start"], r["doc_tok_end"])
        for r in pack_chunks(hygiene(docs), "doc_id", "n_tok", 4).collect()
    }
    assert got == want and got


def test_corpus_report_and_lang_histogram(spark, sf_dir):
    from graflo_spark.ops.textstats import corpus_report, lang_histogram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = corpus_report(docs, group_cols=["source"]).collect()
    assert len(rep) == docs.select("source").distinct().count()
    total = docs.count()
    assert sum(r["n_docs"] for r in rep) == total
    for r in rep:
        p50, p90, p99 = r["tok_p50_p90_p99"]
        assert 0 < p50 <= p90 <= p99
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert r["n_null_text"] == 0
    # whole-corpus variant returns one row and the same doc total
    whole = corpus_report(docs).collect()
    assert len(whole) == 1 and whole[0]["n_docs"] == total
    # language histogram partitions the corpus
    hist = lang_histogram(docs).collect()
    assert sum(r["n_docs"] for r in hist) == total
    assert {r["lang_pred"] for r in hist} <= {"en", "de", "fr", "es", "und"}


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "a a a a"),  # 1 distinct of 4 tokens -> 0.75 repetition
            (1, "all tokens here are different"),
            (2, "line one\nline one\nline two\n\n"),
            (3, "spam ham spam ham spam ham"),  # "spam ham" dominates 2-grams
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_repetition_frac(F.col("text")).alias("tok"),
            dup_line_frac(F.col("text")).alias("line"),
            top_ngram_frac(F.col("text"), 2).alias("top2"),
        ).collect()
    }
    assert abs(got[0]["tok"] - 0.75) < 1e-9
    assert got[1]["tok"] == 0.0
    assert abs(got[2]["line"] - (1 - 2 / 3)) < 1e-9  # empty lines excluded
    assert got[3]["top2"] == 3 / 5  # "spam ham" 3x of 5 bigrams
    assert got[4]["tok"] == 0.0 and got[4]["line"] == 0.0


def test_semantic_decontaminate_survivors(spark):
    from graflo_spark.ops.decontam import (
        semantic_contamination,
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),          # == bench vector -> flagged
            (1, [0.999, 0.045]),      # cos ~0.999 -> flagged
            (2, [0.0, 1.0]),          # orthogonal -> survives
            (3, [-1.0, 0.0]),         # opposite -> survives
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>")
    flags = {
        r["vec_id"]: (round(r["max_bench_cosine"], 3), r["contaminated"])
        for r in semantic_contamination(
            corpus, bench, threshold=0.95).collect()
    }
    assert flags[0] == (1.0, True)
    assert flags[1][1] is True and flags[1][0] > 0.99
    assert flags[2] == (0.0, False) and flags[3] == (-1.0, False)
    kept = {r["vec_id"] for r in semantic_decontaminate(
        corpus, bench, threshold=0.95).collect()}
    assert kept == {2, 3}


def test_semantic_contamination_empty_benchmark(spark):
    from graflo_spark.ops.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    empty = corpus.filter("vec_id < 0")
    rows = {r["vec_id"]: (r["max_bench_cosine"], r["contaminated"])
            for r in semantic_contamination(corpus, empty).collect()}
    # the contract: one row per corpus row even with nothing to screen
    assert rows == {0: (None, False), 1: (None, False)}
