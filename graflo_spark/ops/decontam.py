"""Benchmark decontamination: flag / remove training documents that share
word n-grams with an evaluation ("benchmark") set — the overlap rule used by
pretraining pipelines (GPT-3 appendix C style: any shared normalized n-gram
marks a training document as contaminated).

Shape (and the 100 TB story): the benchmark side is an eval suite — MBs, not
TBs — so its distinct-gram set is broadcast and the corpus-side join is
map-side: the corpus is never shuffled to find overlaps. Per-document overlap
counts reduce map-side (partial aggregation on ``doc_id``), so the only
shuffle is one row per contaminated document. Gram extraction is a native
higher-order-function expression (no UDF, whole-stage codegen).

Reference analogue: the reference has no decontamination operator; this is a
north-star training-pipeline extension (task brief) built on the same
word-n-gram machinery as :func:`graflo_spark.ops.dedup.ngram_jaccard_pairs`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graflo_spark.ops.dedup import word_ngrams
from graflo_spark.ops.util import ensure_min_parallelism


def normalized_ngrams(text: Column, n: int) -> Column:
    """Distinct, lowercased, whitespace-folded word n-grams. Normalization
    (lower + trim + fold runs of whitespace) makes the overlap test robust
    to case/formatting differences between a benchmark dump and the crawled
    corpus — the standard decontamination preprocessing."""
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.array_distinct(word_ngrams(norm, n))


def benchmark_ngrams(
    bench: DataFrame, text_col: str, ngram_n: int = 13
) -> DataFrame:
    """Distinct n-gram set of the benchmark corpus: one ``gram`` column.

    Distinct-ness matters twice: it bounds the broadcast size and it makes
    the downstream per-document join count *distinct* shared grams (the
    corpus side is also array_distinct'd), so a gram repeated in either
    corpus can't inflate the overlap count.
    """
    return (
        bench.select(F.explode(normalized_ngrams(F.col(text_col), ngram_n)).alias("gram"))
        .filter(F.trim(F.col("gram")) != "")
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    ngram_n: int = 13,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination report: ``(id, n_overlap, contaminated)``.

    ``n_overlap`` = number of DISTINCT normalized n-grams the document
    shares with the benchmark set; ``contaminated`` = n_overlap >=
    ``min_overlap``. Every input document gets a row (left join; clean docs
    report 0), so the output is a drop-in annotation table.

    ``broadcast_bench`` (default) is correct whenever the benchmark is an
    eval suite: the corpus-side explode joins map-side against the
    broadcast gram set and only matching (doc, gram) rows survive into the
    count aggregate. Disable it only if the "benchmark" is itself huge, in
    which case the join degrades gracefully to a shuffle equi-join on gram.
    """
    grams = benchmark_ngrams(bench, text_col, ngram_n)
    if broadcast_bench:
        grams = F.broadcast(grams)
    doc_grams = ensure_min_parallelism(docs).select(
        F.col(id_col).alias("id"),
        F.explode(normalized_ngrams(F.col(text_col), ngram_n)).alias("gram"),
    )
    overlap = (
        doc_grams.join(grams, "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(overlap, "id", "left")
        .select(
            "id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def contamination_expr(
    bench_grams: list[str], ngram_n: int, text: Column, min_overlap: int = 1
) -> Column:
    """Stream-safe contamination predicate: the benchmark gram set is
    embedded as ONE array literal, so the test is a pure Column expression
    (``array_intersect`` against the document's distinct grams) — no join,
    no aggregation, legal in any Structured Streaming plan and fused into
    whole-stage codegen in batch. Use :func:`collect_benchmark_grams` to
    build the list; eval suites are MBs, so the literal (shipped once per
    task via the plan) is bounded by construction — for a huge "benchmark"
    fall back to :func:`contamination_flags`."""
    if not bench_grams:
        # empty benchmark: zero overlap everywhere (F.array() with no args
        # would type as array<void> and break array_intersect)
        return F.lit(0 >= min_overlap)
    grams = F.array(*[F.lit(g) for g in bench_grams])
    return (
        F.size(F.array_intersect(normalized_ngrams(text, ngram_n), grams))
        >= min_overlap
    )


def collect_benchmark_grams(
    bench: DataFrame, text_col: str, ngram_n: int = 13
) -> list[str]:
    """Driver-side materialization of the benchmark gram set for
    :func:`contamination_expr` (bounded: one row per distinct eval-suite
    n-gram)."""
    return [
        r["gram"] for r in benchmark_ngrams(bench, text_col, ngram_n).collect()
    ]


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    ngram_n: int = 13,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Remove contaminated documents: the training corpus minus every row
    whose overlap with the benchmark reaches ``min_overlap`` grams. Keeps
    the full input schema (anti-join on the flagged id set)."""
    flagged = contamination_flags(
        docs, bench, id_col, text_col, ngram_n, min_overlap, broadcast_bench
    ).filter("contaminated")
    return docs.join(
        flagged.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-space decontamination: the max cosine of every corpus
    vector against ANY benchmark vector, plus the ``contaminated`` flag at
    ``threshold`` — catches paraphrased/translated benchmark leakage that
    n-gram overlap (:func:`contamination_flags`) cannot see. Returns
    ``(id_col, max_bench_cosine, contaminated)``, one row per corpus row.

    Scale shape: the benchmark side is broadcast (eval suites are small by
    definition), the per-pair cosine and per-row max reduce MAP-SIDE via
    the partial aggregate, so the only corpus-sized shuffle carries one row
    per corpus vector. No LSH approximation: the screen is exact, which is
    what you want for a contamination gate (false negatives leak eval
    data)."""
    from graflo_spark.ops.simsearch import cosine_expr

    b = F.broadcast(
        bench.select(
            F.col(bench_vec or vec_col).cast("array<double>").alias("_bv"))
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv"))
    cos = cosine_expr(F.col("_cv"), F.col("_bv"))
    agg = (
        c.crossJoin(b)
        .groupBy(id_col)
        .agg(F.max(cos).alias("max_bench_cosine"))
    )
    # re-attach to the corpus id set: with an EMPTY benchmark the cross
    # join yields zero rows, and silently dropping the whole corpus from
    # an annotation table would be a contract violation — every corpus row
    # gets a row (NULL cosine, contaminated=false), mirroring
    # contamination_flags' left-join shape.
    return (
        c.select(id_col)
        .join(agg, id_col, "left")
        .withColumn(
            "contaminated",
            F.coalesce(
                F.col("max_bench_cosine") >= F.lit(float(threshold)),
                F.lit(False)))
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """The corpus minus every row :func:`semantic_contamination` flags;
    keeps the full input schema (anti-join on the flagged id set)."""
    flagged = semantic_contamination(
        corpus, bench, id_col, vec_col, bench_vec, threshold
    ).filter("contaminated")
    return corpus.join(flagged.select(id_col), id_col, "left_anti")
