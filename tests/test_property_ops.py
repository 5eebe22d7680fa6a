"""Property-based tests (hypothesis) for the training-pipeline operators.

Spark evaluation is too slow per-hypothesis-example, so the strategy here
matches test_property_based.py: generate a BATCH of examples, evaluate the
whole batch in one Spark job, and assert per-row against a pure-Python
model. URL normalization (a pure driver-expressible chain) additionally
gets example-per-example idempotence checks via DataFrame literals batched
into one collect.
"""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from graflo_spark.ops.packing import pack_chunks


# ---- packing: invariants for arbitrary ragged token-count sequences ----

token_lists = st.lists(
    st.integers(min_value=0, max_value=300), min_size=1, max_size=60
)


@settings(max_examples=12, deadline=None)
@given(tokens=token_lists, chunk=st.integers(min_value=1, max_value=64))
def test_pack_chunks_model_parity(spark, tokens, chunk):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], ["doc_id", "n_tok"]
    )
    got = sorted(
        (
            (r["id"], r["chunk_id"], r["doc_tok_start"], r["doc_tok_end"])
            for r in pack_chunks(df, "doc_id", "n_tok", chunk).collect()
        )
    )
    # single-node model: walk the concatenated stream
    want = []
    acc = 0
    for i, t in enumerate(tokens):
        start, end = acc, acc + t
        acc = end
        if t == 0:
            continue
        for c in range(start // chunk, (end - 1) // chunk + 1):
            lo, hi = max(start, c * chunk), min(end, (c + 1) * chunk)
            want.append((i, c, lo - start, hi - start))
    assert got == sorted(want)


# ---- URL normalization: idempotence + invariance over junk prefixes ----

url_cores = st.from_regex(r"[a-z0-9]{1,6}\.[a-z]{2,3}(/[a-z0-9]{1,5}){0,3}",
                          fullmatch=True)


@settings(max_examples=20, deadline=None)
@given(core=url_cores,
       scheme=st.sampled_from(["", "http://", "https://", "ftp://"]),
       www=st.booleans(),
       query=st.sampled_from(["", "?a=1", "?utm=x&b=2"]),
       frag=st.sampled_from(["", "#top", "#a/b"]),
       slashes=st.integers(min_value=0, max_value=3))
def test_normalize_url_properties(spark, core, scheme, www, query, frag,
                                  slashes):
    from graflo_spark.ops.urls import normalize_url

    raw = f"{scheme}{'www.' if www else ''}{core}{'/' * slashes}{query}{frag}"
    df = spark.createDataFrame([(raw,)], ["url"])
    n1 = df.select(normalize_url(F.col("url")).alias("n")).collect()[0]["n"]
    # the decorated URL collapses to its bare core
    assert n1 == re.sub(r"/+$", "", core)
    # idempotent: normalizing a normalized URL is a no-op
    n2 = (
        spark.createDataFrame([(n1,)], ["url"])
        .select(normalize_url(F.col("url")).alias("n"))
        .collect()[0]["n"]
    )
    assert n2 == n1


# ---- pipeline: degenerate corpora must not crash the composition ----

def test_pipeline_empty_and_all_null_corpus(spark):
    from graflo_spark.ops.pipeline import (
        PipelineConfig,
        annotate,
        prepare_training_data,
    )

    cfg = PipelineConfig(min_tokens=1, chunk_tokens=8,
                         splits={"train": 1.0})
    empty = spark.createDataFrame([], "doc_id long, text string")
    chunks, ann, funnel = prepare_training_data(empty, None, cfg)
    assert ann.count() == 0 and chunks.count() == 0 and funnel.count() == 0

    nulls = spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, text string"
    )
    ann2 = annotate(nulls, None, cfg)
    assert {r["drop_stage"] for r in ann2.collect()} == {"quality"}
