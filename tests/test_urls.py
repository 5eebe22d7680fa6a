"""URL canonicalization / URL dedup / domain gating."""

from pyspark.sql import functions as F

from graflo_spark.ops.urls import (
    dedup_by_url,
    filter_domains,
    normalize_url,
    url_domain,
    url_host,
)


def test_normalize_url_variants_collapse(spark):
    urls = [
        "https://www.Example.com/Path/",
        "http://example.com/path",
        "example.com/path#frag",
        "HTTPS://example.com/path?utm_source=x",
        "https://example.com/path///",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = {r["n"] for r in
           df.select(normalize_url(F.col("url")).alias("n")).collect()}
    assert out == {"example.com/path"}


def test_normalize_url_keep_query_and_null(spark):
    df = spark.createDataFrame(
        [("https://a.com/x?q=1#f",), (None,)], ["url"]
    )
    rows = df.select(
        normalize_url(F.col("url"), keep_query=True).alias("k"),
        normalize_url(F.col("url")).alias("nk"),
    ).collect()
    assert rows[0]["k"] == "a.com/x?q=1" and rows[0]["nk"] == "a.com/x"
    assert rows[1]["k"] is None and rows[1]["nk"] is None


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://news.site.org:8080/a/b",), ("plainhost/x",)], ["url"]
    )
    rows = df.select(
        url_host(F.col("url")).alias("h"), url_domain(F.col("url")).alias("d")
    ).collect()
    assert rows[0]["h"] == "news.site.org" and rows[0]["d"] == "site.org"
    assert rows[1]["h"] == "plainhost" and rows[1]["d"] == ""


def test_dedup_by_url_min_id_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [
            (3, "https://www.a.com/p"),
            (1, "a.com/p/"),
            (2, "http://a.com/p#top"),
            (7, "b.com/q"),
            (8, None),
            (9, None),
        ],
        ["doc_id", "url"],
    )
    kept = {r["doc_id"] for r in dedup_by_url(df, "url", "doc_id").collect()}
    assert kept == {1, 7, 8, 9}  # min-id wins; NULL urls untouched


def test_protocol_relative_urls_collapse(spark):
    df = spark.createDataFrame(
        [("//example.com/path",), ("https://example.com/path",)], ["url"]
    )
    out = {r["n"] for r in
           df.select(normalize_url(F.col("url")).alias("n")).collect()}
    assert out == {"example.com/path"}
    assert df.select(url_domain(F.col("url")).alias("d")).collect()[0]["d"] \
        == "example.com"


def test_blank_canonical_keys_pass_through(spark):
    """'' / 'https://' / '#frag' normalize to an empty key — no identity,
    so unrelated docs must NOT collapse into one dedup group."""
    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "https://"), (4, None), (5, "#frag")],
        ["doc_id", "url"],
    )
    kept = {r["doc_id"] for r in dedup_by_url(df, "url", "doc_id").collect()}
    assert kept == {1, 2, 3, 4, 5}


def test_blocklist_keeps_null_and_blank_domain_rows(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "https://ok.com/x"), (2, "https://spam.com/y"),
         (3, "plainhost/z")],
        ["doc_id", "url"],
    )
    kept = {r["doc_id"] for r in
            filter_domains(df, "url", blocklist=["spam.com"]).collect()}
    assert kept == {0, 1, 3}  # NULL url and host-only rows survive


def test_filter_domains_join_scales_blocklist(spark):
    from graflo_spark.ops.urls import filter_domains_join

    df = spark.createDataFrame(
        [(0, None), (1, "https://ok.com/x"), (2, "https://SPAM.com/y"),
         (3, "plainhost/z")],
        ["doc_id", "url"],
    )
    bl = spark.createDataFrame([("spam.com",), ("Other.net",)], ["domain"])
    out = filter_domains_join(df, "url", bl)
    assert {r["doc_id"] for r in out.collect()} == {0, 1, 3}
    assert out.columns == ["doc_id", "url"]  # helper column dropped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_model_quality_scorer_seam(spark):
    from graflo_spark.ops.textstats import model_quality_scores

    df = spark.createDataFrame(
        [(0, "x" * 500), (1, "hi"), (2, None)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["model_quality"]
           for r in model_quality_scores(df).collect()}
    assert got == {0: 0.5, 1: 0.002, 2: 0.0}  # deterministic fake
    # the seam: a swapped scorer's outputs flow through unchanged (a lambda
    # pickles by value, so the executor needs no importable test module)
    out2 = {r["doc_id"]: r["model_quality"]
            for r in model_quality_scores(
                df, scorer=lambda texts: [0.25] * len(texts)).collect()}
    assert out2 == {0: 0.25, 1: 0.25, 2: 0.25}


def test_filter_domains(spark):
    df = spark.createDataFrame(
        [(0, "https://spam.bad.com/x"), (1, "https://good.org/y"),
         (2, "https://other.net/z")],
        ["doc_id", "url"],
    )
    blocked = {r["doc_id"] for r in
               filter_domains(df, "url", blocklist=["bad.com"]).collect()}
    assert blocked == {1, 2}
    allowed = {r["doc_id"] for r in
               filter_domains(df, "url", allowlist=["good.org"]).collect()}
    assert allowed == {1}
    both = {r["doc_id"] for r in filter_domains(
        df, "url", blocklist=["good.org"], allowlist=["good.org"]).collect()}
    assert both == set()  # blocklist wins over allowlist
