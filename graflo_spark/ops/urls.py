"""URL canonicalization and URL-keyed dedup for web corpora — the first
dedup pass of every web-scale pipeline (C4/RefinedWeb style): two crawls of
the same page under trivially-different URLs must collapse before any
content hashing runs.

All pure Column regex chains in the RE2 ∩ Java subset (no UDFs, fuses into
the scan). Reference analogue: none; north-star training-pipeline
extension per the task brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_url(url: Column, keep_query: bool = False) -> Column:
    """Canonical URL key: lowercase, scheme and leading ``www.`` stripped,
    fragment always dropped, query dropped unless ``keep_query`` (tracking
    params make queries near-useless as identity; keep them only when the
    site keys content on them), trailing slashes trimmed. NULL-safe."""
    u = F.lower(F.trim(url))
    # optional scheme name: protocol-relative '//host/path' strips too
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*:)?//", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")
    if not keep_query:
        u = F.regexp_replace(u, r"\?.*$", "")
    return F.regexp_replace(u, r"/+$", "")


def url_host(url: Column) -> Column:
    """Host part of the canonical URL (port stripped); empty string for
    host-less inputs."""
    return F.regexp_extract(normalize_url(url), r"^([^/:]+)", 1)


def url_domain(url: Column) -> Column:
    """Approximate registrable domain: the last two host labels. A
    public-suffix-list-accurate version needs the PSL dataset (ship it as a
    broadcast lookup in a real deployment); the two-label form is the usual
    first-pass approximation and is exact for .com/.org/... (documented
    mis-grouping for ccTLD pairs like co.uk)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def dedup_by_url(
    df: DataFrame,
    url_col: str,
    id_col: str,
    keep_query: bool = False,
) -> DataFrame:
    """Keep one row per canonical URL (deterministic min-id winner) — the
    standard pre-content-dedup pass. One hash aggregate on the normalized
    key; AQE-skew-safe. Rows with NULL urls — or urls that normalize to an
    empty key ('', 'https://', '#frag') — are kept as-is: a blank key is
    no identity, and collapsing unrelated documents on it would silently
    delete content."""
    keyed = df.withColumn("__ukey", normalize_url(F.col(url_col), keep_query))
    has_key = F.col("__ukey").isNotNull() & (F.col("__ukey") != "")
    with_url = keyed.filter(has_key)
    winners = with_url.groupBy("__ukey").agg(F.min(id_col).alias(id_col))
    kept = with_url.join(winners, ["__ukey", id_col], "left_semi")
    # has_key is never NULL: isNotNull() short-circuits the NULL comparison
    return kept.unionByName(keyed.filter(~has_key)).drop("__ukey")


def filter_domains(
    df: DataFrame,
    url_col: str,
    blocklist: list[str] | None = None,
    allowlist: list[str] | None = None,
) -> DataFrame:
    """Domain gate: drop rows whose registrable domain is in ``blocklist``;
    with an ``allowlist``, keep ONLY those domains (blocklist still applies
    on top). Literal-array membership tests — stream-safe, no joins; for
    million-entry lists switch to a broadcast join on ``url_domain``."""
    d = url_domain(F.col(url_col))
    cond = F.lit(True)
    if allowlist is not None:
        # allowlist is an explicit whitelist: NULL/blank domains are NOT in it
        cond = cond & d.isin([x.lower() for x in allowlist])
    if blocklist:
        # blocklist must not purge NULL-url rows (d is NULL -> isin is NULL
        # -> filter would drop); unknown domain is not a blocked domain
        cond = cond & (d.isNull() | ~d.isin([x.lower() for x in blocklist]))
    return df.filter(cond)


def filter_domains_join(
    df: DataFrame, url_col: str, blocklist: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """The at-scale form of :func:`filter_domains` for blocklists too big
    for a literal `isin` (millions of domains): a broadcast LEFT ANTI join
    on the registrable domain — one map-side probe per row, no shuffle of
    the corpus. NULL/blank-domain rows pass (anti join keeps non-matches)."""
    bl = blocklist.select(
        F.lower(F.col(domain_col)).alias("__blocked_domain")
    ).distinct()
    keyed = df.withColumn("__dom", url_domain(F.col(url_col)))
    return keyed.join(
        F.broadcast(bl),
        keyed["__dom"] == bl["__blocked_domain"],
        "left_anti",
    ).drop("__dom")
