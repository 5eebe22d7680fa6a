"""PII detection and redaction for training corpora: emails, IPv4
addresses, phone numbers — as native Column expressions (one codegen'd
regexp pass per pattern, no UDFs), so the scrub fuses into the scan stage
and at 100 TB costs zero shuffles.

The patterns deliberately stay inside the RE2 ∩ Java-regex subset (no
lookaround, no backreferences) so a SQL oracle (DuckDB, RE2) reproduces
counts and redactions bit-for-bit — the same portability rule as
:mod:`graflo_spark.ops.textstats`.

Reference analogue: none (the reference has no PII operators); north-star
training-pipeline extension per the task brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: emails first (their local part can contain
# dots/digits that the looser patterns would chew on), then IPs (so the
# phone pattern can never span the octets of an already-redacted address),
# then phones.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    # country code OPTIONAL: plain US forms (555-123-4567, (555) 123 4567)
    # must redact too, not just +1-prefixed ones; the final separator stays
    # mandatory so bare 10+-digit runs (ids, card fragments) don't match
    "phone": r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}\b",
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrence count of one PII pattern, evaluated on the RAW text
    (counts are per-pattern independent; see :func:`redact_pii` for the
    sequential-replacement semantics). NULL text counts 0 — the audit
    columns must stay summable (size(NULL) is NULL under ANSI, -1 under
    legacy sizeOfNull)."""
    return F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0)))
    )


def redact_pii(text: Column, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """Replace each PII match with a ``<KIND>`` token, applying patterns in
    ``kinds`` order (sequential: later patterns see earlier redactions —
    the order in :data:`PII_PATTERNS` prevents cross-pattern partial
    matches)."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    with_counts: bool = True,
) -> DataFrame:
    """Corpus scrub: redact PII in ``text_col`` (in place by default, or
    into ``out_col``) and, with ``with_counts``, annotate per-kind match
    counts (``n_pii_email`` …) computed on the original text — the audit
    trail a data-governance pass needs."""
    t = F.col(text_col)
    cols = {}
    if with_counts:
        for kind in PII_PATTERNS:
            cols[f"n_pii_{kind}"] = pii_count(t, kind)
    cols[out_col or text_col] = redact_pii(t)
    return df.withColumns(cols)
