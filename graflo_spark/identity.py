"""Identity minting: hash digests, funnels, blank/assigned uuids.

Reference semantics (graflo/architecture/schema/identity_digest.py:33-71,
identity_funnel.py): a hash identity is a deterministic sha256 over a
canonical payload of ``{field: str(value)}`` with keys sorted; an identity
funnel is an ordered list of branches — the first branch whose fields are all
non-null supplies the digest; documents matching no branch are dropped.

The canonical payload here is frozen as::

    {"<field>":"<cast(value as string)>",...}     (fields sorted by name)

built with ``concat`` so the exact bytes are engine-independent — the DuckDB
oracle (:func:`digest_sql`) reproduces them byte-for-byte. Caveat: avoid
floating-point fields in digests (Spark renders 1.5e7 as ``1.5E7``, DuckDB as
``15000000.0``); digest over strings/ints/dates only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _payload_expr(fields: list[str], resolver=None) -> Column:
    get = resolver if resolver is not None else F.col
    parts: list[Column] = [F.lit("{")]
    for i, f in enumerate(sorted(fields)):
        if i:
            parts.append(F.lit(","))
        parts.append(F.lit(f'"{f}":"'))
        parts.append(get(f).cast("string"))
        parts.append(F.lit('"'))
    parts.append(F.lit("}"))
    return F.concat(*parts)


def digest_expr(fields: list[str], resolver=None) -> Column:
    """sha256 digest Column over the canonical payload of ``fields``.
    NULL in any field makes the whole digest NULL (concat null-propagates),
    matching the reference's all-present requirement. ``resolver`` optionally
    maps field names to Columns."""
    return F.sha2(_payload_expr(fields, resolver), 256)


def digest_sql(fields: list[str], quote: str = '"') -> str:
    """DuckDB SQL reproducing :func:`digest_expr` byte-for-byte."""
    parts = ["'{'"]
    for i, f in enumerate(sorted(fields)):
        if i:
            parts.append("','")
        parts.append(f"'\"{f}\":\"'")
        parts.append(f"CAST({quote}{f}{quote} AS VARCHAR)")
        parts.append("'\"'")
    parts.append("'}'")
    # DuckDB || null-propagates like Spark concat
    return f"sha256({' || '.join(parts)})"


def funnel_expr(branches: list[list[str]], resolver=None) -> Column:
    """Ordered-fallback digest: first branch with all fields non-null wins;
    NULL if no branch completes (document is dropped downstream)."""
    get = resolver if resolver is not None else F.col
    branch_cols = []
    for branch in branches:
        cond = None
        for f in branch:
            c = get(f).isNotNull()
            cond = c if cond is None else (cond & c)
        branch_cols.append(F.when(cond, digest_expr(branch, resolver)))
    return F.coalesce(*branch_cols) if branch_cols else F.lit(None).cast("string")


def funnel_sql(branches: list[list[str]], quote: str = '"') -> str:
    """DuckDB SQL reproducing :func:`funnel_expr`."""
    cases = []
    for branch in branches:
        cond = " AND ".join(f"{quote}{f}{quote} IS NOT NULL" for f in branch)
        cases.append(f"CASE WHEN {cond} THEN {digest_sql(branch, quote)} END")
    return f"COALESCE({', '.join(cases)})" if cases else "NULL"


def assigned_uuid_expr(seed_fields: list[str] | None = None) -> Column:
    """Mint a primary key for assigned/blank identity vertices.

    Prefer a *deterministic* key (sha256 of the row content) so Spark task
    retries / speculative execution cannot mint divergent ids for the same
    row (SURVEY §7.4.5). Pass ``seed_fields=None`` for a true random uuid —
    callers must then materialize (checkpoint) before any edge join.
    """
    if seed_fields:
        return F.sha2(_payload_expr(seed_fields), 256)  # noqa: E501
    return F.expr("uuid()")
