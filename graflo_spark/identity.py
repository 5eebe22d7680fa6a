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

For BYTE parity with digests the reference itself wrote (SURVEY §7.4.3
co-validation), use the :func:`reference_digest` /
:func:`reference_digest_expr` compat mode instead — exact
``json.dumps(sort_keys=True, default=str)`` semantics, frozen under test
vectors in ``tests/test_store_query.py``.
"""

from __future__ import annotations

import pandas as pd
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


# ------------------------------------------------- reference-digest parity

def reference_digest(doc, fields: list[str]) -> str:
    """BYTE-EXACT reference digest (identity_digest.py:33-48
    compute_hash_identity): sha256 over ``json.dumps(payload,
    sort_keys=True, default=str)`` where payload is ``{field:
    doc.get(field)}``. Python's JSON spacing, \\uXXXX escaping for
    non-ASCII, unquoted ints/floats/bools, ``str()`` fallback for
    dates/timestamps — all preserved. SURVEY §7.4.3's co-validation mode:
    digests minted here equal the reference's on the same documents."""
    import hashlib
    import json

    payload = {f: doc.get(f) for f in fields}
    blob = json.dumps(payload, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()


def reference_funnel_identity(
    doc, branches: list[list[str]],
    branch_ids: list[str] | None = None,
    include_branch_id: bool = False,
) -> str | None:
    """Reference compute_funnel_identity (identity_digest.py:51-71): first
    branch whose fields are all present and non-empty ("" counts as empty)
    wins; ``include_branch_id`` adds ``{"_branch": id}`` to the payload.
    Returns None when no branch fires (document dropped downstream)."""
    import hashlib
    import json

    for i, branch in enumerate(branches):
        if any(doc.get(f) is None or doc.get(f) == "" for f in branch):
            continue
        payload = {f: doc.get(f) for f in branch}
        if include_branch_id:
            payload["_branch"] = (
                branch_ids[i] if branch_ids else f"branch_{i}"
            )
        blob = json.dumps(payload, sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()
    return None


def reference_digest_expr(fields: list[str], resolver=None) -> Column:
    """Arrow-batched Column computing :func:`reference_digest` — the compat
    escape hatch when digests must match reference-written data. The hot
    path stays on :func:`digest_expr` (pure codegen, oracle-reproducible);
    this one needs Python because Spark cannot render Python's exact JSON
    (ensure_ascii escaping, ``repr`` floats) in native expressions.

    Value fidelity across Arrow: nullable ints arrive as pandas NA/NaN and
    are mapped back to None; numpy scalars unbox to Python ints/floats/
    bools; timestamps unbox via ``to_pydatetime`` so ``str()`` matches
    ``datetime.datetime``'s rendering."""
    from pyspark.sql.functions import pandas_udf

    names = list(fields)

    def _py(v):
        import numpy as np

        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            return None
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime()
        return v

    @pandas_udf("string")
    def u(*series: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*series):
            doc = {n: _py(v) for n, v in zip(names, vals)}
            out.append(reference_digest(doc, names))
        return pd.Series(out, dtype=object)

    get = resolver if resolver is not None else F.col
    return u(*[get(f) for f in names])
