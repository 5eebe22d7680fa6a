"""Endpoint resolution: secondary identities -> primary identities.

Reference: graflo/hq/endpoint_resolve.py:73-200 + db/conn.py:555-609 — edges
whose endpoints carry a secondary (soft-unique) key are resolved to primary
identities by a lookup join against the vertex table, with an ambiguity
policy when a secondary key matches several vertices (graflo/onto.py:176-188):

    all    — keep every match (natural join multiplicity / cross-product)
    first  — deterministic first match (ordered by primary identity)
    skip   — drop ambiguous keys entirely
    error  — raise if any key is ambiguous

Spark design: one INNER join on the secondary-key columns (edges whose key
matches no vertex are dropped — unresolvable endpoints cannot form an edge;
surface them beforehand with ``keep_absent`` if the pipeline must account
for them); the policy is join multiplicity control (``row_number() == 1`` for first, a match-count filter
for skip, an assertion count for error). The vertex side is the small side in
typical workloads — broadcast when it fits.

Also here: semi/anti-join document existence checks (reference
fetch_present_documents / keep_absent_documents, db/conn.py:529-553,636-656)
and the blank-vertex edge join (hq/db_writer.py:314-349).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_endpoints(
    edges: DataFrame,
    vertices: DataFrame,
    secondary_fields: list[str],
    primary_fields: list[str],
    side: str = "src",
    policy: str = "all",
    broadcast_vertices: bool = True,
) -> DataFrame:
    """Replace ``_{side}_<secondary>`` columns with ``_{side}_<primary>``.

    ``edges`` carries ``_src_*``/``_dst_*`` columns over the secondary key;
    the result carries the primary identity columns instead.
    """
    if policy not in ("all", "first", "skip", "error"):
        raise ValueError(f"unknown ambiguity policy {policy!r}")
    pref = f"_{side}_"
    lookup = vertices.select(
        *[F.col(f).alias(f"{pref}{f}__sec") for f in secondary_fields],
        *[F.col(f).alias(f"{pref}{f}") for f in primary_fields],
    )
    # Secondary identities are soft-unique and typically SPARSE: a null
    # key can never match an edge (SQL null equality), but left in the
    # lookup it would make policy='error' raise on — and policy='skip'
    # pointlessly window over — vertices that are not ambiguous at all
    # (review finding). Drop them before any policy logic.
    lookup = lookup.na.drop(
        subset=[f"{pref}{f}__sec" for f in secondary_fields])
    if policy == "first":
        w = Window.partitionBy(
            *[f"{pref}{f}__sec" for f in secondary_fields]
        ).orderBy(*[f"{pref}{f}" for f in primary_fields])
        lookup = (
            lookup.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    elif policy in ("skip", "error"):
        w = Window.partitionBy(*[f"{pref}{f}__sec" for f in secondary_fields])
        lookup = lookup.withColumn("__n", F.count(F.lit(1)).over(w))
        if policy == "skip":
            lookup = lookup.filter(F.col("__n") == 1).drop("__n")
        else:
            n_ambiguous = lookup.filter(F.col("__n") > 1).limit(1).count()
            if n_ambiguous:
                raise ValueError(
                    "ambiguous secondary-identity matches under policy=error"
                )
            lookup = lookup.drop("__n")

    if broadcast_vertices:
        lookup = F.broadcast(lookup)
    join_cond = None
    for f in secondary_fields:
        c = edges[f"{pref}{f}"] == lookup[f"{pref}{f}__sec"]
        join_cond = c if join_cond is None else (join_cond & c)
    out = edges.join(lookup, join_cond, "inner")
    drop = [f"{pref}{f}" for f in secondary_fields] + [
        f"{pref}{f}__sec" for f in secondary_fields
    ]
    return out.drop(*[c for c in drop if c not in [f"{pref}{p}" for p in primary_fields]])


def fetch_present(docs: DataFrame, table: DataFrame, keys: list[str]) -> DataFrame:
    """Docs whose key exists in the table (left-semi; reference
    fetch_present_documents)."""
    return docs.join(table.select(*keys).dropDuplicates(), keys, "left_semi")


def keep_absent(docs: DataFrame, table: DataFrame, keys: list[str]) -> DataFrame:
    """Docs whose key does NOT exist in the table (left-anti; reference
    keep_absent_documents)."""
    return docs.join(table.select(*keys).dropDuplicates(), keys, "left_anti")


def blank_edge_join(
    source_docs: DataFrame,
    target_docs: DataFrame,
    shared_fields: list[str],
    src_key: str = "_key",
    dst_key: str = "_key",
) -> DataFrame:
    """Blank-vertex edge assembly (reference hq/db_writer.py:314-349): after
    uuid mint, join source/target docs on their shared identity fields; when
    no shared fields exist, fall back to positional zip (row_number join).

    The zip orders each side by its row identity when it has one: the
    reference (hq/db_writer.py:348) zips source/target docs in DOCUMENT
    order, so when BOTH frames carry ``__doc_id`` (+ any position columns
    in ``order_cols``) we order by that and preserve the original row
    correspondence. When only one side carries ``__doc_id`` — or neither
    does — both sides fall back to ordering by their own minted key:
    doc-order against key-order would be an arbitrary bijection
    masquerading as document order (review finding), so the mixed case
    uses the same deterministic-but-arbitrary key order on both sides.
    A length mismatch raises instead of silently truncating to the
    shorter side."""
    if shared_fields:
        s = source_docs.select(*shared_fields, F.col(src_key).alias("_src__key"))
        t = target_docs.select(*shared_fields, F.col(dst_key).alias("_dst__key"))
        return s.join(t, shared_fields).select("_src__key", "_dst__key")
    n_s, n_t = source_docs.count(), target_docs.count()
    if n_s != n_t:
        raise ValueError(
            f"blank_edge_join positional zip needs equal sides: "
            f"{n_s} source rows vs {n_t} target rows")
    from graflo_spark.compiler import DOC_ID

    doc_ordered = (DOC_ID in source_docs.columns
                   and DOC_ID in target_docs.columns)

    def _numbered(df: DataFrame, key: str, alias: str) -> DataFrame:
        if doc_ordered:
            # document order, then any positional columns the extraction
            # carried (numeric depth order — lexical sort would put
            # __pos10 before __pos2), then the key as a unique tie-break
            pos = sorted(
                (c for c in df.columns if c.startswith("__pos")),
                key=lambda c: int(c[5:]) if c[5:].isdigit() else 0)
            order = [DOC_ID, *pos, key]
        else:
            order = [key]
        return df.withColumn(
            "__rn", F.row_number().over(Window.orderBy(*order))
        ).select(F.col(key).alias(alias), "__rn")

    s = _numbered(source_docs, src_key, "_src__key")
    t = _numbered(target_docs, dst_key, "_dst__key")
    return s.join(t, "__rn").drop("__rn")
