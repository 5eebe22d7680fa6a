"""Schema & identity inference (SURVEY §1.3).

Reference behaviors re-expressed Spark-first:
    - identity-key discovery from data: uniqueness ratios + greedy composite
      key (graflo/db/identity_inference.py, db/cross_resource_identity.py) —
      here each probe is ONE hash-aggregate pass (count / count_distinct),
      so a 100 TB table costs a scan per greedy step, nothing quadratic;
    - relational 3NF inference: PK/FK heuristics classifying tables into
      vertex tables vs junction (edge) tables
      (graflo/db/postgres/schema_inference.py:24-110,
      graflo/architecture/onto_sql.py). Without catalog FK metadata we prove
      FKs from the data itself: distinct-value containment via a semi-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_uniqueness(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column uniqueness evidence in ONE aggregate pass.

    Returns ``(column_name, n_distinct, n_nonnull, n_rows, uniqueness)``
    where ``uniqueness = n_distinct / n_rows`` (the reference's ratio; a
    column with ratio 1.0 and no nulls is a perfect natural key).
    """
    cols = cols or df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.countDistinct(F.col(c)).alias(f"__d_{c}") for c in cols],
        *[F.count(F.col(c)).alias(f"__nn_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', __d_{c}, __nn_{c}" for c in cols)
    return agg.selectExpr(
        "__n", f"stack({len(cols)}, {stack}) AS (column_name, n_distinct, n_nonnull)"
    ).select(
        "column_name",
        "n_distinct",
        "n_nonnull",
        F.col("__n").alias("n_rows"),
        (F.col("n_distinct").cast("double") / F.col("__n")).alias("uniqueness"),
    )


def propose_identity(
    df: DataFrame, candidate_cols: list[str] | None = None, max_width: int = 4
) -> list[str]:
    """Greedy composite-key proposal (reference identity_inference funnel:
    start from the most selective column, extend until the combination is
    unique or ``max_width`` is hit). Returns the proposed column list; empty
    when no combination within ``max_width`` is unique.

    Each greedy step is one aggregate job; the driver only sees counts.
    """
    stats = {
        r["column_name"]: r
        for r in column_uniqueness(df, candidate_cols).collect()
    }
    if not stats:
        return []
    n_rows = next(iter(stats.values()))["n_rows"]
    if n_rows == 0:
        return []
    # no-null columns only, most selective first (name tiebreak = determinism)
    ranked = sorted(
        (c for c, r in stats.items() if r["n_nonnull"] == n_rows),
        key=lambda c: (-stats[c]["n_distinct"], c),
    )
    chosen: list[str] = []
    for c in ranked[:max_width]:
        chosen.append(c)
        if len(chosen) == 1:
            distinct = stats[c]["n_distinct"]
        else:
            distinct = df.select(*chosen).distinct().count()
        if distinct == n_rows:
            return chosen
    return []


@dataclass
class FkCandidate:
    child_table: str
    child_column: str
    parent_table: str
    parent_column: str


def fk_containment(
    tables: dict[str, DataFrame], candidates: list[FkCandidate]
) -> DataFrame:
    """Containment evidence for FK candidates, as one unioned lazy plan.

    For each candidate: ``containment`` = fraction of distinct non-null child
    values present in the parent column. A true FK scores 1.0. Each leg is a
    distinct-project + left-semi join — the parent side is distinct-projected
    first, so even a 100 TB fact table only shuffles its key column.
    """
    parts = []
    for c in candidates:
        child = (
            tables[c.child_table]
            .select(F.col(c.child_column).alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct()
        )
        parent = tables[c.parent_table].select(
            F.col(c.parent_column).alias("__v")
        ).distinct()
        matched = child.join(parent, "__v", "left_semi")
        parts.append(
            child.agg(F.count(F.lit(1)).alias("n_child_distinct")).crossJoin(
                matched.agg(F.count(F.lit(1)).alias("n_contained"))
            ).select(
                F.lit(c.child_table).alias("child_table"),
                F.lit(c.child_column).alias("child_column"),
                F.lit(c.parent_table).alias("parent_table"),
                F.lit(c.parent_column).alias("parent_column"),
                "n_child_distinct",
                "n_contained",
                (F.col("n_contained").cast("double") / F.col("n_child_distinct")).alias(
                    "containment"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def classify_tables(
    tables: dict[str, DataFrame],
    fk_evidence: DataFrame,
    containment_threshold: float = 0.999,
) -> DataFrame:
    """Vertex-vs-junction classification from inferred FKs (reference
    onto_sql vertex/edge(junction) table classification).

    Rule: a table with >= 2 proven FK columns and NO single-column natural
    key (no column with uniqueness 1.0) is a junction (edge) table; anything
    else is a vertex table. Returns ``(table_name, n_fks, has_unique_column,
    table_kind)``.
    """
    fks = (
        fk_evidence.filter(F.col("containment") >= containment_threshold)
        .groupBy(F.col("child_table").alias("table_name"))
        .agg(F.countDistinct("child_column").alias("n_fks"))
    )
    uniq_parts = []
    for name, df in tables.items():
        u = column_uniqueness(df).agg(
            F.max((F.col("n_distinct") == F.col("n_rows")).cast("int")).alias("u")
        )
        uniq_parts.append(
            u.select(
                F.lit(name).alias("table_name"),
                (F.col("u") == 1).alias("has_unique_column"),
            )
        )
    uniq = uniq_parts[0]
    for p in uniq_parts[1:]:
        uniq = uniq.unionByName(p)
    return (
        uniq.join(fks, "table_name", "left")
        .na.fill({"n_fks": 0})
        .select(
            "table_name",
            "n_fks",
            "has_unique_column",
            F.when(
                (F.col("n_fks") >= 2) & (~F.col("has_unique_column")),
                F.lit("junction"),
            )
            .otherwise(F.lit("vertex"))
            .alias("table_kind"),
        )
    )
