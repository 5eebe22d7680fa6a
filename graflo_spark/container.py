"""GraphBatch — the covariant vertex/edge DataFrame batch.

Spark re-expression of the reference's GraphContainer
(graflo/architecture/graph_types/container.py:53-151): per-type vertex
DataFrames and per-EdgeId edge DataFrames. ``pick_unique`` is
``dropDuplicates``; cross-batch union is ``unionByName``.

Edge DataFrame convention: ``_src_<field>`` / ``_dst_<field>`` columns for the
endpoint match fields, optional ``_relation`` column (per-row relation), plus
edge-property columns under their own names.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graflo_spark.manifest import CoreSchema, EdgeId


@dataclass
class GraphBatch:
    vertices: dict[str, DataFrame] = dc_field(default_factory=dict)
    edges: dict[EdgeId, DataFrame] = dc_field(default_factory=dict)

    def union(self, other: "GraphBatch") -> "GraphBatch":
        out = GraphBatch(dict(self.vertices), dict(self.edges))
        for name, df in other.vertices.items():
            out.vertices[name] = (
                out.vertices[name].unionByName(df, allowMissingColumns=True)
                if name in out.vertices
                else df
            )
        for eid, df in other.edges.items():
            out.edges[eid] = (
                out.edges[eid].unionByName(df, allowMissingColumns=True)
                if eid in out.edges
                else df
            )
        return out

    def pick_unique(self, schema: CoreSchema) -> "GraphBatch":
        """Content dedup (reference container.py:108-113): vertices on their
        identity columns, edges on the full tuple."""
        vertices = {}
        for name, df in self.vertices.items():
            identity = schema.vertex(name).identity_fields
            keys = [k for k in identity if k in df.columns]
            vertices[name] = df.dropDuplicates(keys) if keys else df.dropDuplicates()
        edges = {eid: df.dropDuplicates() for eid, df in self.edges.items()}
        return GraphBatch(vertices, edges)

    def counts(self) -> DataFrame:
        """Per-type sizes — the reference's golden ``*_sizes.yaml`` check
        (test/ref/cast/ibes_sizes.yaml) as one DataFrame."""
        parts = []
        for name, df in sorted(self.vertices.items()):
            parts.append(
                df.agg(F.count(F.lit(1)).alias("n")).select(
                    F.lit("vertex").alias("kind"),
                    F.lit(name).alias("type_name"),
                    F.col("n"),
                )
            )
        for eid, df in sorted(self.edges.items(), key=lambda kv: kv[0].table_name()):
            parts.append(
                df.agg(F.count(F.lit(1)).alias("n")).select(
                    F.lit("edge").alias("kind"),
                    F.lit(eid.table_name()).alias("type_name"),
                    F.col("n"),
                )
            )
        if not parts:
            raise ValueError("empty GraphBatch")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def counts_distinct(self, schema: CoreSchema) -> DataFrame:
        """Per-type DISTINCT sizes, for use on a pre-``pick_unique`` batch:
        equivalent to ``pick_unique(schema).counts()``.

        Each frame dedups on its own tuple (vertex identity columns, full
        tuple for edges) with ``dropDuplicates`` — null-safe equality, no
        serialization of the tuple — and counts the survivors; the union
        carries one row per type. Compiled frames are already distinct on
        exactly this tuple and hash-partitioned by it, so the per-frame
        dedup adds no exchange (EnsureRequirements reuses the compile
        dedup's partitioning) and the only new exchanges are the 14
        single-row count collects. The previous shape (to_json of every
        tuple unioned into one global two-level count_distinct) shuffled
        ~1.2M JSON strings through 2 extra wide exchanges at sf0.1."""

        def counted(df: DataFrame, kind: str, name: str, cols) -> DataFrame:
            return (
                df.select(*[F.col(c) for c in cols])
                .dropDuplicates()
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.lit(kind).alias("kind"),
                    F.lit(name).alias("type_name"),
                    F.col("n"),
                )
            )

        parts = []
        for name, df in sorted(self.vertices.items()):
            identity = schema.vertex(name).identity_fields
            keys = [c for c in identity if c in df.columns] or df.columns
            parts.append(counted(df, "vertex", name, keys))
        for eid, df in sorted(self.edges.items(), key=lambda kv: kv[0].table_name()):
            parts.append(counted(df, "edge", eid.table_name(), df.columns))
        if not parts:
            raise ValueError("empty GraphBatch")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
