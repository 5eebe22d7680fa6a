"""GraphStore — parquet-backed vertex/edge tables with upsert-on-identity.

Spark-native re-imagining of the reference's "graflo file backend"
(graflo/db/graflo_backend/connection.py — chunked JSONL + in-memory edge
index capped at 2M rows): one parquet directory per vertex type and per edge
type, snapshot-versioned so upserts are atomic and re-ingest is idempotent
(the reference's reload-merges-on-keys property, db/conn.py:390-404).

Scale notes: an upsert is a single shuffle on the identity columns (the
merge aggregate); snapshots avoid read-modify-write races on object stores.
On a production lakehouse the same API maps 1:1 onto Delta/Iceberg
``MERGE INTO`` keyed on identity — this implementation keeps zero deps.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graflo_spark.container import GraphBatch
from graflo_spark.manifest import CoreSchema, EdgeId, IndexConfig, IndexType


class GraphStore:
    def __init__(self, spark: SparkSession, root: str, schema: CoreSchema):
        self.spark = spark
        self.root = root
        self.schema = schema

    # ------------------------------------------------------------- layout
    def _table_dir(self, kind: str, name: str) -> str:
        return os.path.join(self.root, kind, name)

    def _latest_snapshot(self, table_dir: str) -> str | None:
        snaps = os.path.join(table_dir, "snapshots")
        if not os.path.isdir(snaps):
            return None
        gens = sorted((int(d) for d in os.listdir(snaps) if d.isdigit()), reverse=True)
        for g in gens:
            d = os.path.join(snaps, str(g))
            if os.path.exists(os.path.join(d, "_SUCCESS")):
                return d
        return None

    def _write_snapshot(self, table_dir: str, df: DataFrame, keep: int = 2) -> None:
        snaps = os.path.join(table_dir, "snapshots")
        os.makedirs(snaps, exist_ok=True)
        gens = [int(d) for d in os.listdir(snaps) if d.isdigit()]
        nxt = (max(gens) + 1) if gens else 0
        df.write.mode("overwrite").parquet(os.path.join(snaps, str(nxt)))
        for g in sorted(gens, reverse=True)[keep - 1:]:
            shutil.rmtree(os.path.join(snaps, str(g)), ignore_errors=True)

    # ---------------------------------------------------------------- DDL
    def apply_target_schema(self, recreate: bool = False) -> None:
        """Reference Connection.apply_target_schema (db/conn.py:303-319)."""
        if recreate:
            self.delete_graph_structure()
        os.makedirs(self.root, exist_ok=True)
        meta = {
            "vertices": {
                v.name: {
                    "identity": v.identity_fields,
                    "fields": v.field_names,
                    **(
                        {"indexes": [self._index_meta(i) for i in v.indexes]}
                        if v.indexes
                        else {}
                    ),
                }
                for v in self.schema.vertices
            },
            "edges": [
                {
                    "source": e.source,
                    "target": e.target,
                    "relation": e.relation,
                    **(
                        {"indexes": [self._index_meta(i) for i in e.indexes]}
                        if e.indexes
                        else {}
                    ),
                }
                for e in self.schema.edges
            ],
        }
        with open(os.path.join(self.root, "graph_schema.json"), "w") as f:
            json.dump(meta, f, indent=2)

    def clear_data(self) -> None:
        for kind in ("vertices", "edges"):
            shutil.rmtree(os.path.join(self.root, kind), ignore_errors=True)

    def delete_graph_structure(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)

    def introspect_schema(self) -> dict:
        with open(os.path.join(self.root, "graph_schema.json")) as f:
            return json.load(f)

    # ------------------------------------------------------------- indexes
    @staticmethod
    def _index_meta(i: IndexConfig) -> dict:
        return {
            "fields": list(i.fields),
            "type": i.type.value,
            "unique": i.unique,
            "sparse": i.sparse,
        }

    def _vertex_indexes(self, name: str) -> list[IndexConfig]:
        try:
            return self.schema.vertex(name).indexes
        except KeyError:
            return []

    @staticmethod
    def _apply_index_layout(df: DataFrame, indexes: list[IndexConfig]) -> DataFrame:
        """Spark's honest analog of a secondary index (reference
        Connection.define_indexes, db/conn.py:658-674): sort each file by the
        first sortable index's fields so parquet row-group min/max statistics
        give point-lookup data skipping. FULLTEXT has no columnar analog
        (downstream text ops cover that surface)."""
        for idx in indexes:
            if idx.type is IndexType.FULLTEXT:
                continue
            cols = [c for c in idx.fields if c in df.columns]
            if cols:
                return df.sortWithinPartitions(*cols)
        return df

    def verify_unique_indexes(self, name: str) -> None:
        """Enforce declared ``unique`` indexes (the reference delegates this
        to backend DDL; here it is an explicit count == countDistinct check,
        one aggregate per index). ``sparse`` uniqueness ignores null keys."""
        indexes = [i for i in self._vertex_indexes(name) if i.unique]
        if not indexes:
            return
        df = self.read_vertices(name)
        for idx in indexes:
            keyed = df
            if idx.sparse:
                keyed = keyed.na.drop(subset=list(idx.fields), how="any")
            # struct() so null keys count as distinct values rather than
            # being skipped by COUNT(DISTINCT col, ...)
            total, distinct = keyed.select(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.struct(*[F.col(c) for c in idx.fields])).alias("d"),
            ).first()
            if total != distinct:
                raise ValueError(
                    f"unique index {idx.fields} on {name!r} violated: "
                    f"{total} rows, {distinct} distinct keys"
                )

    # -------------------------------------------------------------- write
    def upsert_vertices(self, name: str, df: DataFrame, dry: bool = False) -> None:
        """Match on identity, update-or-insert; newer batch fields win but
        never null-out existing values (merge-on-keys reload semantics)."""
        if dry:
            df.explain()
            return
        identity = [
            f for f in self.schema.vertex(name).identity_fields if f in df.columns
        ]
        table_dir = self._table_dir("vertices", name)
        latest = self._latest_snapshot(table_dir)
        incoming = df.withColumn("__gen", F.lit(1))
        if latest is not None:
            existing = self.spark.read.parquet(latest).withColumn("__gen", F.lit(0))
            incoming = existing.unionByName(incoming, allowMissingColumns=True)
        if identity:
            value_cols = [c for c in incoming.columns if c not in identity + ["__gen"]]
            aggs = [
                F.max_by(F.col(c), F.when(F.col(c).isNotNull(), F.col("__gen"))).alias(c)
                for c in value_cols
            ]
            merged = (
                incoming.groupBy(*identity).agg(*aggs)
                if value_cols
                else incoming.select(*identity).dropDuplicates()
            )
        else:
            merged = incoming.drop("__gen").dropDuplicates()
        merged = merged.drop("__gen") if "__gen" in merged.columns else merged
        self._write_snapshot(
            table_dir, self._apply_index_layout(merged, self._vertex_indexes(name))
        )

    def insert_edges(
        self, eid: EdgeId, df: DataFrame, on_duplicate: str = "ignore", dry: bool = False
    ) -> None:
        """Reference insert_edges_batch (db/conn.py:406-441): ``ignore`` keeps
        the first occurrence of a duplicate tuple, ``upsert`` lets new
        property values replace old ones."""
        if dry:
            df.explain()
            return
        table_dir = self._table_dir("edges", eid.table_name())
        latest = self._latest_snapshot(table_dir)
        incoming = df.withColumn("__gen", F.lit(1))
        if latest is not None:
            existing = self.spark.read.parquet(latest).withColumn("__gen", F.lit(0))
            incoming = existing.unionByName(incoming, allowMissingColumns=True)
        key_cols = [c for c in incoming.columns if c.startswith(("_src_", "_dst_"))]
        if "_relation" in incoming.columns:
            key_cols.append("_relation")
        edge = self.schema.edge(eid.source, eid.target, eid.relation) if self._declared(eid) else None
        if edge is not None and edge.identities:
            key_cols += [c for c in edge.identities if c in incoming.columns]
        value_cols = [c for c in incoming.columns if c not in key_cols + ["__gen"]]
        if value_cols:
            # upsert = never-null-out merge, matching upsert_vertices: a NULL
            # in the incoming batch must not erase an existing value, so the
            # max_by ordering is gated on the value being non-null.
            if on_duplicate == "upsert":
                aggs = [
                    F.max_by(
                        F.col(c), F.when(F.col(c).isNotNull(), F.col("__gen"))
                    ).alias(c)
                    for c in value_cols
                ]
            else:
                # ignore = keep the existing row wholesale. All columns share
                # ONE ordering (so the winner is a consistent row, not a
                # per-column mix), and intra-batch ties (__gen equal) break on
                # a value hash — deterministic regardless of partitioning.
                order = F.struct(
                    (-F.col("__gen")).alias("g"),
                    F.xxhash64(*[F.col(c) for c in value_cols]).alias("h"),
                )
                aggs = [F.max_by(F.col(c), order).alias(c) for c in value_cols]
            merged = incoming.groupBy(*key_cols).agg(*aggs)
        else:
            merged = incoming.select(*key_cols).dropDuplicates()
        if edge is not None and edge.indexes:
            merged = self._apply_index_layout(merged, edge.indexes)
        self._write_snapshot(table_dir, merged)

    def _declared(self, eid: EdgeId) -> bool:
        try:
            self.schema.edge(eid.source, eid.target, eid.relation)
            return True
        except KeyError:
            return False

    def write_batch(self, batch: GraphBatch, dry: bool = False) -> None:
        for name, df in batch.vertices.items():
            self.upsert_vertices(name, df, dry=dry)
        for eid, df in batch.edges.items():
            self.insert_edges(eid, df, dry=dry)

    # --------------------------------------------------------------- read
    def read_vertices(self, name: str) -> DataFrame:
        latest = self._latest_snapshot(self._table_dir("vertices", name))
        if latest is None:
            raise FileNotFoundError(f"vertex table {name} is empty")
        return self.spark.read.parquet(latest)

    def read_edges(self, eid: EdgeId) -> DataFrame:
        latest = self._latest_snapshot(self._table_dir("edges", eid.table_name()))
        if latest is None:
            raise FileNotFoundError(f"edge table {eid.table_name()} is empty")
        return self.spark.read.parquet(latest)

    def edge_ids(self) -> list[EdgeId]:
        out = []
        edir = os.path.join(self.root, "edges")
        if not os.path.isdir(edir):
            return out
        for e in self.schema.edges:
            if os.path.isdir(os.path.join(edir, e.edge_id.table_name())):
                out.append(e.edge_id)
        return out

    def vertex_names(self) -> list[str]:
        vdir = os.path.join(self.root, "vertices")
        if not os.path.isdir(vdir):
            return []
        return [v.name for v in self.schema.vertices if os.path.isdir(os.path.join(vdir, v.name))]

    def extra_weights(
        self,
        edge_df: DataFrame,
        vertex: str,
        on: dict[str, str],
        fields: list[str],
        prefix: str | None = None,
    ) -> DataFrame:
        """DB-round-trip edge enrichment (reference extra_weights,
        hq/db_writer.py:355-387 + fetch_present_documents): join edges
        against the *persisted* vertex table — dimension side broadcast."""
        from graflo_spark.compiler import add_vertex_weights

        return add_vertex_weights(
            edge_df, self.read_vertices(vertex), on=on, fields=fields,
            prefix=prefix or vertex,
        )

    def as_view(self) -> "GraphView":
        from graflo_spark.query import GraphView

        return GraphView(
            vertices={n: self.read_vertices(n) for n in self.vertex_names()},
            edges={eid: self.read_edges(eid) for eid in self.edge_ids()},
            schema=self.schema,
        )
