"""Manifest evolution + migration (SURVEY §1.3 "evolved", §2.12).

Reference surface: ~40 declarative manifest ops (graflo/architecture/
evolution/__init__.py:10-59 — Add/Remove/Rename Vertices/Edges/Properties,
ReplaceIdentityOp, MergeVerticesOp, RetargetEdgesOp, ComposeManifestsOp,
SanitizeOp, ...) plus a diff/plan/apply migration layer (graflo/migrate/).

Spark design: every op is a pure ``CoreSchema -> CoreSchema`` transform
(driver-side, no Spark involved), and ops that change physical layout also
know how to migrate a :class:`GraphStore` — each table migration is one
read-transform-write snapshot (columnar, atomic by snapshot versioning; on a
lakehouse these emit ``ALTER TABLE`` / ``MERGE`` instead).
"""

from __future__ import annotations

import copy
import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import functions as F

from graflo_spark.manifest import (
    CoreSchema,
    Edge,
    EdgeId,
    Field,
    IndexConfig,
    Vertex,
)


@dataclass
class EvolutionOp:
    """Base: pure schema transform; ``migrate(store)`` optionally rewrites
    physical tables to match (call after the schema is updated)."""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        raise NotImplementedError

    def migrate(self, store) -> None:  # pragma: no cover - default no-op
        pass


def _clone(schema: CoreSchema) -> CoreSchema:
    return copy.deepcopy(schema)


# ------------------------------------------------------------------ vertices

@dataclass
class AddVertexOp(EvolutionOp):
    vertex: Vertex = None  # type: ignore[assignment]

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        if self.vertex.name in s.vertex_names:
            raise ValueError(f"vertex {self.vertex.name!r} already declared")
        s.vertices.append(copy.deepcopy(self.vertex))
        return s


@dataclass
class RemoveVertexOp(EvolutionOp):
    name: str = ""
    cascade: bool = True  # drop incident edges too

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        if self.name not in s.vertex_names:
            raise KeyError(self.name)
        incident = s.incident_edges(self.name)
        if incident and not self.cascade:
            raise ValueError(f"vertex {self.name!r} has incident edges")
        s.vertices = [v for v in s.vertices if v.name != self.name]
        s.edges = [e for e in s.edges if self.name not in (e.source, e.target)]
        return s

    def migrate(self, store) -> None:
        import shutil

        shutil.rmtree(store._table_dir("vertices", self.name), ignore_errors=True)


@dataclass
class RenameVertexOp(EvolutionOp):
    old: str = ""
    new: str = ""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        if self.new in s.vertex_names:
            raise ValueError(f"vertex {self.new!r} already declared")
        s.vertex(self.old).name = self.new
        for e in s.edges:
            if e.source == self.old:
                e.source = self.new
            if e.target == self.old:
                e.target = self.new
        return s

    def migrate(self, store) -> None:
        import os

        old_dir = store._table_dir("vertices", self.old)
        if os.path.isdir(old_dir):
            os.rename(old_dir, store._table_dir("vertices", self.new))
        # edge table dirs embed endpoint names: <src>__<rel>__<tgt>
        edir = os.path.join(store.root, "edges")
        if os.path.isdir(edir):
            for d in os.listdir(edir):
                parts = d.split("__")
                if len(parts) == 3 and (parts[0] == self.old or parts[2] == self.old):
                    parts[0] = self.new if parts[0] == self.old else parts[0]
                    parts[2] = self.new if parts[2] == self.old else parts[2]
                    os.rename(os.path.join(edir, d), os.path.join(edir, "__".join(parts)))


# ---------------------------------------------------------------- properties

@dataclass
class AddPropertyOp(EvolutionOp):
    vertex: str = ""
    prop: Field = None  # type: ignore[assignment]

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        v = s.vertex(self.vertex)
        if self.prop.name in v.field_names:
            raise ValueError(f"{self.vertex}.{self.prop.name} already declared")
        v.fields.append(self.prop)
        return s


@dataclass
class RemovePropertyOp(EvolutionOp):
    vertex: str = ""
    prop: str = ""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        v = s.vertex(self.vertex)
        if self.prop in v.identity:
            raise ValueError(f"cannot remove identity column {self.prop!r}")
        v.fields = [f for f in v.fields if f.name != self.prop]
        return s

    def migrate(self, store) -> None:
        try:
            df = store.read_vertices(self.vertex)
        except FileNotFoundError:
            return
        if self.prop in df.columns:
            store._write_snapshot(
                store._table_dir("vertices", self.vertex), df.drop(self.prop)
            )


@dataclass
class RenamePropertyOp(EvolutionOp):
    vertex: str = ""
    old: str = ""
    new: str = ""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        v = s.vertex(self.vertex)
        if self.old not in v.field_names:
            raise KeyError(f"{self.vertex}.{self.old}")
        v.fields = [
            Field(self.new, f.type, f.item_type) if f.name == self.old else f
            for f in v.fields
        ]
        v.identity = [self.new if c == self.old else c for c in v.identity]
        v.identity_funnel = [
            [self.new if c == self.old else c for c in branch]
            for branch in v.identity_funnel
        ]
        v.secondary_identities = {
            k: [self.new if c == self.old else c for c in cols]
            for k, cols in v.secondary_identities.items()
        }
        return s

    def migrate(self, store) -> None:
        try:
            df = store.read_vertices(self.vertex)
        except FileNotFoundError:
            return
        if self.old in df.columns:
            store._write_snapshot(
                store._table_dir("vertices", self.vertex),
                df.withColumnRenamed(self.old, self.new),
            )


@dataclass
class ReplaceIdentityOp(EvolutionOp):
    """Swap a vertex's identity columns; data migration re-dedups on the new
    key (reference ReplaceIdentityOp)."""

    vertex: str = ""
    identity: list[str] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        v = s.vertex(self.vertex)
        missing = [c for c in self.identity if c not in v.field_names]
        if missing:
            raise ValueError(f"identity columns {missing} not declared on {self.vertex}")
        v.identity = list(self.identity)
        return s

    def migrate(self, store) -> None:
        try:
            df = store.read_vertices(self.vertex)
        except FileNotFoundError:
            return
        store._write_snapshot(
            store._table_dir("vertices", self.vertex),
            df.dropDuplicates([c for c in self.identity if c in df.columns]),
        )


# -------------------------------------------------------------------- edges

@dataclass
class AddEdgeOp(EvolutionOp):
    edge: Edge = None  # type: ignore[assignment]

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        for endpoint in (self.edge.source, self.edge.target):
            if endpoint not in s.vertex_names:
                raise ValueError(f"edge references undeclared vertex {endpoint!r}")
        if any(e.edge_id == self.edge.edge_id for e in s.edges):
            raise ValueError(f"edge {self.edge.edge_id} already declared")
        s.edges.append(copy.deepcopy(self.edge))
        return s


@dataclass
class RemoveEdgeOp(EvolutionOp):
    edge_id: EdgeId = None  # type: ignore[assignment]

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        before = len(s.edges)
        s.edges = [e for e in s.edges if e.edge_id != self.edge_id]
        if len(s.edges) == before:
            raise KeyError(self.edge_id)
        return s

    def migrate(self, store) -> None:
        import shutil

        shutil.rmtree(
            store._table_dir("edges", self.edge_id.table_name()), ignore_errors=True
        )


@dataclass
class RetargetEdgesOp(EvolutionOp):
    """Repoint edges from one endpoint vertex to another (reference
    RetargetEdgesOp). Data migration remaps the endpoint key columns through
    a provided key-mapping DataFrame (old_key -> new_key)."""

    old_vertex: str = ""
    new_vertex: str = ""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        if self.new_vertex not in s.vertex_names:
            raise ValueError(f"vertex {self.new_vertex!r} not declared")
        for e in s.edges:
            if e.source == self.old_vertex:
                e.source = self.new_vertex
            if e.target == self.old_vertex:
                e.target = self.new_vertex
        return s


@dataclass
class MergeVerticesOp(EvolutionOp):
    """Merge vertex type ``other`` into ``into``: union fields, retarget
    edges, drop ``other`` (reference MergeVerticesOp). Data migration unions
    the two vertex tables and re-dedups on ``into``'s identity."""

    into: str = ""
    other: str = ""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        dst, src = s.vertex(self.into), s.vertex(self.other)
        have = set(dst.field_names)
        dst.fields += [f for f in src.fields if f.name not in have]
        s = RetargetEdgesOp(self.other, self.into).apply(s)
        s.vertices = [v for v in s.vertices if v.name != self.other]
        # a merge can create self-loops or duplicate edge ids; keep first
        seen, edges = set(), []
        for e in s.edges:
            if e.edge_id not in seen:
                seen.add(e.edge_id)
                edges.append(e)
        s.edges = edges
        return s

    def migrate(self, store) -> None:
        import shutil

        try:
            a = store.read_vertices(self.into)
        except FileNotFoundError:
            a = None
        try:
            b = store.read_vertices(self.other)
        except FileNotFoundError:
            b = None
        if b is not None:
            merged = b if a is None else a.unionByName(b, allowMissingColumns=True)
            identity = [
                c for c in store.schema.vertex(self.into).identity_fields
                if c in merged.columns
            ]
            if identity:
                merged = merged.dropDuplicates(identity)
            store._write_snapshot(store._table_dir("vertices", self.into), merged)
            shutil.rmtree(store._table_dir("vertices", self.other), ignore_errors=True)


@dataclass
class RenameEdgeRelationOp(EvolutionOp):
    """Rename an edge type's relation (reference RenameEdgesOp). The edge
    table directory embeds the relation, so migration is a rename."""

    edge_id: EdgeId = None  # type: ignore[assignment]
    new_relation: str = ""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        new_id = EdgeId(self.edge_id.source, self.edge_id.target, self.new_relation)
        if any(e.edge_id == new_id for e in s.edges):
            raise ValueError(f"edge {new_id} already declared")
        for e in s.edges:
            if e.edge_id == self.edge_id:
                e.relation = self.new_relation
                return s
        raise KeyError(self.edge_id)

    def migrate(self, store) -> None:
        import os

        old_dir = store._table_dir("edges", self.edge_id.table_name())
        if not os.path.isdir(old_dir):
            return
        new_id = EdgeId(self.edge_id.source, self.edge_id.target, self.new_relation)
        os.rename(old_dir, store._table_dir("edges", new_id.table_name()))
        # _relation column carries the relation name on dynamic edges
        try:
            df = store.read_edges(new_id)
        except FileNotFoundError:
            return
        if "_relation" in df.columns:
            store._write_snapshot(
                store._table_dir("edges", new_id.table_name()),
                df.withColumn("_relation", F.lit(self.new_relation)),
            )


# ------------------------------------------------------------------- indexes

@dataclass
class AddIndexOp(EvolutionOp):
    """Declare an index on a vertex or edge type (reference AddIndexesOp);
    migration rewrites the table with the new sort layout and verifies a
    ``unique`` constraint before accepting it."""

    vertex: str = ""
    edge_id: EdgeId | None = None
    index: IndexConfig = None  # type: ignore[assignment]

    def _target(self, schema: CoreSchema):
        if self.edge_id is not None:
            return schema.edge(
                self.edge_id.source, self.edge_id.target, self.edge_id.relation
            )
        return schema.vertex(self.vertex)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        t = self._target(s)
        if any(i.fields == self.index.fields and i.type == self.index.type
               for i in t.indexes):
            raise ValueError(f"index on {self.index.fields} already declared")
        if isinstance(t, Vertex):
            missing = [c for c in self.index.fields if c not in t.field_names]
            if missing:
                raise ValueError(
                    f"index fields {missing} not declared on vertex {t.name!r}"
                )
        t.indexes.append(self.index)
        return s

    def migrate(self, store) -> None:
        if self.edge_id is not None:
            try:
                df = store.read_edges(self.edge_id)
            except FileNotFoundError:
                return
            store._write_snapshot(
                store._table_dir("edges", self.edge_id.table_name()),
                store._apply_index_layout(df, [self.index]),
            )
            return
        try:
            df = store.read_vertices(self.vertex)
        except FileNotFoundError:
            return
        if self.index.unique:
            store.verify_unique_indexes(self.vertex)
        store._write_snapshot(
            store._table_dir("vertices", self.vertex),
            store._apply_index_layout(df, [self.index]),
        )


@dataclass
class RemoveIndexOp(EvolutionOp):
    vertex: str = ""
    edge_id: EdgeId | None = None
    fields: tuple[str, ...] = ()

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        t = (
            s.edge(self.edge_id.source, self.edge_id.target, self.edge_id.relation)
            if self.edge_id is not None
            else s.vertex(self.vertex)
        )
        before = len(t.indexes)
        t.indexes = [i for i in t.indexes if i.fields != tuple(self.fields)]
        if len(t.indexes) == before:
            raise KeyError(self.fields)
        return s


# ---------------------------------------------------------------- composites

def camel_to_snake(name: str) -> str:
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s).lower().replace("-", "_")


@dataclass
class SanitizeOp(EvolutionOp):
    """Normalize all vertex/edge/property names to snake_case (reference
    SanitizeOp)."""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        renames = {v.name: camel_to_snake(v.name) for v in s.vertices}
        for v in s.vertices:
            v.name = renames[v.name]
            v.fields = [
                Field(camel_to_snake(f.name), f.type, f.item_type) for f in v.fields
            ]
            v.identity = [camel_to_snake(c) for c in v.identity]
            v.identity_funnel = [
                [camel_to_snake(c) for c in b] for b in v.identity_funnel
            ]
            v.secondary_identities = {
                camel_to_snake(k): [camel_to_snake(c) for c in cols]
                for k, cols in v.secondary_identities.items()
            }
        for e in s.edges:
            e.source = renames.get(e.source, camel_to_snake(e.source))
            e.target = renames.get(e.target, camel_to_snake(e.target))
            if e.relation is not None:
                e.relation = camel_to_snake(e.relation)
        return s


@dataclass
class ComposeManifestsOp(EvolutionOp):
    """Union another schema into this one (reference ComposeManifestsOp):
    same-name vertices must agree on identity; their field sets union."""

    other: CoreSchema = None  # type: ignore[assignment]

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        by_name = {v.name: v for v in s.vertices}
        for ov in self.other.vertices:
            if ov.name in by_name:
                v = by_name[ov.name]
                if v.identity != ov.identity:
                    raise ValueError(
                        f"compose conflict: {ov.name} identity {v.identity} != {ov.identity}"
                    )
                have = set(v.field_names)
                v.fields += [f for f in ov.fields if f.name not in have]
            else:
                s.vertices.append(copy.deepcopy(ov))
        have_edges = {e.edge_id for e in s.edges}
        s.edges += [
            copy.deepcopy(e) for e in self.other.edges if e.edge_id not in have_edges
        ]
        return s


# ------------------------------------------------------------- diff/plan/apply

def diff(old: CoreSchema, new: CoreSchema) -> list[EvolutionOp]:
    """Structural diff -> ordered op plan (reference migrate/diff.py +
    planner.py). Renames are not guessed — a rename appears as remove+add
    (the reference's planner has the same default)."""
    ops: list[EvolutionOp] = []
    old_v, new_v = set(old.vertex_names), set(new.vertex_names)
    for name in sorted(new_v - old_v):
        ops.append(AddVertexOp(new.vertex(name)))
    for name in sorted(old_v & new_v):
        ov, nv = old.vertex(name), new.vertex(name)
        for f in nv.fields:
            if f.name not in ov.field_names:
                ops.append(AddPropertyOp(name, f))
        for f in ov.fields:
            if f.name not in nv.field_names:
                ops.append(RemovePropertyOp(name, f.name))
        if ov.identity != nv.identity:
            ops.append(ReplaceIdentityOp(name, nv.identity))
    old_e = {e.edge_id for e in old.edges}
    new_e = {e.edge_id for e in new.edges}
    for e in new.edges:
        if e.edge_id not in old_e:
            ops.append(AddEdgeOp(e))
    for e in old.edges:
        if e.edge_id not in new_e:
            ops.append(RemoveEdgeOp(e.edge_id))
    # vertex removals last (after dependent edge removals)
    for name in sorted(old_v - new_v):
        ops.append(RemoveVertexOp(name))
    return ops


def apply_plan(
    schema: CoreSchema, ops: list[EvolutionOp], store=None
) -> CoreSchema:
    """Apply an op plan; when ``store`` is given, each op also migrates the
    physical tables (reference migrate apply; store.schema is updated so
    later ops see the evolved layout)."""
    for op in ops:
        schema = op.apply(schema)
        if store is not None:
            store.schema = schema
            op.migrate(store)
            store.apply_target_schema()
    return schema
