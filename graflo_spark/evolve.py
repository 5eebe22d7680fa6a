"""Manifest evolution + migration (SURVEY §1.3 "evolved", §2.12).

Reference surface: ~40 declarative manifest ops (graflo/architecture/
evolution/__init__.py:10-59 — Add/Remove/Rename Vertices/Edges/Properties,
ReplaceIdentityOp, MergeVerticesOp, RetargetEdgesOp, ComposeManifestsOp,
SanitizeOp, ...) plus a diff/plan/apply migration layer (graflo/migrate/).

33 ops at reference parity: structural (add/remove/rename/merge for
vertices, edges, properties — singular and plural forms), identity policy
(ReplaceIdentityOp with natural/hash/funnel/assigned/blank targets and
demote/keep/drop retire cascade, secondary-identity add/remove,
edge-identity replacement), physical (field-type changes, vertex/edge
indexes), projection (ProjectManifestOp with induced prune), inverse edges,
resource renames, sanitize, compose.

Spark design: every op is a pure ``CoreSchema -> CoreSchema`` transform
(driver-side, no Spark involved), and ops that change physical layout also
know how to migrate a :class:`GraphStore` — each table migration is one
read-transform-write snapshot (columnar, atomic by snapshot versioning; on a
lakehouse these emit ``ALTER TABLE`` / ``MERGE`` instead).
"""

from __future__ import annotations

import copy
import re
import warnings
from dataclasses import dataclass, field as dc_field

from pyspark.sql import functions as F

from graflo_spark.manifest import (
    CoreSchema,
    Edge,
    EdgeId,
    Field,
    FieldType,
    IdentityMode,
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
        import os
        import shutil

        shutil.rmtree(store._table_dir("vertices", self.name), ignore_errors=True)
        # cascade removed incident edges from the SCHEMA; their tables
        # must go too, or a later re-declaration of the same vertex+edge
        # would resurrect the pre-removal edge rows as current data
        # (review finding)
        edir = os.path.join(store.root, "edges")
        if os.path.isdir(edir):
            for d in os.listdir(edir):
                parts = d.split("__")
                if len(parts) == 3 and self.name in (parts[0], parts[2]):
                    shutil.rmtree(os.path.join(edir, d), ignore_errors=True)


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


def _strip_field_from_indexes(
    indexes: list[IndexConfig], gone: set[str]
) -> list[IndexConfig]:
    """Property-removal cascade for index metadata (reference
    apply.py remove_vertex_properties: removed fields are stripped from
    each index's field list; an index left with no fields is dropped).
    Stripping can make two indexes IDENTICAL — ('name','city_id') minus
    'name' collides with an existing ('city_id',) — so exact duplicates
    dedup to the first occurrence (two identical indexes are meaningless
    and an exact-dup schema is unreplayable through AddIndexOp; found by
    the r12 10k-seed convergence sweep)."""
    out: list[IndexConfig] = []
    seen: set[tuple] = set()
    for i in indexes:
        fields = tuple(c for c in i.fields if c not in gone)
        if not fields:
            continue
        cfg = (i if fields == i.fields
               else IndexConfig(fields, i.type, i.unique, i.sparse))
        key = (cfg.fields, cfg.type, cfg.unique, cfg.sparse)
        if key in seen:
            continue
        seen.add(key)
        out.append(cfg)
    return out


@dataclass
class RemovePropertyOp(EvolutionOp):
    vertex: str = ""
    prop: str = ""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        v = s.vertex(self.vertex)
        if self.prop in v.identity:
            raise ValueError(f"cannot remove identity column {self.prop!r}")
        if any(self.prop in b for b in v.identity_funnel):
            raise ValueError(
                f"cannot remove identity-funnel column {self.prop!r}")
        used_sec = sorted(k for k, cols in v.secondary_identities.items()
                          if self.prop in cols)
        if used_sec:
            raise ValueError(
                f"cannot remove {self.prop!r}: referenced by secondary "
                f"identities {used_sec}; remove those first")
        v.fields = [f for f in v.fields if f.name != self.prop]
        v.indexes = _strip_field_from_indexes(v.indexes, {self.prop})
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
        if self.new in v.field_names:
            # withColumnRenamed onto an existing name yields DUPLICATE
            # columns and an unreadable table (review finding; the edge
            # rename op already guards this)
            raise ValueError(
                f"{self.vertex}.{self.new} already exists; cannot rename "
                f"{self.old!r} onto it")
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
        # index metadata follows the rename — a stale index field makes
        # the schema unreplayable (AddIndexOp validates fields) and its
        # layout/unique checks reference a dead column (r13 fuzz class)
        v.indexes = [
            (IndexConfig(
                tuple(self.new if c == self.old else c for c in i.fields),
                i.type, i.unique, i.sparse)
             if self.old in i.fields else i)
            for i in v.indexes
        ]
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
        # renaming an IDENTITY field renames the vertex's addressing: edge
        # endpoint key columns are _src_/_dst_<identity field>, so every
        # incident edge table must follow or traversal compiles against a
        # dead column (found by the r13 migration fuzz)
        v = store.schema.vertex(self.vertex)
        if (v.identity_mode is not IdentityMode.NATURAL
                or self.new not in v.identity):
            return
        for e in store.schema.edges:
            for side, endpoint in (("_src_", e.source), ("_dst_", e.target)):
                if endpoint != self.vertex:
                    continue
                try:
                    edf = store.read_edges(e.edge_id)
                except FileNotFoundError:
                    continue
                if f"{side}{self.old}" in edf.columns:
                    store._write_snapshot(
                        store._table_dir("edges", e.edge_id.table_name()),
                        edf.withColumnRenamed(
                            f"{side}{self.old}", f"{side}{self.new}"))


@dataclass
class ReplaceIdentityOp(EvolutionOp):
    """Replace a vertex's identity POLICY — fields and/or mode (reference
    ReplaceIdentityOp + IdentityReplacement, ops.py:144-267): targets are
    ``natural`` (identity = the named columns), ``hash`` (digest of the
    named columns), ``funnel`` (ordered fallback branches -> hash mode),
    ``assigned`` / ``blank`` (synthetic key). ``retire`` says what becomes
    of the OLD identity field-set: ``demote`` turns it into a secondary
    identity named ``retire_as`` (lookup index follows), ``keep`` leaves
    the fields as plain properties, ``drop`` removes them. Demotion
    downgrades to ``keep`` when the old identity was synthetic or equals
    the new one. Data migration re-dedups on the new key."""

    vertex: str = ""
    identity: list[str] = dc_field(default_factory=list)
    mode: IdentityMode = IdentityMode.NATURAL
    funnel: list[list[str]] = dc_field(default_factory=list)
    retire: str = "demote"  # demote | keep | drop
    retire_as: str | None = None
    _old_identity: list[str] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        if self.retire not in ("demote", "keep", "drop"):
            raise ValueError(f"unknown retire policy {self.retire!r}")
        if self.retire_as is not None and self.retire != "demote":
            raise ValueError("retire_as is only meaningful with retire='demote'")
        s = _clone(schema)
        v = s.vertex(self.vertex)
        new_fields = self.identity + [c for b in self.funnel for c in b]
        missing = [c for c in new_fields if c not in v.field_names]
        if missing:
            raise ValueError(f"identity columns {missing} not declared on {self.vertex}")
        if self.mode in (IdentityMode.NATURAL, IdentityMode.HASH) and not (
            self.identity or self.funnel
        ):
            raise ValueError(f"{self.mode.value} identity needs source fields")

        old_identity = list(v.identity)
        old_synthetic = v.identity_mode is not IdentityMode.NATURAL
        # migrate() re-keys edge endpoint columns old->new; only natural
        # identities have stored key columns to re-key from
        self._old_identity = [] if old_synthetic else old_identity
        v.identity = list(self.identity)
        v.identity_mode = self.mode
        v.identity_funnel = [list(b) for b in self.funnel]

        retire = self.retire
        if retire == "demote" and (
            old_synthetic or not old_identity or old_identity == self.identity
        ):
            # nothing meaningful to demote (reference: demotion downgrades
            # to keep for synthetic or unchanged identities)
            retire = "keep"
        if retire == "demote":
            name = self.retire_as or "retired_identity"
            if name in v.secondary_identities:
                raise ValueError(
                    f"{self.vertex}: secondary identity {name!r} already declared"
                )
            v.secondary_identities[name] = old_identity
            if not any(i.fields == tuple(old_identity) for i in v.indexes):
                v.indexes.append(IndexConfig(tuple(old_identity)))
        elif retire == "drop":
            still_used = set(new_fields)
            for cols in v.secondary_identities.values():
                still_used.update(cols)
            gone = [c for c in old_identity if c not in still_used]
            v.fields = [f for f in v.fields if f.name not in gone]
            # index cascade, same as RemovePropertyOp: a dropped column
            # must not survive inside index metadata (a dangling index
            # makes the schema unreplayable — AddIndexOp validates
            # fields — and its layout/unique checks reference a column
            # that no longer exists; found by the r12 2000-seed
            # convergence sweep)
            v.indexes = _strip_field_from_indexes(v.indexes, set(gone))
        return s

    def migrate(self, store) -> None:
        try:
            df = store.read_vertices(self.vertex)
        except FileNotFoundError:
            return
        subset = [c for c in self.identity if c in df.columns]
        # conform: an identity swapped onto a DECLARED-but-never-populated
        # column materializes it as a typed NULL column — a vertex table
        # missing its identity column breaks every keyed path (r12 fuzz).
        # The dedup key stays the columns that CARRY data: deduping on an
        # all-null column would collapse the table to one arbitrary row,
        # the same failure class as dropDuplicates([]) on Spark 4.1
        # (r11 review finding) — hash/funnel/assigned identities have no
        # stored identity column, so those fall back to full-row dedup,
        # which never merges distinct rows.
        declared = {f.name: f for f in store.schema.vertex(self.vertex).fields}
        pre_mint_cols = set(df.columns)
        for c in self.identity:
            if c not in df.columns and c in declared:
                f = declared[c]
                df = df.withColumn(c, F.lit(None).cast(
                    f.type.to_spark(f.item_type)
                    if f.type is not None else "string"))
        # re-key incident edge tables from the OLD natural identity onto
        # the new one (the query._node_key addressing contract compiles
        # _src_<current identity field>, so edge tables keeping the old
        # key columns break every traversal — found by the r13 migration
        # fuzz). The mapping comes from the PRE-dedup frame: when the new
        # identity collapses rows, each old key maps to the new key of
        # ITS row, so edges follow the merge. Unmapped keys drop (the
        # resolve-endpoints inner-join contract). Runs BEFORE the vertex
        # snapshot write: the mapping reads the pre-write files lazily
        # and a size-capped write may prune the generation it reads from.
        # the guard reads the PRE-mint column set: an identity replaced
        # onto a declared-but-never-populated column would otherwise re-key
        # every incident edge onto an all-NULL column and the dedup's
        # NULL==NULL grouping would irreversibly collapse edge rows
        # (r13 advisory). Skipping keeps edges keyed on the OLD identity —
        # still addressable when retire='demote' declares it a secondary
        # identity (query._funnel_key endpoint fallback).
        new_natural = self.mode is IdentityMode.NATURAL
        rekey_wanted = (self._old_identity and new_natural
                        and self._old_identity != list(self.identity))
        if rekey_wanted and not all(c in pre_mint_cols for c in self.identity):
            warnings.warn(
                f"{self.vertex}: new identity column(s) "
                f"{[c for c in self.identity if c not in pre_mint_cols]} "
                "carry no data; incident edges stay keyed on the old "
                f"identity {self._old_identity}"
                + (" (addressable via the demoted secondary identity)"
                   if self.retire == "demote" else
                   " and are NOT addressable until the new identity is "
                   "populated and edges re-keyed"),
                stacklevel=2)
        elif (rekey_wanted
                and all(c in pre_mint_cols
                        for c in (*self._old_identity, *self.identity))):
            need = list(dict.fromkeys([*self._old_identity, *self.identity]))
            mapping = df.select(*need).dropDuplicates(self._old_identity)
            produce = [c for c in self.identity
                       if c not in self._old_identity]
            drop = [c for c in self._old_identity if c not in self.identity]
            if produce or drop:
                for e in store.schema.edges:
                    for side, endpoint in (("_src_", e.source),
                                           ("_dst_", e.target)):
                        if endpoint != self.vertex:
                            continue
                        try:
                            edf = store.read_edges(e.edge_id)
                        except FileNotFoundError:
                            continue
                        old_cols = [f"{side}{f}"
                                    for f in self._old_identity]
                        if not all(c in edf.columns for c in old_cols):
                            continue
                        lookup = mapping.select(
                            *[F.col(f).alias(c)
                              for f, c in zip(self._old_identity, old_cols)],
                            *[F.col(f).alias(f"{side}{f}__new")
                              for f in produce])
                        # rows whose OLD key is (partially) NULL are not
                        # addressed by the old primary — they ride a
                        # retained secondary from an earlier migration.
                        # The null-unsafe inner join would silently DROP
                        # them (r14 fuzz find); they bypass the re-key
                        # with their addressing untouched.
                        null_old = F.col(old_cols[0]).isNull()
                        for c in old_cols[1:]:
                            null_old = null_old | F.col(c).isNull()
                        bypass = edf.filter(null_old)
                        out = edf.filter(~null_old).join(
                            lookup, on=old_cols, how="inner")
                        if self.retire != "demote":
                            # demote keeps the old key columns on the edge:
                            # they are the demoted secondary identity's key
                            # and make rows whose NEW key is NULL still
                            # addressable (query._funnel_key fallback)
                            out = out.drop(*[f"{side}{f}" for f in drop])
                        for f in produce:
                            tgt = f"{side}{f}"
                            if tgt in out.columns:
                                # stale key column retained by an earlier
                                # migration under the same name — its
                                # funnel space is dead vs the new primary
                                # (subset prune); fresh mapping wins
                                # (AMBIGUOUS_REFERENCE — r14 fuzz find)
                                out = out.drop(tgt)
                            out = out.withColumnRenamed(f"{tgt}__new", tgt)
                        # union only when bypass rows EXIST: the union's
                        # schema-widening would otherwise resurrect
                        # dropped old key columns as all-NULL noise
                        if bypass.limit(1).count():
                            out = out.unionByName(bypass,
                                                  allowMissingColumns=True)
                        key_cols = [c for c in out.columns
                                    if c.startswith(("_src_", "_dst_"))]
                        if "_relation" in out.columns:
                            key_cols.append("_relation")
                        out = out.dropDuplicates(key_cols)
                        # a PARTIALLY populated replacement identity maps
                        # some endpoints to NULL keys — never silently
                        # (the r14 fuzz invariant): with retire='demote'
                        # the retained old key columns keep those rows
                        # addressable via the funnel, otherwise they are
                        # unaddressable until re-keyed
                        null_key = F.lit(True)
                        for f in self.identity:
                            null_key = null_key & F.col(
                                f"{side}{f}").isNull()
                        n_null = out.filter(null_key).count()
                        if n_null:
                            warnings.warn(
                                f"{self.vertex}: identity replacement "
                                f"{self._old_identity}->"
                                f"{list(self.identity)} left {n_null} edge "
                                f"row(s) in {e.edge_id.table_name()} with "
                                f"a NULL {side}<"
                                f"{'/'.join(self.identity)}> key"
                                + ("; they remain addressable through the "
                                   "demoted secondary identity key columns "
                                   f"{old_cols}"
                                   if self.retire == "demote" else
                                   "; they are NOT addressable until the "
                                   "new identity is populated and edges "
                                   "re-keyed"),
                                stacklevel=2)
                        store._write_snapshot(
                            store._table_dir("edges", e.edge_id.table_name()),
                            out)
        # keyed/unkeyed dedup split (the MergeVerticesOp pattern, found by
        # the r14 fuzz resolvability probe): rows whose NEW identity is
        # all-NULL — a PARTIALLY populated replacement column — must not
        # collapse to one arbitrary row under dropDuplicates' NULL==NULL
        # grouping, which would strand their re-keyed edges (the retained
        # old-key addresses would resolve against a single survivor).
        # Unkeyed rows pass through un-deduped: the pre-replacement table
        # was already distinct on the old identity.
        if subset:
            null_key = F.lit(True)
            for c in subset:
                null_key = null_key & F.col(c).isNull()
            deduped = (df.filter(~null_key).dropDuplicates(subset)
                       .unionByName(df.filter(null_key)))
        else:
            deduped = df.dropDuplicates()
        store._write_snapshot(
            store._table_dir("vertices", self.vertex), deduped)


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
    RetargetEdgesOp; graflo/architecture/evolution/apply.py retarget
    semantics).

    Data migration (:meth:`migrate`) physically re-addresses every edge
    table that references ``old_vertex`` — the dir name embeds endpoint
    names — and, when the two vertex types don't share a key space,
    remaps the endpoint key columns through ``key_mapping``:

    - ``key_mapping=None``: the vertices share a key space; requires the
      old side's key columns to match ``new_vertex``'s identity fields
      by name (raises otherwise — silently keeping mismatched columns
      would orphan every edge), and migration is a pure dir rename.
    - ``key_mapping`` DataFrame with columns ``old_<field>`` (one per
      old-side key column) and ``new_<field>`` (one per ``new_vertex``
      identity field): endpoint keys are remapped via an inner
      broadcast join — an edge whose key has no mapping row is DANGLING
      under the new addressing and is dropped, the resolve-endpoints
      inner-join contract.

    A dir collision with an existing ``new_vertex`` edge table keeps the
    existing dir (apply()'s first-id-wins dedup on the schema side)."""

    old_vertex: str = ""
    new_vertex: str = ""
    key_mapping: "object | None" = None  # DataFrame; not part of diffs

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        if self.new_vertex not in s.vertex_names:
            raise ValueError(f"vertex {self.new_vertex!r} not declared")
        if not any(self.old_vertex in (e.source, e.target) for e in s.edges):
            # a typo'd old_vertex must not silently no-op
            raise ValueError(
                f"no edges reference vertex {self.old_vertex!r}")
        for e in s.edges:
            if e.source == self.old_vertex:
                e.source = self.new_vertex
            if e.target == self.old_vertex:
                e.target = self.new_vertex
        # a retarget can collide two edge ids; keep first (the
        # MergeVerticesOp discipline — duplicate ids are invalid schema)
        seen, edges = set(), []
        for e in s.edges:
            if e.edge_id not in seen:
                seen.add(e.edge_id)
                edges.append(e)
        s.edges = edges
        return s

    def migrate(self, store) -> None:
        import os
        import shutil

        edir = os.path.join(store.root, "edges")
        if not os.path.isdir(edir):
            return
        new_ident = list(store.schema.vertex(self.new_vertex).identity_fields)
        for d in sorted(os.listdir(edir)):
            parts = d.split("__")
            if len(parts) != 3 or self.old_vertex not in (parts[0], parts[2]):
                continue
            srcdir = os.path.join(edir, d)
            # endpoint segments only — parts[1] is the relation
            new_parts = [
                self.new_vertex if i != 1 and p == self.old_vertex else p
                for i, p in enumerate(parts)
            ]
            dst = os.path.join(edir, "__".join(new_parts))
            df = store._read_table(srcdir, f"edge table {d}")
            changed = False
            for side, idx in (("_src_", 0), ("_dst_", 2)):
                if parts[idx] != self.old_vertex:
                    continue
                old_cols = [c for c in df.columns if c.startswith(side)]
                old_fields = [c[len(side):] for c in old_cols]
                if self.key_mapping is None:
                    if sorted(old_fields) != sorted(new_ident):
                        raise ValueError(
                            f"retarget {self.old_vertex!r}->"
                            f"{self.new_vertex!r}: edge table {d} keys "
                            f"{old_fields} != new identity {new_ident}; "
                            "pass key_mapping to remap")
                    continue  # shared key space: dir rename suffices
                m = self.key_mapping
                need = [f"old_{f}" for f in old_fields] + [
                    f"new_{f}" for f in new_ident]
                missing = [c for c in need if c not in m.columns]
                if missing:
                    raise ValueError(
                        f"key_mapping is missing columns {missing} "
                        f"(needs old_<field> for {old_fields} and "
                        f"new_<field> for {new_ident})")
                lookup = m.select(*[
                    F.col(f"old_{f}").alias(c)
                    for f, c in zip(old_fields, old_cols)
                ], *[
                    F.col(f"new_{f}").alias(f"{side}{f}__new")
                    for f in new_ident
                ])
                # mapping is vertex-count-sized metadata, broadcast-safe;
                # inner join drops edges dangling under the new addressing
                df = (
                    df.join(F.broadcast(lookup), on=old_cols, how="inner")
                    .drop(*old_cols)
                )
                for f in new_ident:
                    df = df.withColumnRenamed(f"{side}{f}__new", f"{side}{f}")
                changed = True
            if changed:
                # a remap can collide key tuples; keep one row per key
                # (apply()'s first-id-wins discipline, data side)
                key_cols = [c for c in df.columns
                            if c.startswith(("_src_", "_dst_"))]
                if "_relation" in df.columns:
                    key_cols.append("_relation")
                df = df.dropDuplicates(key_cols)
                if os.path.exists(dst):
                    # schema-side first-id-wins dedup kept the existing
                    # table; dropping this one's rows silently would be
                    # irreversible data loss with no signal (review
                    # finding) — warn so operators can recover first
                    warnings.warn(
                        f"retarget {self.old_vertex!r}->"
                        f"{self.new_vertex!r}: edge table {d} collides "
                        f"with existing {os.path.basename(dst)}; its "
                        "rows are DROPPED (first-id-wins). Merge the "
                        "tables first if both must survive.",
                        stacklevel=2)
                    shutil.rmtree(srcdir, ignore_errors=True)
                else:
                    store._write_snapshot(dst, df)
                    shutil.rmtree(srcdir, ignore_errors=True)
            else:
                if os.path.exists(dst):
                    warnings.warn(
                        f"retarget {self.old_vertex!r}->"
                        f"{self.new_vertex!r}: edge table {d} collides "
                        f"with existing {os.path.basename(dst)}; its "
                        "rows are DROPPED (first-id-wins). Merge the "
                        "tables first if both must survive.",
                        stacklevel=2)
                    shutil.rmtree(srcdir, ignore_errors=True)
                elif dst != srcdir:
                    os.rename(srcdir, dst)


@dataclass
class MergeVerticesOp(EvolutionOp):
    """Merge vertex type ``other`` into ``into``: union fields, retarget
    edges, drop ``other`` (reference MergeVerticesOp). Data migration unions
    the two vertex tables and re-dedups on ``into``'s identity.

    Differently-keyed merge (identity field names differ): ``other``'s rows
    carry no values for ``into``'s identity, so they join the merged table
    as NULL-keyed rows — kept, not collapsed (the keyed/unkeyed dedup
    split below) — and ``other``'s old identity is DEMOTED to a secondary
    identity of ``into`` so those rows stay addressable by lookup
    (the ReplaceIdentityOp retire='demote' pattern). Edges that addressed
    ``other`` are RE-KEYED through the merged table onto ``into``'s
    identity columns (found by the r13 migration fuzz) while RETAINING the
    old key columns: a pure-``other`` row's mapped ``into``-key is NULL,
    and ``query._funnel_key`` addresses such endpoints through the demoted
    secondary identity's retained columns (reference secondary-identity
    endpoint resolution, hq/endpoint_resolve.py:73-166) — so the edges
    stay traversable, with a runtime warning reporting the NULL-keyed row
    count and the align-first (ReplaceIdentityOp) recipe for a fully
    primary-keyed merge."""

    into: str = ""
    other: str = ""
    _other_identity: list[str] = dc_field(default_factory=list)
    _rekey: list[tuple[EdgeId, str]] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        dst, src = s.vertex(self.into), s.vertex(self.other)
        have = set(dst.field_names)
        dst.fields += [f for f in src.fields if f.name not in have]
        self._other_identity = (
            list(src.identity)
            if src.identity_mode is IdentityMode.NATURAL else [])
        self._rekey = []
        if (self._other_identity
                and dst.identity_mode is IdentityMode.NATURAL
                and sorted(self._other_identity) != sorted(dst.identity)):
            # demote the merged-away key so other's rows stay findable
            name = f"merged_{self.other}"
            while name in dst.secondary_identities:
                name += "_"
            dst.secondary_identities[name] = list(self._other_identity)
            if not any(i.fields == tuple(self._other_identity)
                       for i in dst.indexes):
                dst.indexes.append(IndexConfig(tuple(self._other_identity)))
            # record which endpoint sides need data-plane re-keying
            for e in s.edges:
                for side, endpoint in (("_src_", e.source),
                                       ("_dst_", e.target)):
                    if endpoint == self.other:
                        new_id = EdgeId(
                            self.into if e.source == self.other else e.source,
                            self.into if e.target == self.other else e.target,
                            e.relation)
                        self._rekey.append((new_id, side))
        if any(self.other in (e.source, e.target) for e in s.edges):
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
        import os
        import shutil

        try:
            a = store.read_vertices(self.into)
        except FileNotFoundError:
            a = None
        try:
            b = store.read_vertices(self.other)
        except FileNotFoundError:
            b = None
        v = store.schema.vertex(self.into)
        merged = mapping = None
        pre_conform_cols: set[str] = set()
        if b is not None:
            merged = b if a is None else a.unionByName(b, allowMissingColumns=True)
            pre_conform_cols = set(merged.columns)
            # conform to the merged DECLARATION: when `into` had no data
            # yet, the union degenerates to `other`'s frame, which lacks
            # `into`'s own columns — including its IDENTITY columns, and
            # a vertex table without its identity columns breaks every
            # keyed path (upsert merge, endpoint resolution). Declared-
            # but-absent columns materialize as typed NULLs (found by the
            # r12 random-migration fuzz). The dedup key is computed from
            # the columns that CARRIED data BEFORE conforming — deduping
            # on a just-minted all-null identity column would collapse
            # the table to one arbitrary row (the dropDuplicates([])
            # failure class).
            for f in v.fields:
                if f.name not in merged.columns:
                    merged = merged.withColumn(
                        f.name,
                        F.lit(None).cast(
                            f.type.to_spark(f.item_type)
                            if f.type is not None else "string"))
            # edge re-key mapping comes from the PRE-dedup merged frame
            # (dedup on into's identity would collapse exactly the
            # NULL-keyed other-rows that carry the old->new key pairs)
            if self._rekey and self._other_identity and all(
                    c in merged.columns
                    for c in (*self._other_identity, *v.identity_fields)):
                need = list(dict.fromkeys(
                    [*self._other_identity, *v.identity_fields]))
                mapping = merged.select(*need).dropDuplicates(
                    self._other_identity)
        # edge table dirs embed endpoint names: the retarget in apply()
        # re-addressed (other -> X) edges as (into -> X), so the physical
        # dirs must follow or their data is orphaned (review finding; the
        # RenameVertexOp.migrate pattern). A collision with an existing
        # (into -> X) table keeps the existing dir — the first-id-wins
        # dedup apply() already performs on the schema side — and WARNS,
        # since the colliding table's rows are dropped irreversibly.
        edir = os.path.join(store.root, "edges")
        if os.path.isdir(edir):
            for d in sorted(os.listdir(edir)):
                parts = d.split("__")
                if len(parts) == 3 and self.other in (parts[0], parts[2]):
                    # remap ENDPOINT segments only — parts[1] is the
                    # RELATION, and a relation that happens to share the
                    # merged-away vertex's name must not be re-addressed
                    # (review finding)
                    parts = [
                        self.into if i != 1 and p == self.other else p
                        for i, p in enumerate(parts)
                    ]
                    dst = os.path.join(edir, "__".join(parts))
                    srcdir = os.path.join(edir, d)
                    if os.path.exists(dst):
                        warnings.warn(
                            f"merge {self.other!r}->{self.into!r}: edge "
                            f"table {d} collides with existing "
                            f"{os.path.basename(dst)}; its rows are "
                            "DROPPED (first-id-wins). Merge the edge "
                            "tables first if both must survive.",
                            stacklevel=2)
                        shutil.rmtree(srcdir, ignore_errors=True)
                    else:
                        os.rename(srcdir, dst)
        # re-key edges that addressed `other` onto into's identity columns
        # BEFORE the vertex snapshot write: mapping reads the pre-write
        # vertex files lazily, and a size-capped snapshot write may prune
        # the very generation it reads from
        if mapping is not None:
            new_ident = list(v.identity_fields)
            for eid, side in self._rekey:
                try:
                    edf = store.read_edges(eid)
                except FileNotFoundError:
                    continue
                old_cols = [f"{side}{f}" for f in self._other_identity]
                if not all(c in edf.columns for c in old_cols):
                    continue  # already keyed differently (collision kept)
                lookup = mapping.select(
                    *[F.col(f).alias(c)
                      for f, c in zip(self._other_identity, old_cols)],
                    *[F.col(f).alias(f"{side}{f}__new") for f in new_ident])
                # the OLD key columns are RETAINED: they are the demoted
                # secondary identity's key, so a pure-`other` endpoint —
                # whose mapped `into`-identity key is NULL — stays
                # addressable through query._funnel_key's secondary-space
                # fallback, and parallel edges sharing the kept endpoint
                # survive the dedup (they differ in old key; r13 advisory:
                # dropping them collapsed parallel edges on NULL==NULL and
                # made the original destination unrecoverable)
                # rows whose old key is (partially) NULL ride a retained
                # secondary from an earlier migration — the null-unsafe
                # inner join would silently drop them; bypass untouched
                null_old = F.col(old_cols[0]).isNull()
                for c in old_cols[1:]:
                    null_old = null_old | F.col(c).isNull()
                bypass = edf.filter(null_old)
                out = edf.filter(~null_old).join(
                    lookup, on=old_cols, how="inner")
                for f in new_ident:
                    tgt = f"{side}{f}"
                    if tgt in old_cols:
                        # OVERLAPPING identity field (into and other share
                        # f): the mapped value equals the retained old
                        # value by construction (the mapping row IS the
                        # matched other-row), and renaming onto the
                        # retained column would mint a duplicate name
                        # (AMBIGUOUS_REFERENCE — r14 fuzz find)
                        out = out.drop(f"{tgt}__new")
                        continue
                    if tgt in out.columns:
                        # stale key column RETAINED by an EARLIER
                        # migration under the same name: its funnel space
                        # is dead (same column set as the new primary —
                        # _identity_funnel's subset prune), so the fresh
                        # mapping wins
                        out = out.drop(tgt)
                    out = out.withColumnRenamed(f"{tgt}__new", tgt)
                if bypass.limit(1).count():
                    out = out.unionByName(bypass, allowMissingColumns=True)
                key_cols = [c for c in out.columns
                            if c.startswith(("_src_", "_dst_"))]
                if "_relation" in out.columns:
                    key_cols.append("_relation")
                out = out.dropDuplicates(key_cols)
                null_key = F.lit(True)
                for f in new_ident:
                    null_key = null_key & F.col(f"{side}{f}").isNull()
                n_null = out.filter(null_key).count()
                if n_null:
                    warnings.warn(
                        f"merge {self.other!r}->{self.into!r}: {n_null} "
                        f"edge row(s) in {eid.table_name()} carry a NULL "
                        f"{side}<{'/'.join(new_ident)}> key (their endpoint "
                        f"has no {self.into!r}-identity value); they remain "
                        "addressable through the demoted secondary identity "
                        f"key columns {old_cols}. Align the key spaces "
                        "first (ReplaceIdentityOp) for a fully "
                        "primary-keyed merge.",
                        stacklevel=2)
                store._write_snapshot(
                    store._table_dir("edges", eid.table_name()),
                    out)
        if merged is not None:
            # keyed/unkeyed dedup split: rows with an all-NULL identity —
            # other's rows in a differently-keyed merge — must not
            # collapse to one arbitrary row under dropDuplicates' NULL==
            # NULL grouping (found by the r13 migration fuzz); only rows
            # that actually carry key values dedup on them
            identity = [c for c in v.identity_fields
                        if c in pre_conform_cols]
            if identity:
                null_key = F.lit(True)
                for c in identity:
                    null_key = null_key & F.col(c).isNull()
                keyed = merged.filter(~null_key).dropDuplicates(identity)
                merged = keyed.unionByName(merged.filter(null_key))
            store._write_snapshot(
                store._table_dir("vertices", self.into), merged)
            shutil.rmtree(
                store._table_dir("vertices", self.other), ignore_errors=True)


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
        else:
            # edge indexes may target properties or endpoint key columns
            # (_src_/_dst_<identity field>); anything else is a dead
            # column the layout sort would crash on (r13 fuzz hardening)
            allowed = {f.name for f in t.properties}
            for side, endpoint in (("_src_", t.source), ("_dst_", t.target)):
                vv = s.vertex(endpoint)
                allowed |= {f"{side}{f}" for f in vv.identity_fields}
            missing = [c for c in self.index.fields if c not in allowed]
            if missing:
                raise ValueError(
                    f"index fields {missing} not declared on edge "
                    f"{t.edge_id}")
        t.indexes.append(self.index)
        return s

    def migrate(self, store) -> None:
        if self.edge_id is not None:
            try:
                df = store.read_edges(self.edge_id)
            except FileNotFoundError:
                return
            if self.index.unique:
                # the vertex path verifies via verify_unique_indexes; the
                # edge path must enforce the same contract (review
                # finding: a violated unique edge index was accepted
                # silently). struct() so null keys count as distinct.
                keyed = df
                if self.index.sparse:
                    keyed = keyed.na.drop(
                        subset=list(self.index.fields), how="any")
                total, distinct = keyed.select(
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct(F.struct(
                        *[F.col(c) for c in self.index.fields])).alias("d"),
                ).first()
                if total != distinct:
                    raise ValueError(
                        f"unique index {self.index.fields} on edge "
                        f"{self.edge_id.table_name()!r} violated: "
                        f"{total} rows, {distinct} distinct keys")
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
    SanitizeOp). A rename map that COLLAPSES distinct names ('FooBar' and
    'fooBar' both snake to 'foo_bar') is rejected, the
    :func:`_validate_injective` rule. Data migration renames the physical
    vertex/edge table dirs (two-phase, since sanitized names can collide
    with still-unrenamed siblings mid-walk) and the data columns;
    ``_relation`` VALUES on dynamic edges are runtime data, not schema
    names, and are left untouched."""

    def apply(self, schema: CoreSchema) -> CoreSchema:
        def snake_indexes(indexes: list[IndexConfig]) -> list[IndexConfig]:
            # IndexConfig is frozen — rebuild with sanitized field names
            return [
                IndexConfig(tuple(camel_to_snake(c) for c in i.fields),
                            i.type, i.unique, i.sparse)
                for i in indexes
            ]

        s = _clone(schema)
        renames = {v.name: camel_to_snake(v.name) for v in s.vertices}
        if len(set(renames.values())) != len(renames):
            dupes = sorted({n for n in renames.values()
                            if list(renames.values()).count(n) > 1})
            raise ValueError(
                f"sanitize collapses distinct vertex names into {dupes}; "
                "rename one side first")
        for v in s.vertices:
            fr = [camel_to_snake(f.name) for f in v.fields]
            if len(set(fr)) != len(fr):
                raise ValueError(
                    f"sanitize collapses field names on {v.name!r}")
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
            v.indexes = snake_indexes(v.indexes)
        for e in s.edges:
            e.source = renames.get(e.source, camel_to_snake(e.source))
            e.target = renames.get(e.target, camel_to_snake(e.target))
            if e.relation is not None:
                e.relation = camel_to_snake(e.relation)
            # edge payload names sanitize too — properties, their
            # uniqueness keys, and index fields (review finding: the op
            # previously left an edge's camelCase internals untouched,
            # desynchronizing identities/indexes from sanitized columns)
            e.properties = [
                Field(camel_to_snake(f.name), f.type, f.item_type)
                for f in e.properties
            ]
            e.identities = [camel_to_snake(c) for c in e.identities]
            e.indexes = snake_indexes(e.indexes)
        ids = [e.edge_id for e in s.edges]
        if len(ids) != len(set(ids)):
            raise ValueError(
                "sanitize collapses distinct edge ids; rename one side first")
        return s

    def migrate(self, store) -> None:
        import os
        import uuid

        # two-phase dir renames: a sanitized name can equal a sibling's
        # UNsanitized name mid-walk (the RenameRelationsOp r12 pattern).
        # The walk covers ALL dirs — including stale/untracked ones apply()
        # never saw — so the full post-move name set is validated BEFORE
        # any rename: a collision discovered mid-phase-2 would strand
        # already-moved tables at .mv-<uuid> temp names, a partially
        # applied migration with data addressed nowhere.
        planned: list[tuple[str, str, str]] = []  # (root, old, new)
        for root, sanitize in (
            (os.path.join(store.root, "vertices"), camel_to_snake),
            (os.path.join(store.root, "edges"),
             lambda d: ("__".join(camel_to_snake(p) for p in d.split("__"))
                        if len(d.split("__")) == 3 else camel_to_snake(d))),
        ):
            if not os.path.isdir(root):
                continue
            entries = [d for d in sorted(os.listdir(root))
                       if not d.startswith(".")]
            final: dict[str, str] = {}  # post-move name -> source dir
            for d in entries:
                nd = sanitize(d)
                if nd in final:
                    raise ValueError(
                        f"sanitize migration collides on "
                        f"{os.path.basename(root)}/{nd!r} (from {final[nd]!r} "
                        f"and {d!r}); remove or rename the stale dir first")
                final[nd] = d
                if nd != d:
                    planned.append((root, d, nd))
        moves: list[tuple[str, str]] = []
        for root, d, nd in planned:
            src = os.path.join(root, d)
            tmp = f"{src}.mv-{uuid.uuid4().hex}"
            os.rename(src, tmp)
            moves.append((tmp, os.path.join(root, nd)))
        for tmp, dst in moves:
            os.rename(tmp, dst)
        # column renames inside each surviving table (endpoint key columns
        # keep their _src_/_dst_ prefix; _relation values are data)
        for v in store.schema.vertices:
            try:
                df = store.read_vertices(v.name)
            except FileNotFoundError:
                continue
            ren = {c: camel_to_snake(c) for c in df.columns
                   if camel_to_snake(c) != c}
            if ren:
                store._write_snapshot(
                    store._table_dir("vertices", v.name),
                    df.withColumnsRenamed(ren))
        for e in store.schema.edges:
            try:
                df = store.read_edges(e.edge_id)
            except FileNotFoundError:
                continue
            ren = {}
            for c in df.columns:
                if c == "_relation":
                    continue
                if c.startswith(("_src_", "_dst_")):
                    nf = camel_to_snake(c[5:])
                    if nf != c[5:]:
                        ren[c] = c[:5] + nf
                else:
                    nc = camel_to_snake(c)
                    if nc != c:
                        ren[c] = nc
            if ren:
                store._write_snapshot(
                    store._table_dir("edges", e.edge_id.table_name()),
                    df.withColumnsRenamed(ren))


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


# ----------------------------------------------------- plural structural ops

def _validate_injective(renames: dict[str, str], kind: str) -> None:
    """Reference ops.py validate_rename_map_is_injective: a collapsing rename
    map silently merges types — reject it here with the op's own name."""
    seen: dict[str, str] = {}
    for old, new in renames.items():
        if new in seen:
            raise ValueError(
                f"{kind} map collapses {seen[new]!r} and {old!r} into {new!r}; "
                "use a merge op for that"
            )
        seen[new] = old


@dataclass
class RenameVerticesOp(EvolutionOp):
    """Batch vertex rename (reference RenameVerticesOp, ops.py:356-373);
    injective map, single clone + per-name rewrite."""

    renames: dict[str, str] = dc_field(default_factory=dict)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        _validate_injective(self.renames, "rename_vertices")
        s = schema
        for old, new in self.renames.items():
            s = RenameVertexOp(old, new).apply(s)
        return s

    def migrate(self, store) -> None:
        for old, new in self.renames.items():
            RenameVertexOp(old, new).migrate(store)


@dataclass
class RenameRelationsOp(EvolutionOp):
    """Rename relations across ALL edges sharing them (reference
    RenameRelationsOp, ops.py:375-392)."""

    renames: dict[str, str] = dc_field(default_factory=dict)
    # filled by apply() so migrate() knows which tables move
    _renamed: list[EdgeId] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        _validate_injective(self.renames, "rename_relations")
        s = _clone(schema)
        self._renamed = []
        # SIMULTANEOUS application: each edge maps once from its ORIGINAL
        # relation, and collisions are judged against the FINAL state — a
        # chained map like {r1: r2, r2: r3} is valid (r1's target name is
        # being vacated by the same op), which the old incremental check
        # falsely rejected against the not-yet-renamed r2 edge
        final = [self.renames.get(e.relation, e.relation) for e in s.edges]
        if all(rel == e.relation for e, rel in zip(s.edges, final)):
            raise KeyError(f"no edge carries relations {sorted(self.renames)}")
        ids = [EdgeId(e.source, e.target, rel)
               for e, rel in zip(s.edges, final)]
        seen: set[EdgeId] = set()
        for i in ids:
            if i in seen:
                raise ValueError(f"edge {i} already declared")
            seen.add(i)
        for e, rel in zip(s.edges, final):
            if rel != e.relation:
                self._renamed.append(e.edge_id)
                e.relation = rel
        return s

    def migrate(self, store) -> None:
        import os
        import uuid

        # two-phase dir move: chained ({r1: r2, r2: r3}) and cyclic
        # ({a: b, b: a}) maps rename INTO names being vacated by this
        # same op, so every source dir steps aside to a temp name before
        # any final rename lands
        moves = []
        for eid in self._renamed:
            old_dir = store._table_dir("edges", eid.table_name())
            if not os.path.isdir(old_dir):
                continue
            new_id = EdgeId(eid.source, eid.target,
                            self.renames[eid.relation])
            tmp = f"{old_dir}.mv-{uuid.uuid4().hex}"
            os.rename(old_dir, tmp)
            moves.append((tmp, new_id))
        for tmp, new_id in moves:
            os.rename(tmp, store._table_dir("edges", new_id.table_name()))
            try:
                df = store.read_edges(new_id)
            except FileNotFoundError:
                continue
            if "_relation" in df.columns:
                store._write_snapshot(
                    store._table_dir("edges", new_id.table_name()),
                    df.withColumn("_relation", F.lit(new_id.relation)))


@dataclass
class RemoveEdgesOp(EvolutionOp):
    """Remove every edge carrying the given relations (reference
    RemoveEdgesOp, ops.py:418-427 — relation-addressed, unlike the
    id-addressed RemoveEdgeOp)."""

    relations: list[str] = dc_field(default_factory=list)
    _removed: list[EdgeId] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        rels = set(self.relations)
        self._removed = [e.edge_id for e in s.edges if e.relation in rels]
        if not self._removed:
            raise KeyError(f"no edge carries relations {sorted(rels)}")
        s.edges = [e for e in s.edges if e.relation not in rels]
        return s

    def migrate(self, store) -> None:
        import shutil

        for eid in self._removed:
            shutil.rmtree(
                store._table_dir("edges", eid.table_name()), ignore_errors=True
            )


@dataclass
class AddVerticesOp(EvolutionOp):
    """Plural AddVertexOp (reference AddVerticesOp, ops.py:493-514)."""

    vertices: list[Vertex] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        names = [v.name for v in self.vertices]
        if len(names) != len(set(names)):
            raise ValueError("add_vertices entries must be unique by name")
        s = schema
        for v in self.vertices:
            s = AddVertexOp(v).apply(s)
        return s


@dataclass
class AddEdgesOp(EvolutionOp):
    """Plural AddEdgeOp (reference AddEdgesOp, ops.py:516-534)."""

    edges: list[Edge] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        ids = [e.edge_id for e in self.edges]
        if len(ids) != len(set(ids)):
            raise ValueError(
                "add_edges entries must be unique by (source, target, relation)"
            )
        s = schema
        for e in self.edges:
            s = AddEdgeOp(e).apply(s)
        return s


@dataclass
class MergeEdgesOp(EvolutionOp):
    """Merge relation names into one canonical relation (reference
    MergeEdgesOp, ops.py:429-442 / apply.py:1145). Edges that collapse onto
    the same (source, target, into) triple merge: properties union, the
    data migration unions their tables and dedups."""

    sources: list[str] = dc_field(default_factory=list)
    into: str = ""
    _moved: list[tuple[EdgeId, EdgeId]] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        if self.into in self.sources:
            raise ValueError("merge_edges sources must not include `into`")
        s = _clone(schema)
        srcs = set(self.sources)
        if not any(e.relation in srcs for e in s.edges):
            raise KeyError(f"no edge carries relations {sorted(srcs)}")
        kept: dict[EdgeId, Edge] = {}
        self._moved = []
        for e in s.edges:
            if e.relation in srcs:
                new_id = EdgeId(e.source, e.target, self.into)
                self._moved.append((e.edge_id, new_id))
                e.relation = self.into
            if e.edge_id in kept:
                dst = kept[e.edge_id]
                have = {f.name for f in dst.properties}
                dst.properties += [
                    f for f in e.properties if f.name not in have
                ]
            else:
                kept[e.edge_id] = e
        s.edges = list(kept.values())
        return s

    def migrate(self, store) -> None:
        import shutil

        for old_id, new_id in self._moved:
            try:
                src_df = store.read_edges(old_id)
            except FileNotFoundError:
                continue
            if "_relation" in src_df.columns:
                src_df = src_df.withColumn("_relation", F.lit(self.into))
            try:
                dst_df = store.read_edges(new_id)
            except FileNotFoundError:
                dst_df = None
            merged = (
                src_df
                if dst_df is None
                else dst_df.unionByName(src_df, allowMissingColumns=True)
            ).dropDuplicates()
            store._write_snapshot(
                store._table_dir("edges", new_id.table_name()), merged
            )
            shutil.rmtree(
                store._table_dir("edges", old_id.table_name()), ignore_errors=True
            )


@dataclass
class AddInverseEdgesOp(EvolutionOp):
    """Add inverse relations for directed edges (reference AddInverseEdgesOp,
    ops.py:481-491 / apply.py:1302). The inverse edge swaps endpoints and
    carries the same properties/identities; the data migration writes the
    inverse table by swapping the ``_src_``/``_dst_`` column prefixes — a
    metadata-only projection, no shuffle."""

    relations: dict[str, str] = dc_field(default_factory=dict)
    _added: list[tuple[EdgeId, EdgeId]] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        self._added = []
        new_edges: list[Edge] = []
        for e in s.edges:
            if e.relation not in self.relations:
                continue
            if not e.directed:
                # an undirected edge already means both directions; the
                # reference only duplicates directed relations
                continue
            inv_rel = self.relations[e.relation]
            inv_id = EdgeId(e.target, e.source, inv_rel)
            if any(o.edge_id == inv_id for o in s.edges + new_edges):
                raise ValueError(f"inverse edge {inv_id} already declared")
            new_edges.append(
                Edge(
                    e.target,
                    e.source,
                    relation=inv_rel,
                    directed=True,
                    type=e.type,
                    properties=copy.deepcopy(e.properties),
                    identities=list(e.identities),
                )
            )
            self._added.append((e.edge_id, inv_id))
        if not self._added:
            raise KeyError(
                f"no directed edge carries relations {sorted(self.relations)}"
            )
        s.edges += new_edges
        return s

    def migrate(self, store) -> None:
        for fwd_id, inv_id in self._added:
            try:
                df = store.read_edges(fwd_id)
            except FileNotFoundError:
                continue
            swapped = df.select(*[
                F.col(c).alias(
                    "_dst_" + c[len("_src_"):] if c.startswith("_src_")
                    else "_src_" + c[len("_dst_"):] if c.startswith("_dst_")
                    else c
                )
                for c in df.columns
            ])
            if "_relation" in swapped.columns:
                swapped = swapped.withColumn(
                    "_relation", F.lit(inv_id.relation)
                )
            store._write_snapshot(
                store._table_dir("edges", inv_id.table_name()), swapped
            )


@dataclass
class SetEdgeDirectedOp(EvolutionOp):
    """Set the ``directed`` flag on selected edges (reference
    SetEdgeDirectedOp, ops.py:744-762 — small but load-bearing: ``directed``
    decides what AddInverseEdgesOp may duplicate)."""

    edges: list[EdgeId] = dc_field(default_factory=list)
    directed: bool = True

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        wanted = set(self.edges)
        hit = set()
        for e in s.edges:
            if e.edge_id in wanted:
                e.directed = self.directed
                hit.add(e.edge_id)
        missing = wanted - hit
        if missing:
            raise KeyError(f"edges not declared: {sorted(map(str, missing))}")
        return s


# ----------------------------------------------------------- edge properties

def _edges_by_relation(schema: CoreSchema, relation: str) -> list[Edge]:
    hits = [e for e in schema.edges if e.relation == relation]
    if not hits:
        raise KeyError(f"no edge carries relation {relation!r}")
    return hits


@dataclass
class AddEdgePropertiesOp(EvolutionOp):
    """Declare new properties on every edge of each relation (reference
    AddEdgePropertiesOp, ops.py:469-479)."""

    additions: dict[str, list[Field]] = dc_field(default_factory=dict)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        for rel, fields in self.additions.items():
            for e in _edges_by_relation(s, rel):
                have = {f.name for f in e.properties}
                dup = [f.name for f in fields if f.name in have]
                if dup:
                    raise ValueError(f"{rel}: properties {dup} already declared")
                e.properties += copy.deepcopy(fields)
        return s


@dataclass
class RemoveEdgePropertiesOp(EvolutionOp):
    """Remove properties per relation (reference RemoveEdgePropertiesOp,
    ops.py:457-467); migration drops the columns from every table of that
    relation."""

    removals: dict[str, list[str]] = dc_field(default_factory=dict)
    _touched: list[EdgeId] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        self._touched = []
        for rel, names in self.removals.items():
            gone = set(names)
            used = gone & set().union(
                *(set(e.identities) for e in _edges_by_relation(s, rel))
            )
            if used:
                raise ValueError(
                    f"{rel}: cannot remove identity columns {sorted(used)}"
                )
            for e in _edges_by_relation(s, rel):
                e.properties = [f for f in e.properties if f.name not in gone]
                # index cascade, the RemovePropertyOp rule: a removed
                # property must not survive inside index metadata
                e.indexes = _strip_field_from_indexes(e.indexes, gone)
                self._touched.append(e.edge_id)
        return s

    def migrate(self, store) -> None:
        for eid in self._touched:
            try:
                df = store.read_edges(eid)
            except FileNotFoundError:
                continue
            drop = [c for c in self.removals.get(eid.relation, ()) if c in df.columns]
            if drop:
                store._write_snapshot(
                    store._table_dir("edges", eid.table_name()), df.drop(*drop)
                )


@dataclass
class RenameEdgePropertiesOp(EvolutionOp):
    """Rename properties per relation (reference RenameEdgePropertiesOp,
    ops.py:444-455); migration renames the columns."""

    renames: dict[str, dict[str, str]] = dc_field(default_factory=dict)
    _touched: list[EdgeId] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        self._touched = []
        for rel, mapping in self.renames.items():
            _validate_injective(mapping, f"rename_edge_properties[{rel}]")
            for e in _edges_by_relation(s, rel):
                have = {f.name for f in e.properties}
                missing = [o for o in mapping if o not in have]
                if missing:
                    raise KeyError(f"{rel}: properties {missing} not declared")
                clash = [n for n in mapping.values() if n in have - set(mapping)]
                if clash:
                    raise ValueError(f"{rel}: rename collides with {clash}")
                e.properties = [
                    Field(mapping.get(f.name, f.name), f.type, f.item_type)
                    for f in e.properties
                ]
                e.identities = [mapping.get(c, c) for c in e.identities]
                # index metadata follows the rename (r13 fuzz class)
                e.indexes = [
                    (IndexConfig(
                        tuple(mapping.get(c, c) for c in i.fields),
                        i.type, i.unique, i.sparse)
                     if any(c in mapping for c in i.fields) else i)
                    for i in e.indexes
                ]
                self._touched.append(e.edge_id)
        return s

    def migrate(self, store) -> None:
        for eid in self._touched:
            try:
                df = store.read_edges(eid)
            except FileNotFoundError:
                continue
            mapping = {
                o: n for o, n in self.renames.get(eid.relation, {}).items()
                if o in df.columns
            }
            if mapping:
                store._write_snapshot(
                    store._table_dir("edges", eid.table_name()),
                    df.withColumnsRenamed(mapping),
                )


# --------------------------------------------------------------- field types

@dataclass
class ChangeFieldTypesOp(EvolutionOp):
    """Set the logical type of declared vertex/edge properties (reference
    ChangeFieldTypesOp, ops.py:628-653). ``(type, item_type)`` tuples;
    ``(None, None)`` clears the declared type. Data migration casts the
    physical columns — one narrow projection per touched table."""

    vertices: dict[str, dict[str, tuple]] = dc_field(default_factory=dict)
    edges: dict[str, dict[str, tuple]] = dc_field(default_factory=dict)
    _touched_edges: list[EdgeId] = dc_field(default_factory=list)

    @staticmethod
    def _respec(fields: list[Field], spec: dict[str, tuple], where: str) -> list[Field]:
        have = {f.name for f in fields}
        missing = [n for n in spec if n not in have]
        if missing:
            raise KeyError(f"{where}: fields {missing} not declared")
        out = []
        for f in fields:
            if f.name in spec:
                t, item = (spec[f.name] + (None,))[:2]
                if t is FieldType.LIST and item is None:
                    raise ValueError(f"{where}.{f.name}: LIST requires item_type")
                if t is not FieldType.LIST and item is not None:
                    raise ValueError(
                        f"{where}.{f.name}: item_type only applies to LIST"
                    )
                out.append(Field(f.name, t, item))
            else:
                out.append(f)
        return out

    def apply(self, schema: CoreSchema) -> CoreSchema:
        if not self.vertices and not self.edges:
            raise ValueError(
                "change_field_types requires at least one of vertices or edges"
            )
        s = _clone(schema)
        for vname, spec in self.vertices.items():
            v = s.vertex(vname)
            v.fields = self._respec(v.fields, spec, vname)
        self._touched_edges = []
        for rel, spec in self.edges.items():
            for e in _edges_by_relation(s, rel):
                e.properties = self._respec(e.properties, spec, rel)
                self._touched_edges.append(e.edge_id)
        return s

    @staticmethod
    def _cast(df, spec: dict[str, tuple]):
        casts = {}
        for name, tup in spec.items():
            t, item = (tup + (None,))[:2]
            if t is None or name not in df.columns:
                continue
            # try_cast, not cast: under ANSI mode (Spark 4 default) a
            # strict cast THROWS on the first malformed value and aborts
            # the whole table rewrite mid-migration — a declared-type
            # change over dirty data must be total, with unparseable
            # values becoming NULL (found by the r12 random-migration
            # property test)
            casts[name] = F.col(name).try_cast(t.to_spark(item))
        return df.withColumns(casts) if casts else None

    def migrate(self, store) -> None:
        for vname, spec in self.vertices.items():
            try:
                df = store.read_vertices(vname)
            except FileNotFoundError:
                continue
            cast = self._cast(df, spec)
            if cast is not None:
                store._write_snapshot(store._table_dir("vertices", vname), cast)
        for eid in self._touched_edges:
            try:
                df = store.read_edges(eid)
            except FileNotFoundError:
                continue
            cast = self._cast(df, self.edges[eid.relation])
            if cast is not None:
                store._write_snapshot(
                    store._table_dir("edges", eid.table_name()), cast
                )


# -------------------------------------------------------- secondary identity

@dataclass
class AddSecondaryIdentitiesOp(EvolutionOp):
    """Declare alternate lookup keys (reference AddSecondaryIdentitiesOp,
    ops.py:269-288). Each declared field-set also gains a non-unique index —
    the reference derives one at finish_init; here it is appended explicitly
    so the store's sort-layout data skipping covers the lookup."""

    additions: dict[str, dict[str, list[str]]] = dc_field(default_factory=dict)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        for vname, sets in self.additions.items():
            v = s.vertex(vname)
            for key_name, cols in sets.items():
                if key_name in v.secondary_identities:
                    raise ValueError(
                        f"{vname}: secondary identity {key_name!r} already declared"
                    )
                missing = [c for c in cols if c not in v.field_names]
                if missing:
                    raise ValueError(f"{vname}: fields {missing} not declared")
                v.secondary_identities[key_name] = list(cols)
                if not any(i.fields == tuple(cols) for i in v.indexes):
                    v.indexes.append(IndexConfig(tuple(cols)))
        return s


@dataclass
class RemoveSecondaryIdentitiesOp(EvolutionOp):
    """Withdraw alternate lookup keys and their derived indexes (reference
    RemoveSecondaryIdentitiesOp, ops.py:290-306). Entries address a key by
    name or by field list."""

    removals: dict[str, list] = dc_field(default_factory=dict)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        for vname, entries in self.removals.items():
            v = s.vertex(vname)
            for entry in entries:
                if isinstance(entry, str):
                    if entry not in v.secondary_identities:
                        raise KeyError(f"{vname}: secondary identity {entry!r}")
                    name = entry
                else:
                    matches = [
                        k for k, cols in v.secondary_identities.items()
                        if cols == list(entry)
                    ]
                    if not matches:
                        raise KeyError(f"{vname}: secondary identity {entry}")
                    name = matches[0]
                cols = tuple(v.secondary_identities.pop(name))
                v.indexes = [
                    i for i in v.indexes if not (i.fields == cols and not i.unique)
                ]
        return s


@dataclass
class ReplaceEdgeIdentitiesOp(EvolutionOp):
    """Replace edge uniqueness keys (reference ReplaceEdgeIdentitiesOp,
    ops.py:330-353): per (source, target, relation) entry, the new extra key
    columns among edge properties; empty list clears them. Data migration
    re-dedups each table on endpoints + new keys."""

    edges: dict[EdgeId, list[str]] = dc_field(default_factory=dict)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        s = _clone(schema)
        for eid, identities in self.edges.items():
            hit = [e for e in s.edges if e.edge_id == eid]
            if not hit:
                raise KeyError(str(eid))
            e = hit[0]
            prop_names = {f.name for f in e.properties}
            missing = [c for c in identities if c not in prop_names]
            if missing:
                raise ValueError(
                    f"{eid}: identity columns {missing} not among edge properties"
                )
            e.identities = list(identities)
        return s

    def migrate(self, store) -> None:
        for eid, identities in self.edges.items():
            try:
                df = store.read_edges(eid)
            except FileNotFoundError:
                continue
            keys = [c for c in df.columns if c.startswith(("_src_", "_dst_"))] + [
                c for c in identities if c in df.columns
            ]
            store._write_snapshot(
                store._table_dir("edges", eid.table_name()),
                df.dropDuplicates(keys) if keys else df.dropDuplicates(),
            )


# ----------------------------------------------------------------- projection

@dataclass
class ProjectManifestOp(EvolutionOp):
    """Slice the schema to a vertex/edge subgraph with consistent cascade
    (reference ProjectManifestOp, ops.py:764-815). ``induced_prune``: with
    ``keep_vertices`` set, listed vertices with no surviving incident edge
    are dropped too. Data migration deletes the dropped tables."""

    keep_vertices: list[str] | None = None
    keep_edges: list[EdgeId] | None = None
    strict: bool = True
    _dropped_v: list[str] = dc_field(default_factory=list)
    _dropped_e: list[EdgeId] = dc_field(default_factory=list)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        if not self.keep_vertices and not self.keep_edges:
            raise ValueError(
                "project_manifest requires keep_vertices or keep_edges"
            )
        s = _clone(schema)
        if self.strict:
            if self.keep_vertices:
                unknown = set(self.keep_vertices) - set(s.vertex_names)
                if unknown:
                    raise ValueError(f"unknown vertices {sorted(unknown)}")
            if self.keep_edges:
                declared = {e.edge_id for e in s.edges}
                unknown_e = set(self.keep_edges) - declared
                if unknown_e:
                    raise ValueError(
                        f"unknown edges {sorted(map(str, unknown_e))}"
                    )
        keep_v = set(self.keep_vertices or s.vertex_names)
        if self.keep_edges is None:
            # keep every edge whose endpoints survive
            keep_e = {
                e.edge_id for e in s.edges
                if e.source in keep_v and e.target in keep_v
            }
        else:
            keep_e = {
                eid for eid in self.keep_edges
                if eid.source in keep_v and eid.target in keep_v
            }
        if self.keep_vertices:
            # induced_prune: a listed vertex with no surviving incident edge
            # is dropped — unless the projection keeps no edges at all, in
            # which case the vertex list stands alone
            touched = {v for eid in keep_e for v in (eid.source, eid.target)}
            if keep_e:
                keep_v = keep_v & touched
        self._dropped_v = [v for v in s.vertex_names if v not in keep_v]
        self._dropped_e = [e.edge_id for e in s.edges if e.edge_id not in keep_e]
        s.vertices = [v for v in s.vertices if v.name in keep_v]
        s.edges = [e for e in s.edges if e.edge_id in keep_e]
        if not s.vertices:
            raise ValueError("projection drops every vertex")
        return s

    def migrate(self, store) -> None:
        import shutil

        for name in self._dropped_v:
            shutil.rmtree(
                store._table_dir("vertices", name), ignore_errors=True
            )
        for eid in self._dropped_e:
            shutil.rmtree(
                store._table_dir("edges", eid.table_name()), ignore_errors=True
            )


@dataclass
class RenameResourcesOp(EvolutionOp):
    """Rename ingestion resources (reference RenameResourcesOp,
    ops.py:394-416). Operates on a :class:`GraphManifest` — the one op here
    that touches the ingestion side rather than the schema."""

    resources: dict[str, str] = dc_field(default_factory=dict)

    def apply(self, schema: CoreSchema) -> CoreSchema:
        # schema untouched; resource renames live on the manifest
        return schema

    def apply_manifest(self, manifest):
        _validate_injective(self.resources, "rename_resources")
        names = {r.name for r in manifest.resources}
        missing = set(self.resources) - names
        if missing:
            raise KeyError(f"resources not declared: {sorted(missing)}")
        clash = set(self.resources.values()) & (names - set(self.resources))
        if clash:
            raise ValueError(f"rename collides with existing {sorted(clash)}")
        out = copy.deepcopy(manifest)
        for r in out.resources:
            if r.name in self.resources:
                r.name = self.resources[r.name]
        return out


# ops that rewrite the ingestion side of a manifest, not only the schema
# (reference ops.py INGESTION_REWRITING_OPS / ops_reaching_ingestion)
INGESTION_REWRITING_OPS = frozenset({
    "RenameVerticesOp", "RenameVertexOp", "RenameRelationsOp",
    "RenameEdgeRelationOp", "RenameResourcesOp", "MergeVerticesOp",
    "MergeEdgesOp", "RetargetEdgesOp", "RemoveVertexOp", "RemoveEdgesOp",
    "AddInverseEdgesOp", "ProjectManifestOp", "SanitizeOp",
})


def ops_reaching_ingestion(ops: list[EvolutionOp]) -> list[str]:
    """Which of these ops would force ingestion-binding rewrites (reference
    ops_reaching_ingestion, ops.py:1011)."""
    return [
        type(op).__name__
        for op in ops
        if type(op).__name__ in INGESTION_REWRITING_OPS
    ]


# ------------------------------------------------------------- diff/plan/apply

def _edge_payload_ops(old_e: Edge, new_e: Edge,
                      rel_unique: bool) -> list[EvolutionOp] | None:
    """In-place ops reconciling a same-id edge's payload, or ``None``
    when the delta isn't expressible without remove+add (no SetEdgeType
    op; relation-scoped property ops would spill onto OTHER edges when
    the relation is shared or None). Data-safety is the point: a
    remove+add plan applied against a store DELETES the edge table for
    what is semantically an in-place tweak, so diff prefers these."""
    if old_e.type != new_e.type:
        return None
    rel = old_e.relation
    prop_delta = old_e.properties != new_e.properties
    if prop_delta and (rel is None or not rel_unique):
        return None
    ops: list[EvolutionOp] = []
    eid = new_e.edge_id
    if old_e.directed != new_e.directed:
        ops.append(SetEdgeDirectedOp([eid], new_e.directed))
    if prop_delta:
        op_by = {f.name: f for f in old_e.properties}
        np_by = {f.name: f for f in new_e.properties}
        added = [f for f in new_e.properties if f.name not in op_by]
        removed = [nm for nm in op_by if nm not in np_by]
        typed = {
            nm: (f.type, f.item_type) for nm, f in np_by.items()
            if nm in op_by
            and (op_by[nm].type, op_by[nm].item_type) != (f.type, f.item_type)
        }
        if added:
            ops.append(AddEdgePropertiesOp({rel: added}))
        if typed:
            ops.append(ChangeFieldTypesOp(edges={rel: typed}))
        # identity replacement BEFORE property removals, the same
        # ordering rule as the vertex side (RemoveEdgePropertiesOp
        # refuses to drop a column still declared as an identity)
        if old_e.identities != new_e.identities:
            ops.append(ReplaceEdgeIdentitiesOp(
                {eid: list(new_e.identities)}))
        if removed:
            ops.append(RemoveEdgePropertiesOp({rel: removed}))
    elif old_e.identities != new_e.identities:
        ops.append(ReplaceEdgeIdentitiesOp({eid: list(new_e.identities)}))
    if old_e.indexes != new_e.indexes:
        for fields in dict.fromkeys(tuple(i.fields) for i in old_e.indexes):
            ops.append(RemoveIndexOp(edge_id=eid, fields=fields))
        for i in new_e.indexes:
            ops.append(AddIndexOp(edge_id=eid, index=i))
    return ops


def diff(old: CoreSchema, new: CoreSchema) -> list[EvolutionOp]:
    """Structural diff -> ordered op plan, CONVERGENT by construction:
    ``apply_plan(old, diff(old, new))`` reproduces ``new`` hash-exactly
    for any pair within the diff surface (vertices/fields/types/identity
    policy/secondary identities/indexes/edges — property-tested over
    randomized op chains). Renames are not guessed — a rename appears as
    remove+add (the reference's planner has the same default; reference
    migrate/diff.py + planner.py).

    Per-vertex op ORDER is load-bearing (r11 deferred finding #1):
    additions land first (a new identity column must exist before the
    identity swap), then type changes, then the identity replacement —
    BEFORE removals, so removing a swapped-away identity column is legal
    — then secondary-identity changes, then removals. The identity op is
    emitted with ``retire='keep'``: 'demote' (the interactive-migration
    default) adds a retired_identity secondary + index that the target
    schema doesn't declare, so a demoting diff can never converge; the
    explicit RemovePropertyOps already express exactly which old-identity
    columns the target drops. A same-id edge whose payload changed
    (properties/identities/directedness/weight) is remove+add. A final
    reconciliation pass compares the plan's simulated result against the
    target and patches residual vertex-index differences (ops like
    AddSecondaryIdentitiesOp append derived indexes as a side effect)."""
    ops: list[EvolutionOp] = []
    old_v, new_v = set(old.vertex_names), set(new.vertex_names)
    for name in sorted(new_v - old_v):
        ops.append(AddVertexOp(new.vertex(name)))
    for name in sorted(old_v & new_v):
        ov, nv = old.vertex(name), new.vertex(name)
        for f in nv.fields:
            if f.name not in ov.field_names:
                ops.append(AddPropertyOp(name, f))
        old_types = {f.name: (f.type, f.item_type) for f in ov.fields}
        spec = {
            f.name: (f.type, f.item_type)
            for f in nv.fields
            if f.name in old_types
            and old_types[f.name] != (f.type, f.item_type)
        }
        if spec:
            ops.append(ChangeFieldTypesOp(vertices={name: spec}))
        if (ov.identity != nv.identity
                or ov.identity_mode != nv.identity_mode
                or ov.identity_funnel != nv.identity_funnel):
            ops.append(ReplaceIdentityOp(
                name, list(nv.identity), mode=nv.identity_mode,
                funnel=[list(b) for b in nv.identity_funnel],
                retire="keep"))
        removed_sec = [
            k for k, cols in ov.secondary_identities.items()
            if nv.secondary_identities.get(k) != cols
        ]
        added_sec = {
            k: list(cols) for k, cols in nv.secondary_identities.items()
            if ov.secondary_identities.get(k) != cols
        }
        if removed_sec:
            ops.append(RemoveSecondaryIdentitiesOp({name: removed_sec}))
        if added_sec:
            ops.append(AddSecondaryIdentitiesOp({name: added_sec}))
        for f in ov.fields:
            if f.name not in nv.field_names:
                ops.append(RemovePropertyOp(name, f.name))
    old_by_id = {e.edge_id: e for e in old.edges}
    new_by_id = {e.edge_id: e for e in new.edges}
    rel_counts: dict[str | None, int] = {}
    for e in list(old.edges) + [
            e for e in new.edges if e.edge_id not in old_by_id]:
        rel_counts[e.relation] = rel_counts.get(e.relation, 0) + 1
    for e in new.edges:
        o = old_by_id.get(e.edge_id)
        if o is None:
            ops.append(AddEdgeOp(e))
        elif o != e:
            payload = _edge_payload_ops(
                o, e, rel_unique=rel_counts.get(e.relation, 0) == 1)
            if payload is not None:
                ops.extend(payload)
            else:
                # last resort — and, applied against a STORE, this drops
                # the edge table (RemoveEdgeOp.migrate); only reached
                # for EdgeType changes or shared-relation payload deltas
                ops.append(RemoveEdgeOp(e.edge_id))
                ops.append(AddEdgeOp(e))
    for e in old.edges:
        if e.edge_id not in new_by_id:
            ops.append(RemoveEdgeOp(e.edge_id))
    # vertex removals last (after dependent edge removals)
    for name in sorted(old_v - new_v):
        ops.append(RemoveVertexOp(name))
    # index reconciliation: simulate the plan (schema-level, cheap) and
    # patch what still differs from the target — removals first, so a
    # same-fields index with a different unique/type flag re-adds cleanly
    interim = apply_plan(old, ops)
    fixups: list[EvolutionOp] = []
    for name in sorted(new_v):
        iv, nv = interim.vertex(name), new.vertex(name)
        if iv.indexes == nv.indexes:
            continue
        # RemoveIndexOp drops every index on its fields-tuple, so clear
        # each distinct tuple once, then re-declare the target's indexes
        # in ORDER (AddIndexOp appends — the rebuilt list is exact)
        for fields in dict.fromkeys(tuple(i.fields) for i in iv.indexes):
            fixups.append(RemoveIndexOp(vertex=name, fields=fields))
        for i in nv.indexes:
            fixups.append(AddIndexOp(vertex=name, index=i))
    return ops + fixups


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
