"""Manifest contract: the declarative graph schema.

Mirrors the reference contract (graflo/architecture/schema/{vertex,edge,core}.py,
graflo/architecture/contract/manifest.py:17) but is a pure driver-side object —
the compiled artifacts are DataFrames, so the manifest carries only names,
types, identity semantics, filters and edge topology.

Identity modes (reference vertex.py:777-790):
    natural  — declared identity columns (fallback: all properties)
    hash     — deterministic sha256 digest over source fields, optionally with
               an ordered funnel of fallback branches (identity_funnel.py)
    blank    — no natural key; uuid minted at write time
    assigned — intentional uuid primary key minted at assemble time
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import types as T

from graflo_spark.filters import FilterExpression


class FieldType(str, enum.Enum):
    """Reference type system (vertex.py:54-80) mapped onto Spark SQL types."""

    INT = "int"
    UINT = "uint"
    FLOAT = "float"
    DOUBLE = "double"
    BOOL = "bool"
    STRING = "string"
    DATETIME = "datetime"
    UUID = "uuid"
    LIST = "list"

    def to_spark(self, item_type: "FieldType | None" = None) -> T.DataType:
        mapping: dict[FieldType, T.DataType] = {
            FieldType.INT: T.LongType(),
            FieldType.UINT: T.LongType(),
            FieldType.FLOAT: T.DoubleType(),
            FieldType.DOUBLE: T.DoubleType(),
            FieldType.BOOL: T.BooleanType(),
            FieldType.STRING: T.StringType(),
            FieldType.UUID: T.StringType(),
            FieldType.DATETIME: T.TimestampType(),
        }
        if self is FieldType.LIST:
            if item_type is None or item_type is FieldType.LIST:
                raise ValueError("LIST requires a scalar item_type")
            return T.ArrayType(mapping[item_type])
        return mapping[self]


@dataclass(frozen=True)
class Field:
    """A typed vertex/edge property. ``type=None`` is allowed (schema-agnostic
    targets don't need types — reference vertex.py:177-180)."""

    name: str
    type: FieldType | None = None
    item_type: FieldType | None = None

    def spark_type(self) -> T.DataType | None:
        if self.type is None:
            return None
        return self.type.to_spark(self.item_type)


class IdentityMode(str, enum.Enum):
    NATURAL = "natural"
    HASH = "hash"
    BLANK = "blank"
    ASSIGNED = "assigned"


class IndexType(str, enum.Enum):
    """Reference index kinds (graph_types/index_config.py:63-125). Spark has
    no secondary indexes; see GraphStore._apply_index_layout for the physical
    mapping (sort-by-index-fields -> parquet min/max data skipping)."""

    PERSISTENT = "persistent"
    HASH = "hash"
    SKIPLIST = "skiplist"
    FULLTEXT = "fulltext"


@dataclass(frozen=True)
class IndexConfig:
    """A declared secondary index (reference IndexConfig). ``unique`` is a
    constraint the store can verify; ``sparse`` skips null keys."""

    fields: tuple[str, ...]
    type: IndexType = IndexType.PERSISTENT
    unique: bool = False
    sparse: bool = False

    def __post_init__(self) -> None:
        if not self.fields:
            raise ValueError("index needs at least one field")
        object.__setattr__(self, "fields", tuple(self.fields))


@dataclass
class Vertex:
    """A vertex type.

    ``identity`` are the primary-key columns for dedup/upsert;
    ``secondary_identities`` are alternate soft-unique lookup key sets for
    edge-endpoint resolution (reference vertex.py:303-349,522-529);
    ``identity_funnel`` is an ordered list of fallback column groups for
    hash identities — the first branch whose columns are all non-null wins
    (reference identity_funnel.py).
    """

    name: str
    fields: list[Field] = dc_field(default_factory=list)
    identity: list[str] = dc_field(default_factory=list)
    identity_mode: IdentityMode = IdentityMode.NATURAL
    identity_funnel: list[list[str]] = dc_field(default_factory=list)
    secondary_identities: dict[str, list[str]] = dc_field(default_factory=dict)
    filters: FilterExpression | None = None
    indexes: list[IndexConfig] = dc_field(default_factory=list)

    HASH_KEY = "_key"  # minted identity column for hash/blank/assigned modes

    def __post_init__(self) -> None:
        if isinstance(self.filters, (dict, list)):
            self.filters = FilterExpression.parse(self.filters)
        if self.identity_mode == IdentityMode.NATURAL and not self.identity:
            # reference fallback: identity_from_all_properties (vertex.py:822-827)
            self.identity = [f.name for f in self.fields]
        if self.identity_mode == IdentityMode.HASH and not self.identity_funnel:
            if not self.identity:
                raise ValueError(f"hash identity for {self.name} needs source fields")
            self.identity_funnel = [list(self.identity)]

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    @property
    def identity_fields(self) -> list[str]:
        """Columns that form the primary key of the materialized vertex table."""
        if self.identity_mode == IdentityMode.NATURAL:
            return list(self.identity)
        return [self.HASH_KEY]


@dataclass(frozen=True)
class EdgeId:
    """(source, target, relation) triple naming an edge type
    (reference edge.py:269-271)."""

    source: str
    target: str
    relation: str | None = None

    def table_name(self) -> str:
        rel = self.relation or "edge"
        return f"{self.source}__{rel}__{self.target}"

    def __str__(self) -> str:  # pragma: no cover
        return self.table_name()


class EdgeType(str, enum.Enum):
    DIRECT = "direct"
    INDIRECT = "indirect"


@dataclass
class Edge:
    """An edge type declaration (reference edge.py:90-277)."""

    source: str
    target: str
    relation: str | None = None
    directed: bool = True
    type: EdgeType = EdgeType.DIRECT
    properties: list[Field] = dc_field(default_factory=list)
    # extra uniqueness key columns among edge properties (edge.py:141-151)
    identities: list[str] = dc_field(default_factory=list)
    indexes: list[IndexConfig] = dc_field(default_factory=list)

    @property
    def edge_id(self) -> EdgeId:
        return EdgeId(self.source, self.target, self.relation)

    @property
    def property_names(self) -> list[str]:
        return [f.name for f in self.properties]


@dataclass
class CoreSchema:
    """Logical graph: vertex + edge configs; validates edge endpoints are
    declared vertices (reference core.py:34-47)."""

    vertices: list[Vertex]
    edges: list[Edge] = dc_field(default_factory=list)

    def __post_init__(self) -> None:
        names = {v.name for v in self.vertices}
        if len(names) != len(self.vertices):
            raise ValueError("duplicate vertex names")
        for e in self.edges:
            for endpoint in (e.source, e.target):
                if endpoint not in names:
                    raise ValueError(
                        f"edge {e.edge_id} references undeclared vertex {endpoint!r}"
                    )

    def vertex(self, name: str) -> Vertex:
        for v in self.vertices:
            if v.name == name:
                return v
        raise KeyError(name)

    def edge(self, source: str, target: str, relation: str | None = None) -> Edge:
        for e in self.edges:
            if e.source == source and e.target == target and e.relation == relation:
                return e
        raise KeyError((source, target, relation))

    @property
    def vertex_names(self) -> list[str]:
        return [v.name for v in self.vertices]

    @property
    def edge_ids(self) -> list[EdgeId]:
        return [e.edge_id for e in self.edges]

    def edges_between(self, source: str, target: str) -> list[Edge]:
        return [e for e in self.edges if e.source == source and e.target == target]

    def incident_edges(self, vertex: str) -> list[Edge]:
        return [e for e in self.edges if vertex in (e.source, e.target)]


@dataclass
class GraphManifest:
    """Top-level contract: schema + resources (ingestion model)
    (reference manifest.py:17)."""

    schema: CoreSchema
    resources: list[Any] = dc_field(default_factory=list)  # list[ResourceConfig]

    def resource(self, name: str):
        for r in self.resources:
            if r.name == name:
                return r
        raise KeyError(name)
