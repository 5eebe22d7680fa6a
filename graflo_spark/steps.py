"""Pipeline step configs — the declarative resource pipeline.

Mirrors the reference's actor configs (graflo/architecture/contract/ingestion/
steps/models.py; priority order descend < transform < vertex_router < vertex <
edge, runtime/actor/descend.py:208-216) but compiles to DataFrame plans, not a
per-row actor tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from graflo_spark.transforms import Transform


@dataclass
class Step:
    pass


@dataclass
class DescendStep(Step):
    """Descend into ``key`` (list-of-struct / list-of-scalar / struct), or all
    keys when ``any_key`` (reference actor/descend.py:134-152). Sub-steps run
    at the child nesting level. Scalar list items surface as column ``__item``."""

    key: str | None = None
    any_key: bool = False
    steps: list[Step] = dc_field(default_factory=list)


@dataclass
class TransformStep(Step):
    transform: Transform = None  # type: ignore[assignment]


@dataclass
class VertexStep(Step):
    """Extract a vertex at the current nesting level.

    ``mapping`` is ``{vertex_field: doc_field}`` (reference ``from:``,
    actor/vertex.py:172-200); unmapped schema fields present in the frame pass
    through unless ``extraction_scope='mapped_only'``. ``lookup_only`` vertices
    feed edge joins but are never written (steps/models.py:58-67)."""

    name: str = ""
    mapping: dict[str, str] = dc_field(default_factory=dict)
    extraction_scope: str = "full"  # or "mapped_only"
    keep_fields: list[str] | None = None
    role: str | None = None
    lookup_only: bool = False


@dataclass
class VertexRouterStep(Step):
    """Per-row dispatch on ``type_field`` to a vertex type
    (reference actor/vertex_router.py:34-168)."""

    type_field: str = ""
    type_map: dict[str, str] = dc_field(default_factory=dict)  # value -> vertex name
    vertex_from_map: dict[str, dict[str, str]] = dc_field(default_factory=dict)
    role: str | None = None


@dataclass
class EdgeLink:
    """One link of a (possibly multi-link) edge step."""

    source: str = ""
    target: str = ""
    relation: str | None = None
    source_role: str | None = None
    target_role: str | None = None
    # secondary-identity names to match endpoints on (reference
    # steps/models.py:347-377); None -> primary identity
    match_source: str | None = None
    match_target: str | None = None
    # location filters (reference edge_render.py:122-140): keep only
    # source/target extracts whose descend path contains / excludes a key
    match_source_key: str | None = None
    match_target_key: str | None = None
    exclude_source_key: str | None = None
    exclude_target_key: str | None = None
    # weights: edge property columns sourced from vertex docs / frame columns
    weights: list[str] = dc_field(default_factory=list)
    # relation resolution
    relation_field: str | None = None
    relation_map: dict[str, str] = dc_field(default_factory=dict)
    relation_from_key: bool = False
    # casting override (reference edge_render.py:215-228 auto-choice):
    # None=auto (pair/product by location, star for homogeneous),
    # "combinations" = unordered item pairs within the document (the
    # reference's COMBINATIONS for self-edges)
    casting: str | None = None


@dataclass
class EdgeStep(Step):
    links: list[EdgeLink] = dc_field(default_factory=list)

    @classmethod
    def single(cls, **kwargs: Any) -> "EdgeStep":
        return cls(links=[EdgeLink(**kwargs)])


@dataclass
class DynamicEdgeStep(Step):
    """Endpoint types come from router slots per row (reference
    actor/edge.py:326-424). Spark design is the two-pass variant the reference
    docs recommend: the router already split rows per type, so every present
    (source_type, target_type) pair renders as a static edge;
    ``strict_edge_types`` gates pairs to those declared in the schema."""

    source_role: str = ""
    target_role: str = ""
    relation_field: str | None = None
    relation_map: dict[str, str] = dc_field(default_factory=dict)
    strict_edge_types: bool = False
    weights: list[str] = dc_field(default_factory=list)


@dataclass
class ResourceConfig:
    """A named resource: a source DataFrame + a pipeline of steps
    (reference contract/ingestion/resource.py:131-136)."""

    name: str
    steps: list[Step] = dc_field(default_factory=list)
    # inferred edges (reference runtime/assemble.py:140-213)
    infer_edges: bool = True
    infer_edge_only: list[tuple[str, str]] | None = None
    infer_edge_except: list[tuple[str, str]] = dc_field(default_factory=list)
    # natural document key columns; used for a deterministic doc id when set
    doc_key: list[str] | None = None
    # strip None/"" top-level values pre-pipeline (runtime/resource.py:32-34)
    strip_trivial: bool = False
