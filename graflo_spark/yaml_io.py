"""YAML manifest contract: load/save GraphManifest (schema + resources).

The reference's user-facing contract is a YAML manifest validated at load
(graflo/architecture/contract/manifest.py + test/config/schema/*.yaml). This
module gives the Spark engine the same declarative surface: a user can keep
their graph definition in YAML, load it, and hand the resources to
:class:`graflo_spark.engine.GraphEngine`.

Unknown keys fail loudly (the reference's ``extra="forbid"`` with relocation
hints, architecture/base.py:12-131).
"""

from __future__ import annotations

from typing import Any

import yaml

from graflo_spark.filters import FilterExpression
from graflo_spark.manifest import (
    CoreSchema,
    Edge,
    Field,
    FieldType,
    GraphManifest,
    IdentityMode,
    IndexConfig,
    IndexType,
    Vertex,
)
from graflo_spark.steps import (
    DescendStep,
    DynamicEdgeStep,
    EdgeLink,
    EdgeStep,
    ResourceConfig,
    Step,
    TransformStep,
    VertexRouterStep,
    VertexStep,
)
from graflo_spark.transforms import Transform


def _check_keys(d: dict, allowed: set[str], ctx: str) -> None:
    extra = set(d) - allowed
    if extra:
        raise ValueError(f"unknown keys {sorted(extra)} in {ctx} (allowed: {sorted(allowed)})")


# ------------------------------------------------------------------- fields

def _field_from(spec: Any) -> Field:
    if isinstance(spec, str):
        return Field(spec)
    _check_keys(spec, {"name", "type", "item_type"}, "field")
    return Field(
        spec["name"],
        FieldType(spec["type"]) if spec.get("type") else None,
        FieldType(spec["item_type"]) if spec.get("item_type") else None,
    )


def _field_dict(f: Field) -> Any:
    if f.type is None:
        return f.name
    out = {"name": f.name, "type": f.type.value}
    if f.item_type is not None:
        out["item_type"] = f.item_type.value
    return out


# ------------------------------------------------------------------- schema

_VERTEX_KEYS = {
    "name", "fields", "identity", "identity_mode", "identity_funnel",
    "secondary_identities", "filters", "indexes",
}


def _index_from(d: dict) -> IndexConfig:
    _check_keys(d, {"fields", "type", "unique", "sparse"}, "index")
    return IndexConfig(
        fields=tuple(d["fields"]),
        type=IndexType(d.get("type", "persistent")),
        unique=d.get("unique", False),
        sparse=d.get("sparse", False),
    )


def _index_dict(i: IndexConfig) -> dict:
    out: dict = {"fields": list(i.fields)}
    if i.type != IndexType.PERSISTENT:
        out["type"] = i.type.value
    if i.unique:
        out["unique"] = True
    if i.sparse:
        out["sparse"] = True
    return out


def vertex_from_dict(d: dict) -> Vertex:
    _check_keys(d, _VERTEX_KEYS, f"vertex {d.get('name')!r}")
    return Vertex(
        name=d["name"],
        fields=[_field_from(f) for f in d.get("fields", [])],
        identity=list(d.get("identity", [])),
        identity_mode=IdentityMode(d.get("identity_mode", "natural")),
        identity_funnel=[list(b) for b in d.get("identity_funnel", [])],
        secondary_identities={
            k: list(v) for k, v in d.get("secondary_identities", {}).items()
        },
        filters=FilterExpression.parse(d["filters"]) if d.get("filters") else None,
        indexes=[_index_from(i) for i in d.get("indexes", [])],
    )


def vertex_to_dict(v: Vertex) -> dict:
    out: dict = {"name": v.name, "fields": [_field_dict(f) for f in v.fields]}
    if v.identity:
        out["identity"] = list(v.identity)
    if v.identity_mode != IdentityMode.NATURAL:
        out["identity_mode"] = v.identity_mode.value
    if v.identity_funnel and v.identity_funnel != [list(v.identity)]:
        out["identity_funnel"] = [list(b) for b in v.identity_funnel]
    if v.secondary_identities:
        out["secondary_identities"] = {k: list(c) for k, c in v.secondary_identities.items()}
    if v.filters is not None:
        out["filters"] = v.filters.to_dict()
    if v.indexes:
        out["indexes"] = [_index_dict(i) for i in v.indexes]
    return out


_EDGE_KEYS = {
    "source", "target", "relation", "directed", "type", "properties",
    "identities", "indexes",
}


def edge_from_dict(d: dict) -> Edge:
    _check_keys(d, _EDGE_KEYS, f"edge {d.get('source')}->{d.get('target')}")
    from graflo_spark.manifest import EdgeType

    return Edge(
        source=d["source"],
        target=d["target"],
        relation=d.get("relation"),
        directed=d.get("directed", True),
        type=EdgeType(d.get("type", "direct")),
        properties=[_field_from(f) for f in d.get("properties", [])],
        identities=list(d.get("identities", [])),
        indexes=[_index_from(i) for i in d.get("indexes", [])],
    )


def edge_to_dict(e: Edge) -> dict:
    from graflo_spark.manifest import EdgeType

    out: dict = {"source": e.source, "target": e.target}
    if e.relation is not None:
        out["relation"] = e.relation
    if not e.directed:
        out["directed"] = False
    if e.type != EdgeType.DIRECT:
        # round-trip fidelity: an INDIRECT edge previously lost its type
        # through save/load (review finding)
        out["type"] = e.type.value
    if e.properties:
        out["properties"] = [_field_dict(f) for f in e.properties]
    if e.identities:
        out["identities"] = list(e.identities)
    if e.indexes:
        out["indexes"] = [_index_dict(i) for i in e.indexes]
    return out


# -------------------------------------------------------------------- steps

def step_from_dict(d: dict) -> Step:
    kinds = [k for k in ("descend", "transform", "vertex", "vertex_router",
                         "edge", "dynamic_edge") if k in d]
    if len(kinds) != 1:
        raise ValueError(f"step must have exactly one kind key, got {sorted(d)}")
    kind = kinds[0]
    body = d[kind] or {}
    if kind == "vertex":
        if isinstance(body, str):  # sugar: "vertex: customer"
            return VertexStep(name=body)
        _check_keys(body, {"name", "mapping", "extraction_scope", "keep_fields",
                           "role", "lookup_only"}, "vertex step")
        return VertexStep(**body)
    if kind == "descend":
        _check_keys(body, {"key", "any_key", "steps"}, "descend step")
        return DescendStep(
            key=body.get("key"),
            any_key=body.get("any_key", False),
            steps=[step_from_dict(s) for s in body.get("steps", [])],
        )
    if kind == "transform":
        return TransformStep(transform=Transform(**body))
    if kind == "vertex_router":
        _check_keys(body, {"type_field", "type_map", "vertex_from_map", "role"},
                    "vertex_router step")
        return VertexRouterStep(**body)
    if kind == "edge":
        if "links" in body:
            return EdgeStep(links=[EdgeLink(**l) for l in body["links"]])
        return EdgeStep.single(**body)
    if kind == "dynamic_edge":
        return DynamicEdgeStep(**body)
    raise AssertionError(kind)


def step_to_dict(s: Step) -> dict:
    from dataclasses import asdict, fields as dc_fields

    def compact(obj, defaults) -> dict:
        out = {}
        for f in dc_fields(obj):
            v = getattr(obj, f.name)
            if v != defaults.get(f.name):
                out[f.name] = v
        return out

    if isinstance(s, VertexStep):
        return {"vertex": compact(s, {"mapping": {}, "extraction_scope": "full",
                                      "keep_fields": None, "role": None,
                                      "lookup_only": False})}
    if isinstance(s, DescendStep):
        return {"descend": {
            **({"key": s.key} if s.key else {"any_key": True}),
            "steps": [step_to_dict(x) for x in s.steps],
        }}
    if isinstance(s, TransformStep):
        return {"transform": {
            k: v for k, v in asdict(s.transform).items()
            if v not in (None, [], {}, "fields", "single", False)
        }}
    if isinstance(s, EdgeStep):
        links = [
            {k: v for k, v in asdict(l).items() if v not in (None, [], {}, False)}
            for l in s.links
        ]
        return {"edge": links[0] if len(links) == 1 else {"links": links}}
    if isinstance(s, VertexRouterStep):
        return {"vertex_router": compact(s, {"type_map": {}, "vertex_from_map": {},
                                             "role": None})}
    if isinstance(s, DynamicEdgeStep):
        return {"dynamic_edge": compact(s, {"relation_field": None,
                                            "relation_map": {},
                                            "strict_edge_types": False,
                                            "weights": []})}
    raise TypeError(f"unknown step {s!r}")


_RESOURCE_KEYS = {
    "name", "steps", "infer_edges", "infer_edge_only", "infer_edge_except",
    "doc_key", "strip_trivial",
}


def resource_from_dict(d: dict) -> ResourceConfig:
    _check_keys(d, _RESOURCE_KEYS, f"resource {d.get('name')!r}")
    return ResourceConfig(
        name=d["name"],
        steps=[step_from_dict(s) for s in d.get("steps", [])],
        infer_edges=d.get("infer_edges", True),
        infer_edge_only=d.get("infer_edge_only"),
        infer_edge_except=[tuple(p) for p in d.get("infer_edge_except", [])],
        doc_key=d.get("doc_key"),
        strip_trivial=d.get("strip_trivial", False),
    )


def resource_to_dict(r: ResourceConfig) -> dict:
    out: dict = {"name": r.name, "steps": [step_to_dict(s) for s in r.steps]}
    if not r.infer_edges:
        out["infer_edges"] = False
    if r.infer_edge_only is not None:
        out["infer_edge_only"] = [list(p) for p in r.infer_edge_only]
    if r.infer_edge_except:
        out["infer_edge_except"] = [list(p) for p in r.infer_edge_except]
    if r.doc_key:
        out["doc_key"] = list(r.doc_key)
    if r.strip_trivial:
        out["strip_trivial"] = True
    return out


# ----------------------------------------------------------------- manifest

def manifest_from_dict(d: dict) -> GraphManifest:
    _check_keys(d, {"schema", "resources"}, "manifest")
    sd = d["schema"]
    _check_keys(sd, {"vertices", "edges"}, "schema")
    schema = CoreSchema(
        vertices=[vertex_from_dict(v) for v in sd.get("vertices", [])],
        edges=[edge_from_dict(e) for e in sd.get("edges", [])],
    )
    return GraphManifest(
        schema=schema,
        resources=[resource_from_dict(r) for r in d.get("resources", [])],
    )


def manifest_to_dict(m: GraphManifest) -> dict:
    return {
        "schema": {
            "vertices": [vertex_to_dict(v) for v in m.schema.vertices],
            "edges": [edge_to_dict(e) for e in m.schema.edges],
        },
        "resources": [resource_to_dict(r) for r in m.resources],
    }


def load_manifest(path: str) -> GraphManifest:
    with open(path) as f:
        return manifest_from_dict(yaml.safe_load(f))


def save_manifest(m: GraphManifest, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(manifest_to_dict(m), f, sort_keys=False)


def loads_manifest(text: str) -> GraphManifest:
    return manifest_from_dict(yaml.safe_load(text))
