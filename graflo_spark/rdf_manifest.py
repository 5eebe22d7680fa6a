"""Manifest <-> RDF round-trip (the reference's ``gf:`` ontology surface).

Reference: graflo/rdf/serializer.py (manifest -> rdflib Graph),
graflo/rdf/deserializer.py (Graph -> manifest), graflo/rdf/namespace.py
(vocabulary). The reference leans on rdflib; this implementation is
self-contained: a manifest serializes to a deterministic list of
``(subject, predicate, object)`` triples using the same ``gf:`` namespace and
class/property names, emits/parses standard **N-Triples** text, and bridges to
a Spark triples DataFrame — so a serialized manifest is itself queryable with
the engine's own RDF tooling (``io.triples_to_docs``) and feeds
``infer.infer_schema_from_ontology``-style jobs.

Scale note: a manifest is KBs of driver-side metadata; nothing here touches
executors except the optional DataFrame bridge (a ``createDataFrame`` of a
tiny list). The 100 TB ABox never flows through this module.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from graflo_spark.manifest import (
    CoreSchema,
    Edge,
    EdgeType,
    Field,
    FieldType,
    GraphManifest,
    IdentityMode,
    Vertex,
)
from graflo_spark.steps import (
    DescendStep,
    DynamicEdgeStep,
    EdgeStep,
    ResourceConfig,
    TransformStep,
    VertexRouterStep,
    VertexStep,
)
from graflo_spark.yaml_io import (
    _index_dict,
    _index_from,
    resource_from_dict,
    resource_to_dict,
)

GF = "https://ontology.growgraph.dev/graflo/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_STEP_CLASS = {
    VertexStep: GF + "VertexActor",
    EdgeStep: GF + "EdgeActor",
    TransformStep: GF + "TransformActor",
    DescendStep: GF + "DescendActor",
    VertexRouterStep: GF + "VertexRouterActor",
    DynamicEdgeStep: GF + "DynamicEdgeActor",
}


class IRI(str):
    """Marker: this triple object is a resource, not a literal."""

    __slots__ = ()


Triple = tuple[str, str, Any]


def _viri(name: str) -> IRI:
    return IRI(GF + f"vertex/{name}")


def _firi(vname: str, fname: str) -> IRI:
    return IRI(GF + f"vertex/{vname}/field/{fname}")


def _eiri(e: Edge) -> IRI:
    return IRI(GF + f"edge/{e.edge_id.table_name()}")


def _jlit(value: Any) -> str:
    return json.dumps(value, sort_keys=True)


def manifest_to_triples(m: GraphManifest | CoreSchema) -> list[Triple]:
    """Serialize a manifest (or bare schema) to ``gf:`` triples.

    Node IRIs are deterministic functions of names (no blank nodes), so
    serialization is stable across runs — the property the reference gets
    from ordered rdflib graphs (serializer.py skolemization).
    Ordered collections (identity columns, funnel branches, pipeline steps)
    carry explicit ``gf:order`` / JSON-array literals because RDF triples are
    unordered.
    """
    if isinstance(m, CoreSchema):
        m = GraphManifest(schema=m)
    t: list[Triple] = []
    man = IRI(GF + "manifest")
    t.append((man, RDF_TYPE, IRI(GF + "GraphManifest")))
    for vorder, v in enumerate(m.schema.vertices):
        vi = _viri(v.name)
        t.append((man, GF + "hasVertex", vi))
        t.append((vi, RDF_TYPE, IRI(GF + "Vertex")))
        t.append((vi, GF + "name", v.name))
        t.append((vi, GF + "order", vorder))
        for order, f in enumerate(v.fields):
            fi = _firi(v.name, f.name)
            t.append((vi, GF + "hasField", fi))
            t.append((fi, RDF_TYPE, IRI(GF + "Field")))
            t.append((fi, GF + "name", f.name))
            t.append((fi, GF + "order", order))
            if f.type is not None:
                t.append((fi, GF + "fieldType", f.type.value))
            if f.item_type is not None:
                t.append((fi, GF + "itemType", f.item_type.value))
        t.append((vi, GF + "identityMode", v.identity_mode.value))
        if v.identity:
            t.append((vi, GF + "identity", _jlit(v.identity)))
        if v.identity_funnel and v.identity_funnel != [list(v.identity)]:
            t.append((vi, GF + "identityFunnel", _jlit(v.identity_funnel)))
        for sec_name in sorted(v.secondary_identities):
            si = IRI(GF + f"vertex/{v.name}/secondary/{sec_name}")
            t.append((vi, GF + "hasSecondaryIdentity", si))
            t.append((si, RDF_TYPE, IRI(GF + "SecondaryIdentity")))
            t.append((si, GF + "name", sec_name))
            t.append((si, GF + "keyFields", _jlit(v.secondary_identities[sec_name])))
        if v.filters is not None:
            t.append((vi, GF + "filters", _jlit(v.filters.to_dict())))
        if v.indexes:
            t.append((vi, GF + "indexes", _jlit([_index_dict(i) for i in v.indexes])))
    for eorder, e in enumerate(m.schema.edges):
        ei = _eiri(e)
        t.append((man, GF + "hasEdge", ei))
        t.append((ei, RDF_TYPE, IRI(GF + "Edge")))
        t.append((ei, GF + "order", eorder))
        t.append((ei, GF + "source", _viri(e.source)))
        t.append((ei, GF + "target", _viri(e.target)))
        if e.relation is not None:
            t.append((ei, GF + "relation", e.relation))
        t.append((ei, GF + "directed", e.directed))
        t.append((ei, GF + "edgeType", e.type.value))
        for order, f in enumerate(e.properties):
            fi = IRI(GF + f"edge/{e.edge_id.table_name()}/field/{f.name}")
            t.append((ei, GF + "hasField", fi))
            t.append((fi, RDF_TYPE, IRI(GF + "Field")))
            t.append((fi, GF + "name", f.name))
            t.append((fi, GF + "order", order))
            if f.type is not None:
                t.append((fi, GF + "fieldType", f.type.value))
        if e.identities:
            t.append((ei, GF + "edgeIdentities", _jlit(e.identities)))
        if e.indexes:
            t.append((ei, GF + "indexes", _jlit([_index_dict(i) for i in e.indexes])))
    for rorder, r in enumerate(m.resources):
        ri = IRI(GF + f"resource/{r.name}")
        t.append((man, GF + "hasResource", ri))
        t.append((ri, RDF_TYPE, IRI(GF + "Resource")))
        t.append((ri, GF + "name", r.name))
        t.append((ri, GF + "order", rorder))
        rd = resource_to_dict(r)
        for order, (step, sd) in enumerate(zip(r.steps, rd["steps"])):
            si = IRI(GF + f"resource/{r.name}/step/{order}")
            t.append((ri, GF + "hasStep", si))
            t.append((si, RDF_TYPE, IRI(_STEP_CLASS[type(step)])))
            t.append((si, GF + "order", order))
            t.append((si, GF + "config", _jlit(sd)))
        extra = {k: v for k, v in rd.items() if k not in ("name", "steps")}
        if extra:
            t.append((ri, GF + "resourceConfig", _jlit(extra)))
    return t


def triples_to_manifest(triples: Iterable[Triple]) -> GraphManifest:
    """Reconstruct a manifest from ``gf:`` triples (reference
    rdf/deserializer.py). Accepts any triple order."""
    by_subject: dict[str, dict[str, list[Any]]] = {}
    for s, p, o in triples:
        by_subject.setdefault(str(s), {}).setdefault(p, []).append(o)

    def one(node: str, pred: str, default: Any = None) -> Any:
        vals = by_subject.get(node, {}).get(GF + pred)
        return vals[0] if vals else default

    def ordered(node: str, pred: str) -> list[str]:
        kids = [str(k) for k in by_subject.get(node, {}).get(GF + pred, [])]
        return sorted(kids, key=lambda k: (one(k, "order", 0), k))

    def parse_field(fi: str) -> Field:
        ftype = one(fi, "fieldType")
        itype = one(fi, "itemType")
        return Field(
            one(fi, "name"),
            FieldType(ftype) if ftype else None,
            FieldType(itype) if itype else None,
        )

    man = GF + "manifest"
    vertices = []
    for vi in ordered(man, "hasVertex"):
        sec = {}
        for si in ordered(vi, "hasSecondaryIdentity"):
            sec[one(si, "name")] = json.loads(one(si, "keyFields"))
        filters = one(vi, "filters")
        vertices.append(
            Vertex(
                one(vi, "name"),
                [parse_field(fi) for fi in ordered(vi, "hasField")],
                identity=json.loads(one(vi, "identity", "[]")),
                identity_mode=IdentityMode(one(vi, "identityMode", "natural")),
                identity_funnel=[
                    list(b) for b in json.loads(one(vi, "identityFunnel", "[]"))
                ],
                secondary_identities=sec,
                filters=json.loads(filters) if filters else None,
                indexes=[
                    _index_from(d) for d in json.loads(one(vi, "indexes", "[]"))
                ],
            )
        )
    vname_by_iri = {str(_viri(v.name)): v.name for v in vertices}
    edges = []
    for ei in ordered(man, "hasEdge"):
        edges.append(
            Edge(
                vname_by_iri[str(one(ei, "source"))],
                vname_by_iri[str(one(ei, "target"))],
                relation=one(ei, "relation"),
                directed=bool(one(ei, "directed", True)),
                type=EdgeType(one(ei, "edgeType", "direct")),
                properties=[parse_field(fi) for fi in ordered(ei, "hasField")],
                identities=json.loads(one(ei, "edgeIdentities", "[]")),
                indexes=[
                    _index_from(d) for d in json.loads(one(ei, "indexes", "[]"))
                ],
            )
        )
    resources = []
    for ri in ordered(man, "hasResource"):
        rd: dict = {"name": one(ri, "name"), "steps": []}
        for si in ordered(ri, "hasStep"):
            rd["steps"].append(json.loads(one(si, "config")))
        extra = one(ri, "resourceConfig")
        if extra:
            rd.update(json.loads(extra))
        resources.append(resource_from_dict(rd))
    return GraphManifest(schema=CoreSchema(vertices, edges), resources=resources)


# ----------------------------------------------------------- N-Triples text


def _nt_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _nt_unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append({"n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\"}[nxt])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


_XSD = "http://www.w3.org/2001/XMLSchema#"


def to_ntriples(triples: Iterable[Triple]) -> str:
    """Standard N-Triples text. Booleans/ints get xsd datatypes so the
    round-trip preserves Python types."""
    lines = []
    for s, p, o in triples:
        if isinstance(o, IRI):
            obj = f"<{o}>"
        elif isinstance(o, bool):
            obj = f'"{str(o).lower()}"^^<{_XSD}boolean>'
        elif isinstance(o, int):
            obj = f'"{o}"^^<{_XSD}integer>'
        else:
            obj = f'"{_nt_escape(str(o))}"'
        lines.append(f"<{s}> <{p}> {obj} .")
    return "\n".join(lines) + "\n"


def from_ntriples(text: str) -> list[Triple]:
    triples: list[Triple] = []
    # split on "\n" only: \n and \r in literals are escaped, but exotic
    # line separators (\x0b,  , ...) may legally sit raw inside a
    # literal and must not break the line framing
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if not (line.startswith("<") and line.endswith(".")):
            raise ValueError(f"not an N-Triples line: {line[:80]!r}")
        s, rest = line[1:].split("> <", 1)
        p, rest = rest.split(">", 1)
        rest = rest.strip()[:-1].strip()  # drop trailing '.'
        o: Any
        if rest.startswith("<") and rest.endswith(">"):
            o = IRI(rest[1:-1])
        else:
            # A datatyped literal is '"..."^^<iri>'. Anchor the split on the
            # CLOSING quote ('"^^<'): interior quotes are escaped to \" by
            # _nt_escape, so a raw '"^^<' can only be the datatype marker —
            # a bare rpartition('^^') would eat '^^' inside the literal body
            # (Hypothesis counterexample: literal '^^' round-tripped to '').
            if rest.endswith(">") and '"^^<' in rest:
                lit, _, dtype = rest.rpartition('"^^<')
                lit, dtype = lit + '"', "<" + dtype
            else:  # plain literal, no datatype
                lit, dtype = rest, ""
            body = _nt_unescape(lit.strip()[1:-1])
            if dtype == f"<{_XSD}boolean>":
                o = body == "true"
            elif dtype == f"<{_XSD}integer>":
                o = int(body)
            else:
                o = body
        triples.append((s, p, o))
    return triples


# -------------------------------------------------------- Spark DF bridge


def triples_df(spark, m: GraphManifest | CoreSchema):
    """Manifest as a Spark triples DataFrame (subject/predicate/object
    strings) — queryable with ``io.triples_to_docs`` like any RDF source."""
    rows = [
        (str(s), str(p), str(o) if not isinstance(o, bool) else str(o).lower())
        for s, p, o in manifest_to_triples(m)
    ]
    return spark.createDataFrame(rows, ["subject", "predicate", "object"])


def save_manifest_rdf(m: GraphManifest | CoreSchema, path: str) -> None:
    with open(path, "w") as fh:
        fh.write(to_ntriples(manifest_to_triples(m)))


def load_manifest_rdf(path: str) -> GraphManifest:
    with open(path) as fh:
        return triples_to_manifest(from_ntriples(fh.read()))
