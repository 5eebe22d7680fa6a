"""Manifest visualization: Graphviz DOT emission (reference
graflo/plot/plotter.py + cli/plot_manifest.py — that implementation renders
through pygraphviz; this one emits DOT text directly so it has zero
dependencies and the output is diffable/testable. Render with any graphviz
install: ``dot -Tpng manifest.dot -o manifest.png``).

Driver-side only — a manifest is metadata; no Spark involvement.
"""

from __future__ import annotations

from graflo_spark.manifest import CoreSchema, GraphManifest
from graflo_spark.steps import (
    DescendStep,
    DynamicEdgeStep,
    ResourceConfig,
    VertexRouterStep,
    VertexStep,
)


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _vertex_label(v, include_fields: bool) -> str:
    if not include_fields:
        return _esc(v.name)
    rows = [f"<b>{_esc(v.name)}</b>"]
    id_cols = set(v.identity)
    for f in v.fields:
        mark = "*" if f.name in id_cols else ""
        typ = f" : {f.type.value}" if f.type is not None else ""
        rows.append(f"{mark}{_esc(f.name)}{_esc(typ)}")
    return "\\n".join(rows)


def _resource_vertices(r: ResourceConfig) -> list[str]:
    names: list[str] = []

    def walk(steps) -> None:
        for s in steps:
            if isinstance(s, VertexStep):
                names.append(s.name)
            elif isinstance(s, DescendStep):
                walk(s.steps)
            elif isinstance(s, VertexRouterStep):
                names.extend(sorted(set(s.type_map.values())))
    walk(r.steps)
    seen: set[str] = set()
    return [n for n in names if not (n in seen or seen.add(n))]


def manifest_to_dot(
    m: GraphManifest | CoreSchema,
    include_fields: bool = True,
    include_resources: bool = True,
) -> str:
    """Render a manifest as DOT: one node per vertex type (identity columns
    starred), one labeled edge per edge type (dashed when undirected), and —
    when ``include_resources`` — one box per resource with dotted arrows to
    the vertex types it extracts."""
    if isinstance(m, CoreSchema):
        m = GraphManifest(schema=m)
    out = [
        "digraph manifest {",
        "  rankdir=LR;",
        '  node [shape=box, fontname="Helvetica"];',
    ]
    for v in m.schema.vertices:
        out.append(
            f'  "{_esc(v.name)}" [label="{_vertex_label(v, include_fields)}"];'
        )
    for e in m.schema.edges:
        attrs = [f'label="{_esc(e.relation)}"'] if e.relation else []
        if not e.directed:
            attrs.append("dir=none, style=dashed")
        attr_s = f" [{', '.join(attrs)}]" if attrs else ""
        out.append(f'  "{_esc(e.source)}" -> "{_esc(e.target)}"{attr_s};')
    if include_resources and m.resources:
        out.append("  subgraph cluster_resources {")
        out.append('    label="resources"; style=dashed;')
        for r in m.resources:
            rid = f"resource::{r.name}"
            out.append(
                f'    "{_esc(rid)}" [label="{_esc(r.name)}", shape=note];'
            )
        out.append("  }")
        for r in m.resources:
            rid = f"resource::{r.name}"
            for vname in _resource_vertices(r):
                out.append(
                    f'  "{_esc(rid)}" -> "{_esc(vname)}" [style=dotted, arrowhead=open];'
                )
            if any(isinstance(s, DynamicEdgeStep) for s in r.steps):
                out.append(f'  "{_esc(rid)}" [xlabel="dynamic edges"];')
    out.append("}")
    return "\n".join(out) + "\n"


def save_dot(m: GraphManifest | CoreSchema, path: str, **kwargs) -> None:
    with open(path, "w") as fh:
        fh.write(manifest_to_dot(m, **kwargs))
