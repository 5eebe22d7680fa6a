"""Manifest <-> RDF (gf: ontology) round-trip — reference graflo/rdf/
serializer.py + deserializer.py parity, minus the rdflib dependency."""

import pytest

from graflo_spark import rdf_manifest, yaml_io
from graflo_spark.manifest import (
    CoreSchema,
    Edge,
    Field,
    FieldType,
    GraphManifest,
    IdentityMode,
    Vertex,
)
from graflo_spark.steps import (
    DescendStep,
    EdgeStep,
    ResourceConfig,
    Transform,
    TransformStep,
    VertexStep,
)


@pytest.fixture()
def manifest():
    schema = CoreSchema(
        vertices=[
            Vertex(
                "publication",
                [Field("doi", FieldType.STRING), Field("year", FieldType.INT),
                 Field("refs", FieldType.LIST, FieldType.STRING)],
                identity=["doi"],
                secondary_identities={"by_year": ["year"]},
                filters={"field": "year", "op": ">=", "value": 1900},
            ),
            Vertex(
                "author",
                [Field("first"), Field("last"), Field("orcid")],
                identity_mode=IdentityMode.HASH,
                identity=["orcid"],
                identity_funnel=[["orcid"], ["first", "last"]],
            ),
        ],
        edges=[
            Edge("publication", "author", relation="authored_by",
                 properties=[Field("position", FieldType.INT)],
                 identities=["position"]),
            Edge("publication", "publication", relation="cites", directed=True),
        ],
    )
    res = ResourceConfig(
        name="pubs",
        steps=[
            VertexStep(name="publication"),
            TransformStep(transform=Transform(
                rename={"given": "first", "family": "last"})),
            DescendStep(key="authors", steps=[
                VertexStep(name="author"),
                EdgeStep.single(source="publication", target="author",
                                relation="authored_by"),
            ]),
        ],
        infer_edges=False,
    )
    return GraphManifest(schema=schema, resources=[res])


def test_rdf_roundtrip_manifest(manifest):
    triples = rdf_manifest.manifest_to_triples(manifest)
    m2 = rdf_manifest.triples_to_manifest(triples)
    assert yaml_io.manifest_to_dict(m2) == yaml_io.manifest_to_dict(manifest)


def test_rdf_roundtrip_shuffled_triples(manifest):
    """RDF graphs are unordered — the deserializer must not depend on the
    serializer's emission order."""
    triples = rdf_manifest.manifest_to_triples(manifest)
    m2 = rdf_manifest.triples_to_manifest(list(reversed(triples)))
    assert yaml_io.manifest_to_dict(m2) == yaml_io.manifest_to_dict(manifest)


def test_ntriples_text_roundtrip(manifest, tmp_path):
    path = str(tmp_path / "manifest.nt")
    rdf_manifest.save_manifest_rdf(manifest, path)
    m2 = rdf_manifest.load_manifest_rdf(path)
    assert yaml_io.manifest_to_dict(m2) == yaml_io.manifest_to_dict(manifest)
    # escaping survives hostile literals
    tricky = 'quote " backslash \\ newline \n tab \t end'
    line = rdf_manifest.to_ntriples([("s", "p", tricky)])
    (s, p, o), = rdf_manifest.from_ntriples(line)
    assert o == tricky


def test_triples_df_bridge(spark, manifest):
    df = rdf_manifest.triples_df(spark, manifest)
    assert df.columns == ["subject", "predicate", "object"]
    names = {
        r["object"]
        for r in df.filter(
            df.predicate == rdf_manifest.GF + "name"
        ).collect()
    }
    assert {"publication", "author", "pubs"} <= names
