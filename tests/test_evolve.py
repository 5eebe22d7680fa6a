"""Manifest evolution + migration tests (SURVEY §1.3/§2.12)."""

import pytest
from pyspark.sql import functions as F

from graflo_spark import evolve as ev
from graflo_spark.manifest import CoreSchema, Edge, EdgeId, Field, FieldType, Vertex
from graflo_spark.store import GraphStore


def base_schema() -> CoreSchema:
    return CoreSchema(
        vertices=[
            Vertex("Person", [Field("personId", FieldType.INT), Field("fullName")],
                   identity=["personId"]),
            Vertex("city", [Field("city_id", FieldType.INT), Field("name")],
                   identity=["city_id"]),
        ],
        edges=[Edge("Person", "city", relation="livesIn")],
    )


def test_add_remove_rename_vertex():
    s = base_schema()
    s2 = ev.AddVertexOp(Vertex("country", [Field("code")], identity=["code"])).apply(s)
    assert "country" in s2.vertex_names and "country" not in s.vertex_names

    s3 = ev.RemoveVertexOp("city").apply(s2)
    assert "city" not in s3.vertex_names
    assert all("city" not in (e.source, e.target) for e in s3.edges)

    s4 = ev.RenameVertexOp("Person", "human").apply(s2)
    assert "human" in s4.vertex_names
    assert s4.edges[0].source == "human"

    with pytest.raises(ValueError):
        ev.AddVertexOp(Vertex("city", [], identity=[])).apply(s2)


def test_property_ops_and_identity():
    s = base_schema()
    s2 = ev.AddPropertyOp("Person", Field("age", FieldType.INT)).apply(s)
    assert "age" in s2.vertex("Person").field_names

    with pytest.raises(ValueError):
        ev.RemovePropertyOp("Person", "personId").apply(s2)  # identity guard

    s3 = ev.RenamePropertyOp("Person", "personId", "pid").apply(s2)
    assert s3.vertex("Person").identity == ["pid"]

    s4 = ev.ReplaceIdentityOp("Person", ["fullName"]).apply(s2)
    assert s4.vertex("Person").identity == ["fullName"]
    with pytest.raises(ValueError):
        ev.ReplaceIdentityOp("Person", ["nope"]).apply(s2)


def test_merge_and_compose():
    s = base_schema()
    s2 = ev.AddVertexOp(
        Vertex("town", [Field("city_id", FieldType.INT), Field("pop", FieldType.INT)],
               identity=["city_id"])).apply(s)
    s3 = ev.AddEdgeOp(Edge("Person", "town", relation="bornIn")).apply(s2)
    m = ev.MergeVerticesOp(into="city", other="town").apply(s3)
    assert "town" not in m.vertex_names
    assert "pop" in m.vertex("city").field_names
    assert any(e.target == "city" and e.relation == "bornIn" for e in m.edges)

    other = CoreSchema(
        vertices=[Vertex("city", [Field("city_id", FieldType.INT), Field("tz")],
                         identity=["city_id"]),
                  Vertex("planet", [Field("p")], identity=["p"])],
        edges=[Edge("city", "planet", relation="on")],
    )
    c = ev.ComposeManifestsOp(other).apply(s)
    assert "planet" in c.vertex_names
    assert "tz" in c.vertex("city").field_names

    bad = CoreSchema(vertices=[Vertex("city", [Field("name")], identity=["name"])])
    with pytest.raises(ValueError):
        ev.ComposeManifestsOp(bad).apply(s)


def test_sanitize():
    s = ev.SanitizeOp().apply(base_schema())
    assert "person" in s.vertex_names
    assert s.vertex("person").field_names == ["person_id", "full_name"]
    assert s.edges[0].relation == "lives_in"
    assert s.vertex("person").identity == ["person_id"]


def test_diff_roundtrip():
    old = base_schema()
    new = ev.AddVertexOp(Vertex("country", [Field("code")], identity=["code"])).apply(old)
    new = ev.AddEdgeOp(Edge("city", "country", relation="in")).apply(new)
    new = ev.AddPropertyOp("Person", Field("age", FieldType.INT)).apply(new)
    new = ev.RemoveEdgeOp(EdgeId("Person", "city", "livesIn")).apply(new)

    plan = ev.diff(old, new)
    evolved = ev.apply_plan(old, plan)
    assert set(evolved.vertex_names) == set(new.vertex_names)
    assert {e.edge_id for e in evolved.edges} == {e.edge_id for e in new.edges}
    assert evolved.vertex("Person").field_names == new.vertex("Person").field_names


def test_migration_rewrites_store(spark, tables, tmp_path):
    schema = CoreSchema(
        vertices=[
            Vertex("customer",
                   [Field("c_custkey", FieldType.INT), Field("c_name"),
                    Field("c_mktsegment")],
                   identity=["c_custkey"]),
            Vertex("nation", [Field("n_nationkey", FieldType.INT), Field("n_name")],
                   identity=["n_nationkey"]),
        ],
        edges=[Edge("customer", "nation", relation="located_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("customer", tables["customer"].select(
        "c_custkey", "c_name", "c_mktsegment"))
    store.upsert_vertices("nation", tables["nation"].select(
        "n_nationkey", "n_name"))

    plan = [
        ev.RenamePropertyOp("customer", "c_mktsegment", "segment"),
        ev.RemovePropertyOp("customer", "c_name"),
        ev.RenameVertexOp("customer", "client"),
    ]
    schema2 = ev.apply_plan(schema, plan, store=store)
    assert "client" in schema2.vertex_names
    out = store.read_vertices("client")
    assert "segment" in out.columns and "c_name" not in out.columns
    assert out.count() == tables["customer"].count()
    # edge table dir followed the vertex rename
    assert store.schema.edges[0].source == "client"


def test_rename_edge_relation():
    s = base_schema()
    s2 = ev.RenameEdgeRelationOp(EdgeId("Person", "city", "livesIn"),
                                 "residesIn").apply(s)
    assert s2.edges[0].relation == "residesIn"
    with pytest.raises(KeyError):
        ev.RenameEdgeRelationOp(EdgeId("Person", "city", "nope"), "x").apply(s)
    with pytest.raises(ValueError):
        ev.RenameEdgeRelationOp(EdgeId("Person", "city", "livesIn"),
                                "livesIn").apply(s2.__class__(
            vertices=s2.vertices,
            edges=s2.edges + [Edge("Person", "city", relation="livesIn")]))


def test_index_ops_and_unique_verification(spark, tables, tmp_path):
    from graflo_spark.manifest import IndexConfig, IndexType

    schema = CoreSchema(
        vertices=[
            Vertex("customer",
                   [Field("c_custkey", FieldType.INT), Field("c_name"),
                    Field("c_mktsegment")],
                   identity=["c_custkey"]),
        ],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices(
        "customer", tables["customer"].select("c_custkey", "c_name", "c_mktsegment"))

    # add a unique index on the key (holds) and verify
    plan = [ev.AddIndexOp(vertex="customer",
                          index=IndexConfig(("c_custkey",), unique=True))]
    schema2 = ev.apply_plan(schema, plan, store=store)
    assert schema2.vertex("customer").indexes[0].unique
    store.verify_unique_indexes("customer")

    # index metadata lands in the store DDL
    meta = store.introspect_schema()
    assert meta["vertices"]["customer"]["indexes"][0]["fields"] == ["c_custkey"]

    # a unique index on a non-unique column is rejected by verification
    store.schema = ev.AddIndexOp(
        vertex="customer", index=IndexConfig(("c_mktsegment",), unique=True)
    ).apply(schema2)
    with pytest.raises(ValueError, match="unique index"):
        store.verify_unique_indexes("customer")

    # undeclared field fails loudly; removal works
    with pytest.raises(ValueError, match="not declared"):
        ev.AddIndexOp(vertex="customer",
                      index=IndexConfig(("nope",))).apply(schema2)
    s3 = ev.RemoveIndexOp(vertex="customer", fields=("c_custkey",)).apply(schema2)
    assert not s3.vertex("customer").indexes


def test_index_layout_sorts_snapshot(spark, tables, tmp_path):
    from graflo_spark.manifest import IndexConfig

    schema = CoreSchema(
        vertices=[
            Vertex("customer",
                   [Field("c_custkey", FieldType.INT), Field("c_name")],
                   identity=["c_custkey"],
                   indexes=[IndexConfig(("c_name",))]),
        ],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("customer", tables["customer"].select("c_custkey", "c_name"))
    # within every parquet file, rows are sorted by the indexed column so
    # row-group min/max stats give point-lookup data skipping
    import pandas as pd

    part = store.read_vertices("customer")
    pdf = part.withColumn("_file", F.input_file_name()).toPandas()
    for _, grp in pdf.groupby("_file"):
        names = grp["c_name"].tolist()
        assert names == sorted(names)
