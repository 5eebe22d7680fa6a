"""Manifest evolution + migration tests (SURVEY §1.3/§2.12)."""

import warnings

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


def test_snapshot_retention_size_cap(spark, tmp_path):
    """Snapshot pruning policy: below the size cap, `snapshot_keep`
    generations are retained for rollback; once a new snapshot exceeds the
    cap, only that newest generation survives (a second full copy of a big
    table is the storage-doubling the cap prevents)."""
    import os

    schema = CoreSchema(
        vertices=[Vertex("v", [Field("id", FieldType.INT)], identity=["id"])],
        edges=[],
    )
    df = spark.range(50).select(F.col("id").cast("int"))

    def gens(root):
        snaps = os.path.join(root, "vertices", "v", "snapshots")
        return sorted(int(d) for d in os.listdir(snaps) if d.isdigit())

    # generous cap: rolling window of snapshot_keep=2 generations
    big = GraphStore(spark, str(tmp_path / "big"), schema,
                     snapshot_size_cap_bytes=1 << 40)
    tdir = big._table_dir("vertices", "v")
    for _ in range(3):
        big._write_snapshot(tdir, df)
    assert gens(str(tmp_path / "big")) == [1, 2]

    # 1-byte cap: every snapshot exceeds it, only the newest survives
    small = GraphStore(spark, str(tmp_path / "small"), schema,
                       snapshot_size_cap_bytes=1)
    tdir = small._table_dir("vertices", "v")
    for _ in range(3):
        small._write_snapshot(tdir, df)
    assert gens(str(tmp_path / "small")) == [2]
    # the surviving snapshot is readable and complete
    assert spark.read.parquet(small._latest_snapshot(tdir)).count() == 50


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


# ------------------------------------------------------- round-2 parity ops

def test_plural_rename_and_injectivity():
    s = base_schema()
    s2 = ev.RenameVerticesOp({"Person": "human", "city": "town"}).apply(s)
    assert set(s2.vertex_names) == {"human", "town"}
    assert (s2.edges[0].source, s2.edges[0].target) == ("human", "town")
    with pytest.raises(ValueError):
        ev.RenameVerticesOp({"Person": "x", "city": "x"}).apply(s)


def test_rename_relations_across_edges():
    s = base_schema()
    s.edges.append(Edge("city", "city", relation="livesIn"))
    s2 = ev.RenameRelationsOp({"livesIn": "residesIn"}).apply(s)
    assert {e.relation for e in s2.edges} == {"residesIn"}
    with pytest.raises(KeyError):
        ev.RenameRelationsOp({"nope": "x"}).apply(s)


def test_remove_edges_by_relation():
    s = base_schema()
    s.edges.append(Edge("city", "city", relation="twinnedWith"))
    s2 = ev.RemoveEdgesOp(["livesIn"]).apply(s)
    assert [e.relation for e in s2.edges] == ["twinnedWith"]
    with pytest.raises(KeyError):
        ev.RemoveEdgesOp(["nope"]).apply(s)


def test_plural_add_ops_validate_uniqueness():
    s = base_schema()
    with pytest.raises(ValueError):
        ev.AddVerticesOp([Vertex("a", [Field("x")]), Vertex("a", [Field("x")])]).apply(s)
    with pytest.raises(ValueError):
        ev.AddEdgesOp([Edge("Person", "city", relation="r"),
                       Edge("Person", "city", relation="r")]).apply(s)
    s2 = ev.AddVerticesOp([Vertex("a", [Field("x")], identity=["x"])]).apply(s)
    s3 = ev.AddEdgesOp([Edge("Person", "a", relation="r")]).apply(s2)
    assert any(e.relation == "r" for e in s3.edges)


def test_merge_edges_collapses_relations():
    s = base_schema()
    s.edges += [Edge("Person", "city", relation="residentOf",
                     properties=[Field("since", FieldType.INT)]),
                Edge("city", "city", relation="residentOf")]
    s2 = ev.MergeEdgesOp(["residentOf", "livesIn"], into="locatedIn").apply(s)
    rels = sorted((e.source, e.target, e.relation) for e in s2.edges)
    assert rels == [("Person", "city", "locatedIn"), ("city", "city", "locatedIn")]
    # colliding (Person, city) pair merged and kept the property union
    pc = [e for e in s2.edges if e.source == "Person"][0]
    assert "since" in [f.name for f in pc.properties]
    with pytest.raises(ValueError):
        ev.MergeEdgesOp(["a", "b"], into="a").apply(s)


def test_add_inverse_edges_directed_only():
    s = base_schema()
    s.edges.append(Edge("city", "city", relation="near", directed=False))
    s2 = ev.AddInverseEdgesOp({"livesIn": "homeOf"}).apply(s)
    inv = [e for e in s2.edges if e.relation == "homeOf"]
    assert [(e.source, e.target) for e in inv] == [("city", "Person")]
    # undirected relations are not duplicated
    with pytest.raises(KeyError):
        ev.AddInverseEdgesOp({"near": "nearInv"}).apply(s)
    # collision with an existing declaration raises
    s3 = ev.AddEdgeOp(Edge("city", "Person", relation="homeOf")).apply(s)
    with pytest.raises(ValueError):
        ev.AddInverseEdgesOp({"livesIn": "homeOf"}).apply(s3)


def test_set_edge_directed():
    s = base_schema()
    s2 = ev.SetEdgeDirectedOp([EdgeId("Person", "city", "livesIn")],
                              directed=False).apply(s)
    assert s2.edges[0].directed is False
    with pytest.raises(KeyError):
        ev.SetEdgeDirectedOp([EdgeId("a", "b", "c")], directed=True).apply(s)


def test_edge_property_ops():
    s = base_schema()
    s2 = ev.AddEdgePropertiesOp(
        {"livesIn": [Field("since", FieldType.INT), Field("verified")]}).apply(s)
    names = [f.name for f in s2.edges[0].properties]
    assert names == ["since", "verified"]
    with pytest.raises(ValueError):
        ev.AddEdgePropertiesOp({"livesIn": [Field("since")]}).apply(s2)

    s3 = ev.RenameEdgePropertiesOp({"livesIn": {"since": "from_year"}}).apply(s2)
    assert "from_year" in [f.name for f in s3.edges[0].properties]
    with pytest.raises(KeyError):
        ev.RenameEdgePropertiesOp({"livesIn": {"nope": "x"}}).apply(s2)

    s4 = ev.RemoveEdgePropertiesOp({"livesIn": ["verified"]}).apply(s3)
    assert [f.name for f in s4.edges[0].properties] == ["from_year"]
    # identity guard
    s5 = ev.ReplaceEdgeIdentitiesOp(
        {EdgeId("Person", "city", "livesIn"): ["from_year"]}).apply(s4)
    with pytest.raises(ValueError):
        ev.RemoveEdgePropertiesOp({"livesIn": ["from_year"]}).apply(s5)


def test_replace_edge_identities():
    s = base_schema()
    s2 = ev.AddEdgePropertiesOp({"livesIn": [Field("since", FieldType.INT)]}).apply(s)
    s3 = ev.ReplaceEdgeIdentitiesOp(
        {EdgeId("Person", "city", "livesIn"): ["since"]}).apply(s2)
    assert s3.edges[0].identities == ["since"]
    s4 = ev.ReplaceEdgeIdentitiesOp(
        {EdgeId("Person", "city", "livesIn"): []}).apply(s3)
    assert s4.edges[0].identities == []
    with pytest.raises(ValueError):
        ev.ReplaceEdgeIdentitiesOp(
            {EdgeId("Person", "city", "livesIn"): ["nope"]}).apply(s2)


def test_change_field_types():
    s = base_schema()
    s2 = ev.ChangeFieldTypesOp(
        vertices={"Person": {"fullName": (FieldType.STRING,)}}).apply(s)
    f = [f for f in s2.vertex("Person").fields if f.name == "fullName"][0]
    assert f.type is FieldType.STRING
    # clearing a type
    s3 = ev.ChangeFieldTypesOp(
        vertices={"Person": {"personId": (None,)}}).apply(s2)
    assert [f for f in s3.vertex("Person").fields if f.name == "personId"][0].type is None
    with pytest.raises(ValueError):
        ev.ChangeFieldTypesOp().apply(s)
    with pytest.raises(ValueError):
        ev.ChangeFieldTypesOp(
            vertices={"Person": {"fullName": (FieldType.LIST,)}}).apply(s)
    with pytest.raises(KeyError):
        ev.ChangeFieldTypesOp(vertices={"Person": {"nope": (None,)}}).apply(s)


def test_secondary_identity_ops():
    s = base_schema()
    s2 = ev.AddSecondaryIdentitiesOp(
        {"Person": {"by_name": ["fullName"]}}).apply(s)
    v = s2.vertex("Person")
    assert v.secondary_identities["by_name"] == ["fullName"]
    # derived non-unique lookup index appended
    assert any(i.fields == ("fullName",) and not i.unique for i in v.indexes)
    with pytest.raises(ValueError):
        ev.AddSecondaryIdentitiesOp({"Person": {"by_name": ["fullName"]}}).apply(s2)

    # removable by name or by field list; derived index goes with it
    s3 = ev.RemoveSecondaryIdentitiesOp({"Person": ["by_name"]}).apply(s2)
    assert not s3.vertex("Person").secondary_identities
    assert not s3.vertex("Person").indexes
    s4 = ev.RemoveSecondaryIdentitiesOp({"Person": [["fullName"]]}).apply(s2)
    assert not s4.vertex("Person").secondary_identities
    with pytest.raises(KeyError):
        ev.RemoveSecondaryIdentitiesOp({"Person": ["nope"]}).apply(s2)


def test_replace_identity_retire_policies():
    s = base_schema()
    # demote (default): old identity becomes a named secondary + lookup index
    s2 = ev.ReplaceIdentityOp("Person", ["fullName"]).apply(s)
    v = s2.vertex("Person")
    assert v.identity == ["fullName"]
    assert v.secondary_identities["retired_identity"] == ["personId"]
    assert any(i.fields == ("personId",) for i in v.indexes)

    # drop: old identity fields removed when nothing else uses them
    s3 = ev.ReplaceIdentityOp("Person", ["fullName"], retire="drop").apply(s)
    assert "personId" not in s3.vertex("Person").field_names

    # keep: fields stay as plain properties
    s4 = ev.ReplaceIdentityOp("Person", ["fullName"], retire="keep").apply(s)
    v4 = s4.vertex("Person")
    assert "personId" in v4.field_names and not v4.secondary_identities

    # funnel target resolves to hash mode
    from graflo_spark.manifest import IdentityMode
    s5 = ev.ReplaceIdentityOp(
        "Person", [], mode=IdentityMode.HASH,
        funnel=[["fullName"], ["personId"]], retire="keep").apply(s)
    v5 = s5.vertex("Person")
    assert v5.identity_mode is IdentityMode.HASH
    assert v5.identity_funnel == [["fullName"], ["personId"]]

    with pytest.raises(ValueError):
        ev.ReplaceIdentityOp("Person", ["fullName"], retire="nope").apply(s)
    with pytest.raises(ValueError):
        ev.ReplaceIdentityOp("Person", ["fullName"], retire="keep",
                             retire_as="x").apply(s)


def test_project_manifest_induced_prune():
    s = base_schema()
    s.vertices.append(Vertex("orphan", [Field("o_id")], identity=["o_id"]))
    s2 = ev.ProjectManifestOp(keep_vertices=["Person", "city", "orphan"]).apply(s)
    # orphan has no surviving incident edge -> induced prune drops it
    assert set(s2.vertex_names) == {"Person", "city"}
    assert len(s2.edges) == 1

    s3 = ev.ProjectManifestOp(
        keep_edges=[EdgeId("Person", "city", "livesIn")]).apply(s)
    assert {e.edge_id for e in s3.edges} == {EdgeId("Person", "city", "livesIn")}

    with pytest.raises(ValueError):
        ev.ProjectManifestOp().apply(s)
    with pytest.raises(ValueError):
        ev.ProjectManifestOp(keep_vertices=["nope"]).apply(s)
    # strict=False tolerates unknown selectors
    s4 = ev.ProjectManifestOp(keep_vertices=["Person", "city", "nope"],
                              strict=False).apply(s)
    assert set(s4.vertex_names) == {"Person", "city"}


def test_rename_resources_on_manifest():
    from graflo_spark.manifest import GraphManifest
    from graflo_spark.steps import ResourceConfig, VertexStep

    m = GraphManifest(schema=base_schema(), resources=[
        ResourceConfig("people", steps=[VertexStep(name="Person")]),
        ResourceConfig("cities", steps=[VertexStep(name="city")]),
    ])
    op = ev.RenameResourcesOp({"people": "persons"})
    m2 = op.apply_manifest(m)
    assert {r.name for r in m2.resources} == {"persons", "cities"}
    assert {r.name for r in m.resources} == {"people", "cities"}  # pure
    with pytest.raises(KeyError):
        ev.RenameResourcesOp({"nope": "x"}).apply_manifest(m)
    with pytest.raises(ValueError):
        ev.RenameResourcesOp({"people": "cities"}).apply_manifest(m)


def test_ops_reaching_ingestion():
    ops = [ev.RenameVerticesOp({"Person": "human"}),
           ev.AddEdgePropertiesOp({"livesIn": [Field("x")]}),
           ev.MergeEdgesOp(["a"], into="b")]
    assert ev.ops_reaching_ingestion(ops) == ["RenameVerticesOp", "MergeEdgesOp"]


def test_inverse_and_merge_edges_migrate_store(spark, tables, tmp_path):
    schema = CoreSchema(
        vertices=[
            Vertex("customer", [Field("c_custkey", FieldType.INT)],
                   identity=["c_custkey"]),
            Vertex("nation", [Field("n_nationkey", FieldType.INT)],
                   identity=["n_nationkey"]),
        ],
        edges=[Edge("customer", "nation", relation="located_in",
                    properties=[Field("w", FieldType.INT)]),
               Edge("customer", "nation", relation="registered_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    edges = tables["customer"].select(
        F.col("c_custkey").alias("_src_c_custkey"),
        F.col("c_nationkey").alias("_dst_n_nationkey"),
        F.lit(1).alias("w"),
    )
    store.insert_edges(EdgeId("customer", "nation", "located_in"), edges)
    store.insert_edges(EdgeId("customer", "nation", "registered_in"),
                       edges.drop("w").limit(40))
    n_located = store.read_edges(EdgeId("customer", "nation", "located_in")).count()

    # inverse: swapped endpoint prefixes, same rows
    plan = [ev.AddInverseEdgesOp({"located_in": "home_of"})]
    schema2 = ev.apply_plan(schema, plan, store=store)
    inv = store.read_edges(EdgeId("nation", "customer", "home_of"))
    assert inv.count() == n_located
    assert "_src_n_nationkey" in inv.columns and "_dst_c_custkey" in inv.columns
    assert "w" in inv.columns

    # merge: registered_in folds into located_in's table, deduped
    plan2 = [ev.MergeEdgesOp(["registered_in"], into="located_in")]
    schema3 = ev.apply_plan(schema2, plan2, store=store)
    merged = store.read_edges(EdgeId("customer", "nation", "located_in"))
    # registered rows carry w=NULL so they don't collide with located rows
    assert merged.count() == n_located + 40
    import os
    assert not os.path.isdir(
        store._table_dir("edges", "customer__registered_in__nation"))


def test_change_field_types_migrates_store(spark, tables, tmp_path):
    schema = CoreSchema(
        vertices=[Vertex("customer",
                         [Field("c_custkey", FieldType.INT), Field("c_acctbal")],
                         identity=["c_custkey"])],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices(
        "customer",
        tables["customer"].select(
            "c_custkey", F.col("c_acctbal").cast("string").alias("c_acctbal")),
    )
    plan = [ev.ChangeFieldTypesOp(
        vertices={"customer": {"c_acctbal": (FieldType.DOUBLE,)}})]
    ev.apply_plan(schema, plan, store=store)
    out = store.read_vertices("customer")
    assert dict(out.dtypes)["c_acctbal"] == "double"


def test_retarget_edges_migrates_store_shared_key_space(spark, tables, tmp_path):
    """RetargetEdgesOp.migrate physically re-addresses the edge dirs, so
    pre-retarget edge rows remain addressable at the NEW EdgeId (r11
    review finding #4: apply() changed the schema but left the data
    orphaned under the old dir name)."""
    schema = CoreSchema(
        vertices=[
            Vertex("customer", [Field("c_custkey", FieldType.INT)],
                   identity=["c_custkey"]),
            Vertex("buyer", [Field("c_custkey", FieldType.INT)],
                   identity=["c_custkey"]),
            Vertex("nation", [Field("n_nationkey", FieldType.INT)],
                   identity=["n_nationkey"]),
        ],
        edges=[Edge("customer", "nation", relation="located_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    edges = tables["customer"].select(
        F.col("c_custkey").alias("_src_c_custkey"),
        F.col("c_nationkey").alias("_dst_n_nationkey"),
    )
    store.insert_edges(EdgeId("customer", "nation", "located_in"), edges)
    n = store.read_edges(EdgeId("customer", "nation", "located_in")).count()

    ev.apply_plan(
        schema, [ev.RetargetEdgesOp("customer", "buyer")], store=store)
    out = store.read_edges(EdgeId("buyer", "nation", "located_in"))
    assert out.count() == n
    assert "_src_c_custkey" in out.columns
    import os
    assert not os.path.isdir(
        store._table_dir("edges", "customer__located_in__nation"))


def test_retarget_edges_migrates_store_key_mapping(spark, tmp_path):
    """Different key spaces: endpoint keys remap through the mapping
    frame (inner join — unmapped keys are dangling and dropped), and the
    key columns are renamed to the new vertex's identity fields."""
    schema = CoreSchema(
        vertices=[
            Vertex("city", [Field("city_id", FieldType.INT)],
                   identity=["city_id"]),
            Vertex("metro", [Field("metro_code")], identity=["metro_code"]),
            Vertex("person", [Field("pid", FieldType.INT)],
                   identity=["pid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.insert_edges(
        EdgeId("person", "city", "lives_in"),
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "_src_pid int, _dst_city_id int"),
    )
    mapping = spark.createDataFrame(
        [(10, "NYC"), (20, "SFO")], "old_city_id int, new_metro_code string")

    # without a mapping, mismatched key fields must raise, not orphan
    store2 = GraphStore(spark, str(tmp_path / "g2"), schema)
    store2.apply_target_schema()
    store2.insert_edges(
        EdgeId("person", "city", "lives_in"),
        spark.createDataFrame([(1, 10)], "_src_pid int, _dst_city_id int"),
    )
    with pytest.raises(ValueError, match="key_mapping"):
        ev.apply_plan(
            schema, [ev.RetargetEdgesOp("city", "metro")], store=store2)

    ev.apply_plan(
        schema,
        [ev.RetargetEdgesOp("city", "metro", key_mapping=mapping)],
        store=store)
    out = store.read_edges(EdgeId("person", "metro", "lives_in"))
    got = sorted((r["_src_pid"], r["_dst_metro_code"]) for r in out.collect())
    assert got == [(1, "NYC"), (2, "SFO")]  # city 30 unmapped -> dropped


def test_merge_vertices_migrate_keeps_relation_segment(spark, tmp_path):
    """An edge whose RELATION name coincides with the merged-away vertex
    name keeps its relation id — only endpoint segments are re-addressed
    (advisor finding on MergeVerticesOp.migrate)."""
    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT)], identity=["pid"]),
            Vertex("org", [Field("oid", FieldType.INT)], identity=["oid"]),
            Vertex("employer", [Field("oid", FieldType.INT)],
                   identity=["oid"]),
        ],
        # relation literally named 'employer', same as the merged vertex
        edges=[Edge("person", "employer", relation="employer")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.insert_edges(
        EdgeId("person", "employer", "employer"),
        spark.createDataFrame([(1, 10)], "_src_pid int, _dst_oid int"),
    )
    ev.apply_plan(
        schema, [ev.MergeVerticesOp(into="org", other="employer")],
        store=store)
    import os
    assert os.path.isdir(store._table_dir("edges", "person__employer__org"))
    assert not os.path.isdir(store._table_dir("edges", "person__org__org"))
    assert store.read_edges(EdgeId("person", "org", "employer")).count() == 1


# ---------------------------------------------------- diff convergence (r12)

def _canon(s: CoreSchema):
    """Order-insensitive semantic form: diff() normalizes renames and
    payload changes to remove+add, which can only reorder SIBLING list
    entries (fields/edges/indexes append at the end) — identity, funnel
    order, and every declared property survive exactly."""
    def fld(fs):
        return tuple(sorted((f.name, f.type, f.item_type) for f in fs))

    return (
        tuple(sorted(
            (v.name, fld(v.fields), tuple(v.identity), v.identity_mode,
             tuple(map(tuple, v.identity_funnel)),
             tuple(sorted((k, tuple(c))
                          for k, c in v.secondary_identities.items())),
             tuple(sorted((tuple(i.fields), i.type, i.unique, i.sparse)
                          for i in v.indexes)))
            for v in s.vertices)),
        tuple(sorted(
            (e.source, e.target, e.relation, e.directed, e.type,
             fld(e.properties), tuple(e.identities))
            for e in s.edges)),
    )


def _random_op(rng, s: CoreSchema, fresh):
    """One random VALID evolution op against schema ``s`` (or None when
    the drawn kind has no valid move). ``fresh`` mints unique names."""
    from graflo_spark.manifest import FieldType, IndexConfig, IndexType

    names = list(s.vertex_names)
    kinds = ["add_v", "rm_v", "add_p", "rm_p", "type", "ident", "funnel",
             "sec_add", "sec_rm", "idx_add", "idx_rm", "e_add", "e_rm",
             "e_prop"]
    kind = rng.choice(kinds)
    types = [FieldType.INT, FieldType.STRING, FieldType.DOUBLE, FieldType.BOOL]
    if kind == "add_v":
        n = fresh("v")
        flds = [Field(fresh("f"), rng.choice(types)) for _ in range(rng.randint(1, 3))]
        return ev.AddVertexOp(Vertex(
            n, flds, identity=[f.name for f in flds[:rng.randint(1, len(flds))]]))
    if not names:
        return None
    v = s.vertex(rng.choice(names))
    protected = set(v.identity) | {c for b in v.identity_funnel for c in b}
    for cols in v.secondary_identities.values():
        protected |= set(cols)
    for i in v.indexes:
        protected |= set(i.fields)
    if kind == "rm_v":
        return ev.RemoveVertexOp(v.name)
    if kind == "add_p":
        return ev.AddPropertyOp(v.name, Field(fresh("f"), rng.choice(types)))
    if kind == "rm_p":
        cand = [f.name for f in v.fields if f.name not in protected]
        return ev.RemovePropertyOp(v.name, rng.choice(cand)) if cand else None
    if kind == "type":
        if not v.fields:
            return None
        f = rng.choice(v.fields)
        other = [t for t in types if t != f.type]
        return ev.ChangeFieldTypesOp(
            vertices={v.name: {f.name: (rng.choice(other),)}})
    if kind == "ident":
        if not v.fields:
            return None
        k = rng.randint(1, min(2, len(v.fields)))
        ident = [f.name for f in rng.sample(v.fields, k)]
        retire = rng.choice(["demote", "keep", "drop"])
        kw = {}
        if retire == "demote":
            kw["retire_as"] = fresh("ret")
        return ev.ReplaceIdentityOp(v.name, ident, retire=retire, **kw)
    if kind == "funnel":
        if len(v.fields) < 2:
            return None
        br = [[f.name] for f in rng.sample(v.fields, 2)]
        return ev.ReplaceIdentityOp(
            v.name, [], mode=ev.IdentityMode.HASH, funnel=br, retire="keep")
    if kind == "sec_add":
        if not v.fields:
            return None
        cols = [f.name for f in rng.sample(
            v.fields, rng.randint(1, min(2, len(v.fields))))]
        return ev.AddSecondaryIdentitiesOp({v.name: {fresh("sk"): cols}})
    if kind == "sec_rm":
        if not v.secondary_identities:
            return None
        return ev.RemoveSecondaryIdentitiesOp(
            {v.name: [rng.choice(sorted(v.secondary_identities))]})
    if kind == "idx_add":
        if not v.fields:
            return None
        cols = tuple(f.name for f in rng.sample(
            v.fields, rng.randint(1, min(2, len(v.fields)))))
        if any(i.fields == cols and i.type == IndexType.PERSISTENT
               for i in v.indexes):
            return None
        return ev.AddIndexOp(
            vertex=v.name, index=IndexConfig(cols, unique=rng.random() < 0.3))
    if kind == "idx_rm":
        if not v.indexes:
            return None
        return ev.RemoveIndexOp(
            vertex=v.name, fields=tuple(rng.choice(v.indexes).fields))
    if kind == "e_add":
        src, tgt = rng.choice(names), rng.choice(names)
        return ev.AddEdgeOp(Edge(src, tgt, relation=fresh("rel"),
                                 directed=rng.random() < 0.8))
    if kind == "e_rm":
        if not s.edges:
            return None
        return ev.RemoveEdgeOp(rng.choice(s.edges).edge_id)
    if kind == "e_prop":
        with_rel = [e for e in s.edges if e.relation]
        if not with_rel:
            return None
        e = rng.choice(with_rel)
        return ev.AddEdgePropertiesOp(
            {e.relation: [Field(fresh("ep"), rng.choice(types))]})
    return None


def test_diff_converges_over_random_op_chains():
    """The r12 convergence property (VERDICT r11 #1 + #6): for any target
    reachable by a random valid op chain — including identity swaps with
    column removals, the exact shape whose pre-fix diff raised 'cannot
    remove identity column', and demoting replacements whose secondary +
    index artifacts a demoting diff could never reproduce —
    ``apply_plan(old, diff(old, new))`` is semantically equal to ``new``.
    200+ randomized chains, seeded (deterministic). The same generator
    ran offline at 12,000 seeds with chains up to 12 ops (r12): the
    three failures it surfaced — dangling index after retire='drop',
    index-cascade duplicate collision, and the original ordering defect
    — are fixed and the full sweep is zero-failure."""
    import random

    counter = [0]

    def fresh(p):
        counter[0] += 1
        return f"{p}{counter[0]}"

    n_checked = 0
    for seed in range(220):
        rng = random.Random(seed)
        old = base_schema()
        new = old
        for _ in range(rng.randint(1, 8)):
            op = _random_op(rng, new, fresh)
            if op is None:
                continue
            new = op.apply(new)
        plan = ev.diff(old, new)
        replayed = ev.apply_plan(old, plan)
        assert _canon(replayed) == _canon(new), (
            f"seed {seed}: diff did not converge\nplan={plan}")
        n_checked += 1
    assert n_checked >= 200


def test_diff_identity_swap_with_column_swap_converges():
    """The builder's r11 reproduction, pinned exactly: identity changes
    from old_id -> new_col while old_id is dropped. Pre-fix diff emitted
    RemovePropertyOp(old_id) BEFORE ReplaceIdentityOp (apply raised
    'cannot remove identity column'), and its retire='demote' added a
    retired_identity secondary + index absent from the target."""
    old = CoreSchema(vertices=[
        Vertex("user", [Field("old_id", FieldType.INT), Field("name")],
               identity=["old_id"]),
    ])
    new = CoreSchema(vertices=[
        Vertex("user", [Field("name"), Field("email")], identity=["email"]),
    ])
    plan = ev.diff(old, new)
    replayed = ev.apply_plan(old, plan)
    v = replayed.vertex("user")
    assert v.identity == ["email"]
    assert v.field_names == ["name", "email"]
    assert v.secondary_identities == {}
    assert v.indexes == []
    from graflo_spark.migrate import schema_hash
    assert schema_hash(replayed) == schema_hash(new)


def test_rename_relations_chained_map(spark, tmp_path):
    """{r1: r2, r2: r3} is a valid SIMULTANEOUS rename — r1's target name
    is being vacated by the same op (review finding: the incremental
    check falsely raised 'already declared' against the not-yet-renamed
    r2 edge). Each edge maps once from its ORIGINAL relation; the dir
    migration is two-phase so r1->r2 can't clobber the dir r2 vacates."""
    schema = CoreSchema(
        vertices=[
            Vertex("a", [Field("id", FieldType.INT)], identity=["id"]),
            Vertex("b", [Field("id", FieldType.INT)], identity=["id"]),
        ],
        edges=[Edge("a", "b", relation="r1"), Edge("a", "b", relation="r2")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.insert_edges(
        EdgeId("a", "b", "r1"),
        spark.createDataFrame([(1, 10)], "_src_id int, _dst_id int"))
    store.insert_edges(
        EdgeId("a", "b", "r2"),
        spark.createDataFrame([(2, 20), (3, 30)], "_src_id int, _dst_id int"))

    s2 = ev.apply_plan(
        schema, [ev.RenameRelationsOp({"r1": "r2", "r2": "r3"})], store=store)
    assert sorted(e.relation for e in s2.edges) == ["r2", "r3"]
    assert store.read_edges(EdgeId("a", "b", "r2")).count() == 1   # was r1
    assert store.read_edges(EdgeId("a", "b", "r3")).count() == 2   # was r2

    # a swap cycle is simultaneous too
    s3 = ev.apply_plan(s2, [ev.RenameRelationsOp({"r2": "r3", "r3": "r2"})],
                       store=store)
    assert sorted(e.relation for e in s3.edges) == ["r2", "r3"]
    assert store.read_edges(EdgeId("a", "b", "r3")).count() == 1
    assert store.read_edges(EdgeId("a", "b", "r2")).count() == 2

    # a genuine collision (target exists and is NOT vacated) still raises
    with pytest.raises(ValueError, match="already declared"):
        ev.RenameRelationsOp({"r2": "r3"}).apply(s3)


def test_sanitize_covers_edge_payload_and_indexes():
    """SanitizeOp previously skipped edge properties/identities and
    IndexConfig.fields (review finding), desynchronizing them from the
    sanitized column names."""
    from graflo_spark.manifest import IndexConfig

    s = CoreSchema(
        vertices=[Vertex(
            "UserAccount", [Field("userId", FieldType.INT), Field("fullName")],
            identity=["userId"],
            indexes=[IndexConfig(("fullName",), unique=True)],
        )],
        edges=[Edge(
            "UserAccount", "UserAccount", relation="knowsWell",
            properties=[Field("sinceYear", FieldType.INT)],
            identities=["sinceYear"],
            indexes=[IndexConfig(("sinceYear",))],
        )],
    )
    out = ev.SanitizeOp().apply(s)
    v = out.vertex("user_account")
    assert v.indexes[0].fields == ("full_name",) and v.indexes[0].unique
    e = out.edges[0]
    assert e.relation == "knows_well"
    assert e.property_names == ["since_year"]
    assert e.identities == ["since_year"]
    assert e.indexes[0].fields == ("since_year",)


def test_add_index_verifies_unique_on_edges(spark, tmp_path):
    """AddIndexOp.migrate enforced `unique` only on the vertex path
    (review finding); a violated unique EDGE index must raise too."""
    from graflo_spark.manifest import IndexConfig

    schema = CoreSchema(
        vertices=[
            Vertex("a", [Field("id", FieldType.INT)], identity=["id"]),
            Vertex("b", [Field("id", FieldType.INT)], identity=["id"]),
        ],
        edges=[Edge("a", "b", relation="r",
                    properties=[Field("w", FieldType.INT)])],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.insert_edges(
        EdgeId("a", "b", "r"),
        spark.createDataFrame(
            [(1, 10, 5), (1, 11, 5), (2, 20, 7)],
            "_src_id int, _dst_id int, w int"))
    with pytest.raises(ValueError, match="unique index.*violated"):
        ev.apply_plan(schema, [ev.AddIndexOp(
            edge_id=EdgeId("a", "b", "r"),
            index=IndexConfig(("w",), unique=True))], store=store)
    # a satisfied unique edge index is accepted
    ev.apply_plan(schema, [ev.AddIndexOp(
        edge_id=EdgeId("a", "b", "r"),
        index=IndexConfig(("_dst_id",), unique=True))], store=store)


def test_diff_edge_payload_change_is_in_place_not_remove_add(spark, tmp_path):
    """A same-id edge whose payload changed must diff to IN-PLACE ops
    (add/remove/retype properties, replace identities, set directed),
    never remove+add: RemoveEdgeOp.migrate deletes the physical edge
    table, so a remove+add plan applied against a store destroys data
    for what is semantically a tweak. Verified end-to-end: the edge
    rows survive the migration."""
    schema = CoreSchema(
        vertices=[
            Vertex("a", [Field("id", FieldType.INT)], identity=["id"]),
            Vertex("b", [Field("id", FieldType.INT)], identity=["id"]),
        ],
        edges=[Edge("a", "b", relation="r",
                    properties=[Field("w", FieldType.INT)])],
    )
    new = CoreSchema(
        vertices=[
            Vertex("a", [Field("id", FieldType.INT)], identity=["id"]),
            Vertex("b", [Field("id", FieldType.INT)], identity=["id"]),
        ],
        edges=[Edge("a", "b", relation="r", directed=False,
                    properties=[Field("w", FieldType.DOUBLE),
                                Field("note")])],
    )
    plan = ev.diff(schema, new)
    assert not any(isinstance(op, ev.RemoveEdgeOp) for op in plan)

    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.insert_edges(
        EdgeId("a", "b", "r"),
        spark.createDataFrame([(1, 10, 5), (2, 20, 7)],
                              "_src_id int, _dst_id int, w int"))
    replayed = ev.apply_plan(schema, plan, store=store)
    from graflo_spark.migrate import schema_hash
    assert schema_hash(replayed) == schema_hash(new)
    out = store.read_edges(EdgeId("a", "b", "r"))
    assert out.count() == 2                      # data survived
    assert dict(out.dtypes)["w"] == "double"     # and was retyped


def test_random_op_chains_keep_store_physically_consistent(spark, tmp_path):
    """Data-plane twin of the diff-convergence property: random valid op
    chains applied against a POPULATED store must leave, after EVERY step:

    1. physical layout consistent with the schema — no orphan table dirs
       (the r11 retarget/merge/remove bug class), no unreadable declared
       tables, natural-identity columns present in surviving vertex tables;
    2. schema-internal integrity — identity / funnel / secondary / index
       fields all declared on their vertex, edge identities and index
       fields among edge properties (the stale-index class: a rename or
       removal that forgets to cascade into index metadata);
    3. referential integrity, FUNNEL-AWARE since r14 — every edge row's
       per-row winning identity space (the driver-side mirror of
       ``query._funnel_key``: first of primary + declared secondaries
       whose key columns carry data) must resolve against the vertex
       rows' winning addresses, and any row addressed through a
       NON-primary space (NULL-keyed after a differently-keyed merge,
       old-keyed after a skipped re-key) requires that ``migrate()``
       WARNED — the silent-NULL-key class (r13 verdict Next #1) is an
       invariant violation;
    4. operational probe (r13 verdict Next #2) — a real ``fetch_edges``
       against the mutated store after EVERY step and a 1-hop BFS at
       chain end, because all three r13 fuzz finds lived in the
       compiler-vs-data-plane addressing seam that static column checks
       only half-encode.

    The op pool covers every evolution op with data-plane consequences —
    all of §2.12's 33 concrete ops except RenameResourcesOp, which
    rewrites GraphManifest.resources (ingestion bindings) and by design
    touches neither CoreSchema nor the store (its apply() is the identity
    on schemas); it is covered by its own unit tests instead.

    Depth knobs for the offline sweep (REVIEW_NOTES_r13 ledger):
    SPARK_GRAFT_FUZZ_SEEDS (default 8), SPARK_GRAFT_FUZZ_OPS (default 6),
    SPARK_GRAFT_FUZZ_BASE (first seed, default 1000)."""
    import os
    import random

    from graflo_spark.manifest import IndexConfig

    def _spaces(v):
        # the identity funnel query._funnel_key compiles against: primary
        # space "" first, then declared secondaries in declaration order
        return [("", list(v.identity_fields))] + [
            (n, list(c)) for n, c in v.secondary_identities.items()]

    def _winning(row, spaces, prefix):
        # driver-side mirror of query._funnel_key's per-row winner: the
        # FIRST space whose columns carry any non-null value. None = every
        # space all-NULL (the degenerate concat_ws fallback address).
        for name, cols in spaces:
            vals = [row[f"{prefix}{c}"] for c in cols]
            if any(x is not None for x in vals):
                return (name, tuple("\x00null" if x is None else str(x)
                                    for x in vals))
        return None

    def _degraded(warned):
        # every engineered degradation path warns with one of these
        # markers; a NULL-primary-keyed or old-keyed edge row without a
        # prior warning is the SILENT degradation class the r13 verdict
        # ordered this invariant to kill
        return any("addressab" in m or "carry no data" in m or "NULL" in m
                   for m in warned)

    def consistent(store, schema, warned):
        # -- 1. physical layout ⇄ schema
        vdir = os.path.join(store.root, "vertices")
        if os.path.isdir(vdir):
            for d in os.listdir(vdir):
                if not d.startswith("."):
                    assert d in schema.vertex_names, f"orphan vertex dir {d}"
        declared = {e.edge_id.table_name() for e in schema.edges}
        edir = os.path.join(store.root, "edges")
        if os.path.isdir(edir):
            for d in os.listdir(edir):
                if not d.startswith("."):
                    assert d in declared, f"orphan edge dir {d}"
        # -- 2. schema-internal integrity
        for v in schema.vertices:
            have = set(v.field_names)
            for c in v.identity:
                assert c in have, f"{v.name}: identity {c} undeclared"
            for b in v.identity_funnel:
                for c in b:
                    assert c in have, f"{v.name}: funnel col {c} undeclared"
            for k, cols in v.secondary_identities.items():
                for c in cols:
                    assert c in have, f"{v.name}.{k}: secondary {c} undeclared"
            for i in v.indexes:
                for c in i.fields:
                    assert c in have, f"{v.name}: index field {c} undeclared"
        for e in schema.edges:
            assert e.source in schema.vertex_names, f"{e.edge_id}: source"
            assert e.target in schema.vertex_names, f"{e.edge_id}: target"
            props = {f.name for f in e.properties}
            for c in e.identities:
                assert c in props, f"{e.edge_id}: identity {c} undeclared"
            idx_ok = set(props)
            for side, endpoint in (("_src_", e.source), ("_dst_", e.target)):
                idx_ok |= {f"{side}{f}"
                           for f in schema.vertex(endpoint).identity_fields}
            for i in e.indexes:
                for c in i.fields:
                    assert c in idx_ok, (
                        f"{e.edge_id}: index field {c} undeclared")
        # -- vertex tables readable, identity columns present
        vframes = {}
        for vn in schema.vertex_names:
            try:
                df = store.read_vertices(vn)
            except FileNotFoundError:
                continue
            vframes[vn] = df
            v = schema.vertex(vn)
            if v.identity_mode.value == "natural":
                for c in v.identity:
                    assert c in df.columns, f"{vn} missing identity {c}"
        # -- 3. referential integrity per edge table, FUNNEL-AWARE (r14):
        # an edge row addresses each endpoint through its per-row winning
        # identity space (query._funnel_key), and the query layer resolves
        # that address against any vertex row CARRYING that key in that
        # space (query._with_canon's per-space lookup — the vertex's own
        # winner may be a higher space; r14 fuzz seed 1201). So the mirror
        # here exposes every (space, key) a vertex row carries data for,
        # and the edge row's winning address must appear among them. A row
        # addressed through a NON-primary space (NULL-keyed after a
        # differently-keyed merge, or old-keyed after a skipped re-key)
        # is allowed ONLY if migrate() warned about the degradation —
        # the silent-NULL-key class may not reappear.
        vaddr = {}  # vertex -> set of carried (space, key) addresses (lazy)
        vnull = {}  # vertex -> has an all-spaces-NULL (degenerate) row
        for e in schema.edges:
            try:
                edf = store.read_edges(e.edge_id)
            except FileNotFoundError:
                continue
            ecols = set(edf.columns)
            erows = None
            for side, vname in (("_src_", e.source), ("_dst_", e.target)):
                v = schema.vertex(vname)
                if v.identity_mode.value != "natural" or vname not in vframes:
                    continue
                e_spaces = [
                    (n, c) for n, c in _spaces(v)
                    if c and all(f"{side}{f}" in ecols for f in c)]
                if not e_spaces:
                    assert _degraded(warned), (
                        f"{e.edge_id} {side}: edge table carries NO complete "
                        f"identity key column set for {vname} (has "
                        f"{sorted(ecols)}) and no degradation warning fired")
                    continue
                if vname not in vaddr:
                    vdf = vframes[vname]
                    vcols = set(vdf.columns)
                    v_spaces = [(n, c) for n, c in _spaces(v)
                                if c and all(f in vcols for f in c)]
                    addrs, has_null = set(), False
                    for r in vdf.collect():
                        carried = False
                        for n, c in v_spaces:
                            vals = [r[f] for f in c]
                            if any(x is not None for x in vals):
                                carried = True
                                addrs.add((n, tuple(
                                    "\x00null" if x is None else str(x)
                                    for x in vals)))
                        if not carried:
                            has_null = True
                    vaddr[vname], vnull[vname] = addrs, has_null
                if erows is None:
                    erows = edf.collect()
                for r in erows:
                    w = _winning(r, e_spaces, side)
                    if w is None:
                        # all-spaces-NULL endpoint: the degenerate
                        # fallback address — never silent
                        assert _degraded(warned) and vnull[vname], (
                            f"{e.edge_id} {side}: all-NULL endpoint "
                            f"address with no warning / no matching "
                            f"degenerate vertex row")
                        continue
                    if w[0] != "":
                        assert _degraded(warned), (
                            f"{e.edge_id} {side}: row addressed through "
                            f"secondary space {w[0]!r} but no degradation "
                            f"warning fired (silent NULL/old-keyed edge)")
                    assert w in vaddr[vname], (
                        f"{e.edge_id} {side}: endpoint address {w} "
                        f"unresolvable against {vname} (vertex addresses: "
                        f"{sorted(vaddr[vname])[:6]})")

    def rand_op(rng, s, fresh):
        kind = rng.choice([
            "add_v", "clone_v", "add_vs", "add_p", "rm_p", "rename_p",
            "type", "ident", "rename_v", "rename_vs", "rename_rel",
            "rename_er", "merge_v", "add_e", "add_es", "rm_e", "rm_es",
            "rm_v", "idx", "rm_idx", "idx_e", "add_sid", "rm_sid",
            "sanitize", "project", "inverse", "retarget", "merge_e",
            "set_dir", "add_ep", "rm_ep", "rename_ep", "ident_e",
            "compose"])
        names = list(s.vertex_names)
        if kind == "sanitize":
            return ev.SanitizeOp()
        if kind == "project":
            if len(names) < 2:
                return None
            keep = rng.sample(names, rng.randint(1, len(names) - 1))
            return ev.ProjectManifestOp(keep_vertices=keep, strict=False)
        if kind == "inverse":
            cand = [e for e in s.edges if e.relation and e.directed]
            if not cand:
                return None
            e = rng.choice(cand)
            return ev.AddInverseEdgesOp({e.relation: fresh("inv")})
        if kind == "add_v":
            # mixedCase half the time so SanitizeOp has real work
            n = fresh("V") if rng.random() < 0.5 else fresh("v")
            return ev.AddVertexOp(Vertex(
                n, [Field(f"{n}_id", FieldType.INT), Field(f"{n}_x")],
                identity=[f"{n}_id"]))
        if kind == "add_vs":
            vs = []
            for _ in range(2):
                n = fresh("v")
                vs.append(Vertex(n, [Field(f"{n}_id", FieldType.INT)],
                                 identity=[f"{n}_id"]))
            return ev.AddVerticesOp(vs)
        if kind == "compose":
            n = fresh("cx")
            other = CoreSchema(
                vertices=[Vertex(n, [Field(f"{n}_id", FieldType.INT)],
                                 identity=[f"{n}_id"])],
                edges=[Edge(n, n, relation=fresh("rel"))])
            return ev.ComposeManifestsOp(other=other)
        if not names:
            return None
        v = s.vertex(rng.choice(names))
        if kind == "clone_v":
            # same identity FIELD NAMES as an existing vertex -> makes
            # shared-key-space RetargetEdgesOp reachable downstream
            if v.identity_mode.value != "natural" or not v.identity:
                return None
            fields = [Field(f.name, f.type, f.item_type)
                      for f in v.fields if f.name in set(v.identity)]
            return ev.AddVertexOp(Vertex(
                fresh("tw"), fields, identity=list(v.identity)))
        if kind == "retarget":
            # shared key space: identity field names must match by name
            # (RetargetEdgesOp key_mapping=None contract)
            olds = [vn for vn in names
                    if any(vn in (e.source, e.target) for e in s.edges)]
            rng.shuffle(olds)
            for on in olds:
                ov = s.vertex(on)
                if ov.identity_mode.value != "natural":
                    continue
                cands = [
                    vn for vn in names if vn != on
                    and s.vertex(vn).identity_mode.value == "natural"
                    and sorted(s.vertex(vn).identity) == sorted(ov.identity)]
                if cands:
                    return ev.RetargetEdgesOp(
                        old_vertex=on, new_vertex=rng.choice(cands))
            return None
        protected = set(v.identity) | {
            c for b in v.identity_funnel for c in b}
        for cols in v.secondary_identities.values():
            protected |= set(cols)
        for i in v.indexes:
            protected |= set(i.fields)
        if kind == "add_p":
            return ev.AddPropertyOp(v.name, Field(fresh("f"), FieldType.STRING))
        if kind == "rm_p":
            cand = [f.name for f in v.fields if f.name not in protected]
            return ev.RemovePropertyOp(v.name, rng.choice(cand)) if cand else None
        if kind == "rename_p":
            if not v.fields:
                return None
            # any field INCLUDING identity fields: renaming an identity
            # column must cascade into edge endpoint key columns
            return ev.RenamePropertyOp(
                v.name, rng.choice(v.fields).name, fresh("f"))
        if kind == "type":
            cand = [f for f in v.fields if f.name not in set(v.identity)]
            if not cand:
                return None
            f = rng.choice(cand)
            t = rng.choice([x for x in (FieldType.STRING, FieldType.DOUBLE,
                                        FieldType.INT) if x != f.type])
            return ev.ChangeFieldTypesOp(vertices={v.name: {f.name: (t,)}})
        if kind == "ident":
            if not v.fields:
                return None
            ident = [rng.choice(v.fields).name]
            retire = rng.choice(["keep", "demote", "drop"])
            kw = {"retire_as": fresh("sid")} if retire == "demote" else {}
            return ev.ReplaceIdentityOp(v.name, ident, retire=retire, **kw)
        if kind == "rename_v":
            return ev.RenameVertexOp(v.name, fresh("v"))
        if kind == "rename_vs":
            picks = rng.sample(names, min(len(names), rng.randint(1, 2)))
            return ev.RenameVerticesOp({n: fresh("v") for n in picks})
        if kind == "rename_rel":
            rels = [e.relation for e in s.edges if e.relation]
            if not rels:
                return None
            return ev.RenameRelationsOp({rng.choice(rels): fresh("rel")})
        if kind == "rename_er":
            if not s.edges:
                return None
            return ev.RenameEdgeRelationOp(
                rng.choice(s.edges).edge_id, fresh("rel"))
        if kind == "merge_v":
            if len(names) < 2:
                return None
            a, b = rng.sample(names, 2)
            return ev.MergeVerticesOp(into=a, other=b)
        if kind == "add_e":
            src, tgt = rng.choice(names), rng.choice(names)
            return ev.AddEdgeOp(Edge(src, tgt, relation=fresh("rel")))
        if kind == "add_es":
            src, tgt = rng.choice(names), rng.choice(names)
            return ev.AddEdgesOp([Edge(src, tgt, relation=fresh("rel"))])
        if kind == "rm_e":
            if not s.edges:
                return None
            return ev.RemoveEdgeOp(rng.choice(s.edges).edge_id)
        if kind == "rm_es":
            rels = [e.relation for e in s.edges if e.relation]
            if not rels:
                return None
            return ev.RemoveEdgesOp(relations=[rng.choice(rels)])
        if kind == "rm_v":
            return ev.RemoveVertexOp(v.name)
        if kind == "idx":
            cand = [f.name for f in v.fields]
            if not cand:
                return None
            fields = (rng.choice(cand),)
            if any(i.fields == fields for i in v.indexes):
                return None
            return ev.AddIndexOp(vertex=v.name, index=IndexConfig(fields))
        if kind == "rm_idx":
            if not v.indexes:
                return None
            return ev.RemoveIndexOp(
                vertex=v.name, fields=rng.choice(v.indexes).fields)
        if kind == "idx_e":
            cand = [e for e in s.edges if e.properties]
            if not cand:
                return None
            e = rng.choice(cand)
            fields = (rng.choice(e.properties).name,)
            if any(i.fields == fields for i in e.indexes):
                return None
            return ev.AddIndexOp(edge_id=e.edge_id, index=IndexConfig(fields))
        if kind == "add_sid":
            if not v.fields:
                return None
            return ev.AddSecondaryIdentitiesOp(
                {v.name: {fresh("sid"): [rng.choice(v.fields).name]}})
        if kind == "rm_sid":
            cand = [vn for vn in names if s.vertex(vn).secondary_identities]
            if not cand:
                return None
            vv = s.vertex(rng.choice(cand))
            return ev.RemoveSecondaryIdentitiesOp(
                {vv.name: [rng.choice(sorted(vv.secondary_identities))]})
        # ---- edge-payload family (the r12-added migrate paths)
        rels = [e.relation for e in s.edges if e.relation]
        if kind == "merge_e":
            if not rels:
                return None
            src_rel = rng.choice(rels)
            others = [r for r in rels if r != src_rel]
            into = (rng.choice(others)
                    if others and rng.random() < 0.5 else fresh("rel"))
            return ev.MergeEdgesOp(sources=[src_rel], into=into)
        if kind == "set_dir":
            if not s.edges:
                return None
            return ev.SetEdgeDirectedOp(
                edges=[rng.choice(s.edges).edge_id],
                directed=rng.random() < 0.5)
        if kind == "add_ep":
            if not rels:
                return None
            return ev.AddEdgePropertiesOp(
                {rng.choice(rels): [Field(fresh("ep"), FieldType.STRING)]})
        if kind == "rm_ep":
            for e in rng.sample(s.edges, len(s.edges)):
                if not e.relation:
                    continue
                ident = set(e.identities) | {
                    c for i in e.indexes for c in i.fields}
                cand = [f.name for f in e.properties if f.name not in ident]
                if cand:
                    return ev.RemoveEdgePropertiesOp(
                        {e.relation: [rng.choice(cand)]})
            return None
        if kind == "rename_ep":
            for e in rng.sample(s.edges, len(s.edges)):
                if e.relation and e.properties:
                    return ev.RenameEdgePropertiesOp(
                        {e.relation:
                         {rng.choice(e.properties).name: fresh("ep")}})
            return None
        if kind == "ident_e":
            cand = [e for e in s.edges if e.properties]
            if not cand:
                return None
            e = rng.choice(cand)
            n = rng.randint(0, min(2, len(e.properties)))
            keys = [f.name for f in rng.sample(e.properties, n)]
            return ev.ReplaceEdgeIdentitiesOp({e.edge_id: keys})
        return None

    counter = [0]

    def fresh(p):
        counter[0] += 1
        return f"{p}{counter[0]}"

    def probe(store, schema, warned, hops=0):
        """Operational probe (r13 verdict Next #2): run a REAL query against
        the mutated store — fetch_edges every step, a 1-hop BFS at chain end
        — so compiler-vs-data-plane addressing seams that static column
        checks can't encode (all three r13 finds) surface as query-time
        failures. Asserts execution + plausibly-bounded counts."""
        from graflo_spark.query import Direction

        try:
            view = store.as_view()
        except FileNotFoundError:
            return
        total_edge_rows = 0
        for e in schema.edges:
            try:
                total_edge_rows += store.read_edges(e.edge_id).count()
            except FileNotFoundError:
                pass
        for vn in schema.vertex_names:
            v = schema.vertex(vn)
            if v.identity_mode.value != "natural":
                continue
            try:
                vrows = store.read_vertices(vn).limit(1).collect()
            except FileNotFoundError:
                continue
            if not vrows:
                continue
            row = vrows[0]
            declared = set(v.field_names)
            anchor = next(
                ({"field": f, "op": "==", "value": row[f]}
                 for f in row.asDict()
                 if f in declared and row[f] is not None
                 and isinstance(row[f], (int, float, str))),
                None)
            if anchor is None:
                continue
            try:
                n = view.fetch_edges(vn, anchor, direction=Direction.ANY,
                                     limit=None).count()
            except ValueError as exc:
                if "no edges" in str(exc):
                    return
                assert _degraded(warned), (
                    f"fetch_edges({vn}) raised {exc} with no prior "
                    f"degradation warning")
                return
            assert 0 <= n <= 2 * total_edge_rows, (
                f"fetch_edges({vn}, {anchor}) returned {n} rows; "
                f"graph has {total_edge_rows} edge rows")
            if hops:
                total_v = sum(df.count() for df in view.vertices.values())
                try:
                    out = view.neighbors(vn, anchor, hops=hops).collect()
                except ValueError as exc:
                    if "no edges" in str(exc):
                        return
                    assert _degraded(warned), (
                        f"neighbors({vn}) raised {exc} with no prior "
                        f"degradation warning")
                    return
                assert any(r["hop"] == 0 for r in out), (
                    f"neighbors({vn}, {anchor}): anchor missing at hop 0")
                assert len(out) <= total_v, (
                    f"neighbors({vn}) reached {len(out)} > {total_v} nodes")
            return

    # CI default 4 seeds (~60 s; r15 driver-budget fix — the offline
    # ledgered depth runs with SPARK_GRAFT_FUZZ_SEEDS raised, as r13-r15
    # did at 8-500 seeds per round)
    n_seeds = int(os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "4"))
    n_ops = int(os.environ.get("SPARK_GRAFT_FUZZ_OPS", "6"))
    base = int(os.environ.get("SPARK_GRAFT_FUZZ_BASE", "1000"))
    for seed in range(n_seeds):
        rng = random.Random(base + seed)
        schema = CoreSchema(
            vertices=[
                Vertex("person", [Field("pid", FieldType.INT), Field("nm")],
                       identity=["pid"]),
                Vertex("city", [Field("cid", FieldType.INT), Field("cn")],
                       identity=["cid"]),
            ],
            edges=[
                Edge("person", "city", relation="lives_in",
                     properties=[Field("since", FieldType.INT)]),
                Edge("person", "person", relation="knows",
                     properties=[Field("w", FieldType.DOUBLE)]),
            ],
        )
        store = GraphStore(spark, str(tmp_path / f"g{seed}"), schema)
        store.apply_target_schema()
        store.upsert_vertices("person", spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "pid int, nm string"))
        store.upsert_vertices("city", spark.createDataFrame(
            [(10, "X"), (20, "Y")], "cid int, cn string"))
        store.insert_edges(
            EdgeId("person", "city", "lives_in"),
            spark.createDataFrame(
                [(1, 10, 2001), (2, 20, 2002), (3, 10, 2003)],
                "_src_pid int, _dst_cid int, since int"))
        store.insert_edges(
            EdgeId("person", "person", "knows"),
            spark.createDataFrame(
                [(1, 2, 0.5), (2, 3, 0.7)],
                "_src_pid int, _dst_pid int, w double"))
        warned: list[str] = []
        consistent(store, schema, warned)
        for step in range(n_ops):
            op = rand_op(rng, schema, fresh)
            if op is None:
                continue
            try:
                valid = op.apply(schema)  # schema-level validity gate
            except (ValueError, KeyError):
                continue
            del valid
            try:
                with warnings.catch_warnings(record=True) as caught:
                    warnings.simplefilter("always")
                    schema = ev.apply_plan(schema, [op], store=store)
                warned += [str(c.message) for c in caught]
            except AssertionError:
                raise
            except Exception as exc:  # noqa: BLE001 - fuzz reporting
                raise AssertionError(
                    f"seed {base + seed} step {step}: "
                    f"{type(op).__name__} migrate blew up: {exc}") from exc
            try:
                consistent(store, schema, warned)
                probe(store, schema, warned,
                      hops=1 if step == n_ops - 1 else 0)
            except AssertionError as exc:
                raise AssertionError(
                    f"seed {base + seed} step {step} after "
                    f"{type(op).__name__}: {exc}") from exc


def test_sanitize_migrates_store_dirs_and_columns(spark, tmp_path):
    """SanitizeOp had NO migrate (found by the r12 data-plane review):
    sanitizing a populated store renamed every camelCase type in the
    schema while the physical dirs and parquet columns kept the old
    names — the orphan-addressing bug class. Now dirs move (two-phase)
    and columns rename; _relation VALUES stay untouched (runtime data).
    A collapsing sanitize ('FooBar' + 'fooBar') is rejected."""
    schema = CoreSchema(
        vertices=[
            Vertex("PersonX", [Field("personId", FieldType.INT),
                               Field("fullName")], identity=["personId"]),
            Vertex("HomeCity", [Field("cityId", FieldType.INT)],
                   identity=["cityId"]),
        ],
        edges=[Edge("PersonX", "HomeCity", relation="livesIn",
                    properties=[Field("sinceYear", FieldType.INT)])],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("PersonX", spark.createDataFrame(
        [(1, "a"), (2, "b")], "personId int, fullName string"))
    store.insert_edges(
        EdgeId("PersonX", "HomeCity", "livesIn"),
        spark.createDataFrame([(1, 10, 2020)],
                              "_src_personId int, _dst_cityId int, sinceYear int"))

    s2 = ev.apply_plan(schema, [ev.SanitizeOp()], store=store)
    assert sorted(s2.vertex_names) == ["home_city", "person_x"]
    out = store.read_vertices("person_x")
    assert sorted(out.columns) == ["full_name", "person_id"]
    assert out.count() == 2
    e = store.read_edges(EdgeId("person_x", "home_city", "lives_in"))
    assert sorted(e.columns) == ["_dst_city_id", "_src_person_id",
                                 "since_year"]
    assert e.count() == 1
    import os
    assert not os.path.isdir(store._table_dir("vertices", "PersonX"))

    bad = CoreSchema(vertices=[
        Vertex("FooBar", [Field("x")], identity=["x"]),
        Vertex("fooBar", [Field("x")], identity=["x"]),
    ])
    with pytest.raises(ValueError, match="collapses"):
        ev.SanitizeOp().apply(bad)


def test_merge_into_empty_vertex_conforms_identity_columns(spark, tmp_path):
    """r12 fuzz find #1 (seed 24): merging a populated vertex into a
    DECLARED-but-never-populated one degenerated the union to the other
    side's frame, writing a vertex table without `into`'s identity
    column — which breaks every keyed path. Declared-but-absent columns
    now materialize as typed NULLs."""
    schema = CoreSchema(vertices=[
        Vertex("canon", [Field("canon_id", FieldType.INT), Field("x")],
               identity=["canon_id"]),
        Vertex("city", [Field("cid", FieldType.INT), Field("cn")],
               identity=["cid"]),
    ])
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("city", spark.createDataFrame(
        [(10, "X"), (20, "Y")], "cid int, cn string"))
    s2 = ev.apply_plan(
        schema, [ev.MergeVerticesOp(into="canon", other="city")],
        store=store)
    out = store.read_vertices("canon")
    assert "canon_id" in out.columns and "x" in out.columns
    assert dict(out.dtypes)["canon_id"] == "bigint"  # FieldType.INT -> long
    assert out.count() == 2           # rows carried over, not collapsed
    assert "canon" in s2.vertex_names and "city" not in s2.vertex_names


def test_replace_identity_with_unpopulated_column(spark, tmp_path):
    """r12 fuzz find #2 (seed ~45): AddPropertyOp then ReplaceIdentityOp
    onto the new (never-populated) column left the physical table
    without its identity column; and deduping ON an all-null column
    would have collapsed the table to one arbitrary row. The column now
    materializes as typed NULL and the dedup key stays the columns that
    carry data (here: none -> full-row dedup, rows preserved)."""
    schema = CoreSchema(vertices=[
        Vertex("person", [Field("pid", FieldType.INT), Field("nm")],
               identity=["pid"]),
    ])
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "pid int, nm string"))
    plan = [ev.AddPropertyOp("person", Field("email")),
            ev.ReplaceIdentityOp("person", ["email"], retire="keep")]
    s2 = ev.apply_plan(schema, plan, store=store)
    out = store.read_vertices("person")
    assert "email" in out.columns
    assert out.count() == 3           # NOT collapsed to one row
    assert s2.vertex("person").identity == ["email"]


def test_remove_property_cascades_indexes_and_guards_keys():
    """Reference apply.py remove_vertex_properties semantics: removing a
    property strips it from every index (an emptied index is dropped);
    removing a column still referenced by a secondary identity or a
    funnel branch raises (key semantics must be withdrawn explicitly).
    Found by the 2000-seed convergence sweep: ReplaceIdentityOp
    retire='drop' previously left a dangling index on the dropped
    column, making the evolved schema unreplayable."""
    from graflo_spark.manifest import IndexConfig

    s = CoreSchema(vertices=[
        Vertex("u",
               [Field("id", FieldType.INT), Field("email"), Field("note")],
               identity=["id"],
               secondary_identities={"mail": ["email"]},
               indexes=[IndexConfig(("note",)),
                        IndexConfig(("note", "email"))]),
    ])
    out = ev.RemovePropertyOp("u", "note").apply(s)
    v = out.vertex("u")
    assert [i.fields for i in v.indexes] == [("email",)]  # stripped, kept
    with pytest.raises(ValueError, match="secondary"):
        ev.RemovePropertyOp("u", "email").apply(s)

    # retire='drop' cascade: the old identity's derived index goes too
    s2 = CoreSchema(vertices=[
        Vertex("u", [Field("id", FieldType.INT), Field("email")],
               identity=["id"],
               indexes=[IndexConfig(("id",))]),
    ])
    out2 = ev.ReplaceIdentityOp("u", ["email"], retire="drop").apply(s2)
    v2 = out2.vertex("u")
    assert v2.field_names == ["email"]
    assert v2.indexes == []


def test_sanitize_migrate_fails_fast_on_stale_dir_collision(spark, tmp_path):
    """Advisor finding (r12): SanitizeOp.migrate walks ALL physical dirs —
    including stale/untracked ones apply() never validated. If a stale
    dir's snake-cased name collides with an existing dir, the old code
    raised mid-phase-2 with already-moved tables stranded at .mv-<uuid>
    temp names. Now the full post-move name set is validated BEFORE any
    rename: the migration fails fast and the store is untouched."""
    import os

    schema = CoreSchema(vertices=[
        Vertex("FooBar", [Field("fid", FieldType.INT)], identity=["fid"]),
    ])
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("FooBar", spark.createDataFrame(
        [(1,), (2,)], "fid int"))
    # a stale untracked dir whose sanitized name collides with FooBar's
    stale = os.path.join(store.root, "vertices", "foo_bar")
    os.makedirs(stale)
    before = sorted(os.listdir(os.path.join(store.root, "vertices")))
    with pytest.raises(ValueError, match="collides"):
        ev.apply_plan(schema, [ev.SanitizeOp()], store=store)
    after = sorted(os.listdir(os.path.join(store.root, "vertices")))
    assert after == before                       # nothing moved, no temps
    assert not any(".mv-" in d for d in after)
    assert store.read_vertices("FooBar").count() == 2  # data reachable


def test_retarget_collision_drop_warns(spark, tmp_path):
    """Advisor finding (r12): a retarget whose destination edge table
    already exists keeps the existing table (first-id-wins) and drops the
    source table's rows — silently. The drop is documented behavior; the
    silence was the bug. It now emits a UserWarning naming both tables."""
    import warnings as _w

    schema = CoreSchema(
        vertices=[
            Vertex("a", [Field("k", FieldType.INT)], identity=["k"]),
            Vertex("b", [Field("k", FieldType.INT)], identity=["k"]),
            Vertex("c", [Field("k", FieldType.INT)], identity=["k"]),
        ],
        edges=[Edge("a", "c", relation="r"), Edge("b", "c", relation="r")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.insert_edges(EdgeId("a", "c", "r"), spark.createDataFrame(
        [(1, 10)], "_src_k int, _dst_k int"))
    store.insert_edges(EdgeId("b", "c", "r"), spark.createDataFrame(
        [(2, 20)], "_src_k int, _dst_k int"))
    # retarget a->b collides a__r__c onto the existing b__r__c
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        s2 = ev.apply_plan(
            schema, [ev.RetargetEdgesOp(old_vertex="a", new_vertex="b")],
            store=store)
    msgs = [str(c.message) for c in caught if c.category is UserWarning]
    assert any("DROPPED" in m and "a__r__c" in m for m in msgs)
    assert [e.edge_id for e in s2.edges] == [EdgeId("b", "c", "r")]
    out = store.read_edges(EdgeId("b", "c", "r"))
    assert sorted(map(tuple, out.select("_src_k", "_dst_k").collect())) == [
        (2, 20)]                                 # survivor untouched


def test_merge_differently_keyed_rekeys_edges_and_keeps_unkeyed_rows(
        spark, tmp_path):
    """r13 fuzz find #1: merging differently-keyed vertex types left edge
    tables carrying the merged-away vertex's key columns (_dst_cid) while
    the addressing contract (query._node_key) compiles _dst_<into
    identity> — every traversal through the merged type broke. And the
    dedup on into's identity collapsed ALL of other's rows (NULL==NULL
    under dropDuplicates) to one arbitrary row — silent data loss.

    Now: edges re-key through the merged table onto into's identity,
    NULL-keyed rows survive the dedup split, and other's old identity is
    demoted to a secondary identity so its rows stay addressable."""
    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT), Field("nm")],
                   identity=["pid"]),
            Vertex("city", [Field("cid", FieldType.INT), Field("cn")],
                   identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1, "a"), (2, "b")], "pid int, nm string"))
    store.upsert_vertices("city", spark.createDataFrame(
        [(10, "X"), (20, "Y")], "cid int, cn string"))
    store.insert_edges(EdgeId("person", "city", "lives_in"),
                       spark.createDataFrame(
                           [(1, 10), (2, 20)], "_src_pid int, _dst_cid int"))

    s2 = ev.apply_plan(schema, [ev.MergeVerticesOp(into="person",
                                                   other="city")],
                       store=store)
    v = s2.vertex("person")
    assert v.secondary_identities.get("merged_city") == ["cid"]  # demoted
    out = store.read_vertices("person")
    assert out.count() == 4                       # both cities SURVIVE
    assert out.filter(F.col("pid").isNull()).count() == 2
    e = store.read_edges(EdgeId("person", "person", "lives_in"))
    # addressing contract: _dst_<into identity> present, and (r14) the old
    # key columns are RETAINED as the demoted secondary identity's key so
    # NULL-primary-keyed rows stay addressable (funnel endpoint fallback)
    assert "_dst_pid" in e.columns and "_dst_cid" in e.columns
    # pure-city rows carry no pid -> primary key NULL, secondary key kept
    assert e.count() == 2
    assert sorted((r["_src_pid"], r["_dst_pid"], r["_dst_cid"])
                  for r in e.collect()) == [(1, None, 10), (2, None, 20)]


def test_merge_same_keyed_types_still_plain_union(spark, tmp_path):
    """Same-keyed merge (identity names equal) keeps the r12 semantics:
    union + dedup on the shared identity, no demotion, no edge re-key."""
    schema = CoreSchema(
        vertices=[
            Vertex("user", [Field("email"), Field("a")], identity=["email"]),
            Vertex("customer", [Field("email"), Field("b")],
                   identity=["email"]),
        ],
        edges=[],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("user", spark.createDataFrame(
        [("x@e", "1")], "email string, a string"))
    store.upsert_vertices("customer", spark.createDataFrame(
        [("x@e", "2"), ("y@e", "3")], "email string, b string"))
    s2 = ev.apply_plan(schema, [ev.MergeVerticesOp(into="user",
                                                   other="customer")],
                       store=store)
    assert not s2.vertex("user").secondary_identities
    out = store.read_vertices("user")
    assert out.count() == 2                       # x@e deduped, y@e kept


def test_replace_identity_rekeys_incident_edges(spark, tmp_path):
    """r13 fuzz find #2: ReplaceIdentityOp re-deduped the vertex table but
    left incident edge tables keyed on the RETIRED identity columns —
    _src_pid against a vertex now addressed by nm (query._node_key
    compiles _src_nm). Edges now re-key through the pre-dedup old->new
    mapping, following merges: two rows collapsing onto one new key send
    both old keys to the surviving address."""
    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT), Field("nm")],
                   identity=["pid"]),
            Vertex("city", [Field("cid", FieldType.INT)], identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in"),
               Edge("person", "person", relation="knows")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    # pid 2 and 3 share nm 'b' -> replacing identity onto nm MERGES them
    store.upsert_vertices("person", spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b")], "pid int, nm string"))
    store.upsert_vertices("city", spark.createDataFrame(
        [(10,)], "cid int"))
    store.insert_edges(EdgeId("person", "city", "lives_in"),
                       spark.createDataFrame(
                           [(1, 10), (3, 10)], "_src_pid int, _dst_cid int"))
    store.insert_edges(EdgeId("person", "person", "knows"),
                       spark.createDataFrame(
                           [(1, 2), (2, 3)], "_src_pid int, _dst_pid int"))

    s2 = ev.apply_plan(
        schema, [ev.ReplaceIdentityOp("person", ["nm"], retire="keep")],
        store=store)
    assert s2.vertex("person").identity == ["nm"]
    out = store.read_vertices("person")
    assert out.count() == 2                       # b-rows merged
    e = store.read_edges(EdgeId("person", "city", "lives_in"))
    assert "_src_nm" in e.columns and "_src_pid" not in e.columns
    assert sorted(r["_src_nm"] for r in e.collect()) == ["a", "b"]
    k = store.read_edges(EdgeId("person", "person", "knows"))
    assert sorted(k.columns) == ["_dst_nm", "_src_nm"]  # BOTH sides re-keyed
    # (1->2) maps to (a->b); (2->3) maps to (b->b), a self-loop on the
    # merged vertex — the two old edges now address surviving rows
    assert sorted((r["_src_nm"], r["_dst_nm"]) for r in k.collect()) == [
        ("a", "b"), ("b", "b")]


def test_rename_identity_property_renames_edge_key_columns(spark, tmp_path):
    """r13 fuzz find #3: renaming an IDENTITY field migrated the vertex
    column but left incident edge tables with _src_<old>/_dst_<old> —
    dead addressing. Index metadata also kept the old field name, making
    the schema unreplayable. Both now cascade."""
    from graflo_spark.manifest import IndexConfig

    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT), Field("nm")],
                   identity=["pid"], indexes=[IndexConfig(("pid",))]),
            Vertex("city", [Field("cid", FieldType.INT)], identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in"),
               Edge("person", "person", relation="knows")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1, "a")], "pid int, nm string"))
    store.upsert_vertices("city", spark.createDataFrame(
        [(10,)], "cid int"))
    store.insert_edges(EdgeId("person", "city", "lives_in"),
                       spark.createDataFrame(
                           [(1, 10)], "_src_pid int, _dst_cid int"))
    store.insert_edges(EdgeId("person", "person", "knows"),
                       spark.createDataFrame(
                           [(1, 1)], "_src_pid int, _dst_pid int"))

    s2 = ev.apply_plan(
        schema, [ev.RenamePropertyOp("person", "pid", "person_id")],
        store=store)
    v = s2.vertex("person")
    assert v.identity == ["person_id"]
    assert [i.fields for i in v.indexes] == [("person_id",)]  # cascaded
    assert "person_id" in store.read_vertices("person").columns
    e = store.read_edges(EdgeId("person", "city", "lives_in"))
    assert "_src_person_id" in e.columns and "_src_pid" not in e.columns
    k = store.read_edges(EdgeId("person", "person", "knows"))
    assert sorted(c for c in k.columns) == ["_dst_person_id",
                                            "_src_person_id"]


# ---------------------------------------------------------------- r14:
# secondary-identity endpoint resolution (reference
# hq/endpoint_resolve.py:73-166, steps/models.py:347-377): edges whose
# re-keyed primary endpoint key is NULL stay traversable through the
# demoted secondary identity's retained key columns.

def _merged_city_store(spark, tmp_path):
    import warnings as _w

    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT), Field("nm")],
                   identity=["pid"]),
            Vertex("city", [Field("cid", FieldType.INT), Field("cn")],
                   identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1, "a"), (2, "b")], "pid int, nm string"))
    store.upsert_vertices("city", spark.createDataFrame(
        [(10, "X"), (20, "Y")], "cid int, cn string"))
    store.insert_edges(EdgeId("person", "city", "lives_in"),
                       spark.createDataFrame(
                           [(1, 10), (1, 20), (2, 10)],
                           "_src_pid int, _dst_cid int"))
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        s2 = ev.apply_plan(
            schema, [ev.MergeVerticesOp(into="person", other="city")],
            store=store)
    store.schema = s2
    msgs = [str(c.message) for c in caught if c.category is UserWarning]
    return store, s2, msgs


def test_merge_parallel_edges_survive_and_warns(spark, tmp_path):
    """r13 advisory: parallel edges sharing the kept endpoint — (1,c10),
    (1,c20) — collapsed under the NULL==NULL dedup once both re-keyed to
    (_src_pid=1, _dst_pid=NULL), and the dropped _dst_cid made the original
    destination unrecoverable. Retaining the old key columns in the dedup
    key keeps all three rows, and migrate() warns with the NULL-key count."""
    store, s2, msgs = _merged_city_store(spark, tmp_path)
    e = store.read_edges(EdgeId("person", "person", "lives_in"))
    got = sorted((r["_src_pid"], r["_dst_pid"], r["_dst_cid"])
                 for r in e.collect())
    assert got == [(1, None, 10), (1, None, 20), (2, None, 10)]
    assert any("NULL" in m and "addressable" in m for m in msgs)


def test_traverse_through_merged_away_endpoint(spark, tmp_path):
    """The r13 verdict's Next #1 'done' bar: a traversal THROUGH a
    merged-away endpoint. person 1 -> (cities 10, 20) must be reachable at
    hop 1 even though the re-keyed edge rows carry NULL _dst_pid — the
    funnel addresses them through the demoted merged_city secondary
    identity, with '#merged_city'-marked node keys that join the
    vertex-side keys exactly (hydrate round-trip proves it)."""
    store, s2, _ = _merged_city_store(spark, tmp_path)
    view = store.as_view()
    out = view.neighbors("person", {"field": "pid", "op": "==", "value": 1},
                         hops=1)
    rows = sorted((r["node_key"], r["hop"]) for r in out.collect())
    assert ("person\x1f1", 0) in rows
    assert ("person\x1f#merged_city\x1f10", 1) in rows
    assert ("person\x1f#merged_city\x1f20", 1) in rows
    assert len(rows) == 3
    # reverse direction: seed on a merged-away row (pure-city, NULL pid)
    # and traverse back to its primary-keyed neighbors
    back = view.neighbors("person", {"field": "cid", "op": "==", "value": 10},
                          hops=1)
    brows = sorted((r["node_key"], r["hop"]) for r in back.collect())
    assert ("person\x1f#merged_city\x1f10", 0) in brows
    assert ("person\x1f1", 1) in brows and ("person\x1f2", 1) in brows
    # hydrate: funnel node keys resolve back to full vertex docs
    docs = view.hydrate(out, "person")
    assert docs.count() == 3
    assert sorted(r["cn"] for r in docs.collect() if r["cn"]) == ["X", "Y"]


def test_fetch_edges_through_secondary_identity(spark, tmp_path):
    """fetch_edges anchored on a merged-away row: the anchor's funnel key
    ('person\\x1f#merged_city\\x1f10') must match the edge list's dst-side
    funnel key, so incidence works for NULL-primary-keyed endpoints."""
    from graflo_spark.query import Direction

    store, s2, _ = _merged_city_store(spark, tmp_path)
    view = store.as_view()
    inc = view.fetch_edges(
        "person", {"field": "cid", "op": "==", "value": 10},
        direction=Direction.ANY, limit=None)
    got = sorted((r["src_key"], r["dst_key"]) for r in inc.collect())
    assert got == [
        ("person\x1f#merged_city\x1f10", "person\x1f1"),
        ("person\x1f#merged_city\x1f10", "person\x1f2"),
    ]


def test_insert_edges_after_merge_preserves_secondary_keyed_rows(
        spark, tmp_path):
    """A post-merge insert_edges batch (keyed on the primary identity only)
    must not collapse the existing NULL-primary-keyed rows under the
    NULL==NULL groupBy — they bypass the merge untouched."""
    store, s2, _ = _merged_city_store(spark, tmp_path)
    eid = EdgeId("person", "person", "lives_in")
    store.insert_edges(eid, spark.createDataFrame(
        [(2, 1)], "_src_pid int, _dst_pid int"))
    e = store.read_edges(eid)
    got = sorted(
        ((r["_src_pid"], r["_dst_pid"], r["_dst_cid"]) for r in e.collect()),
        key=lambda t: tuple((x is None, x) for x in t))
    assert got == [(1, None, 10), (1, None, 20), (2, 1, None), (2, None, 10)]


def test_replace_identity_onto_unpopulated_column_warns_keeps_edges(
        spark, tmp_path):
    """r13 advisory repro: AddPropertyOp('email') + ReplaceIdentityOp(
    ['email']) re-keyed incident edges onto the just-minted all-NULL email
    column and the dedup destroyed rows irreversibly. Now the pre-mint
    guard skips the re-key, warns, and — with retire='demote' — the edges
    stay fully traversable through the retired_identity secondary."""
    import warnings as _w

    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT)],
                   identity=["pid"]),
        ],
        edges=[Edge("person", "person", relation="knows")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1,), (2,), (3,)], "pid int"))
    eid = EdgeId("person", "person", "knows")
    store.insert_edges(eid, spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "_src_pid int, _dst_pid int"))
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        s2 = ev.apply_plan(
            schema,
            [ev.AddPropertyOp("person", Field("email")),
             ev.ReplaceIdentityOp("person", ["email"], retire="demote")],
            store=store)
    store.schema = s2
    msgs = [str(c.message) for c in caught if c.category is UserWarning]
    assert any("carry no data" in m for m in msgs)
    e = store.read_edges(eid)
    assert e.count() == 3                       # rows SURVIVE (pre-fix: 2)
    assert "_src_pid" in e.columns              # old key kept, recoverable
    assert s2.vertex("person").secondary_identities["retired_identity"] == \
        ["pid"]
    # and the graph stays fully traversable through the retired identity
    view = store.as_view()
    out = view.neighbors("person", {"field": "pid", "op": "==", "value": 1},
                         hops=2)
    keys = sorted(r["node_key"] for r in out.collect())
    assert keys == [
        "person\x1f#retired_identity\x1f1",
        "person\x1f#retired_identity\x1f2",
        "person\x1f#retired_identity\x1f3",
    ]


def test_replace_identity_partially_populated_splits_and_warns(
        spark, tmp_path):
    """r14 fuzz find (seed 1015): replacing an identity onto a PARTIALLY
    populated column. Rows carrying a value re-key normally; rows with
    NULL must (a) not collapse together under the vertex dedup's
    NULL==NULL grouping (each survives), (b) keep their re-keyed edges
    addressable through the demoted secondary identity, and (c) fire the
    NULL-key warning — the silent half of the class the r13 advisory
    flagged for the fully-unpopulated column."""
    import warnings as _w

    schema = CoreSchema(
        vertices=[
            Vertex("city", [Field("cid", FieldType.INT), Field("em")],
                   identity=["cid"]),
        ],
        edges=[Edge("city", "city", relation="twin")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    # em populated for cid=10 only; 20 and 30 are NULL
    store.upsert_vertices("city", spark.createDataFrame(
        [(10, "a@x"), (20, None), (30, None)], "cid int, em string"))
    eid = EdgeId("city", "city", "twin")
    store.insert_edges(eid, spark.createDataFrame(
        [(10, 20), (10, 30)], "_src_cid int, _dst_cid int"))
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        s2 = ev.apply_plan(
            schema,
            [ev.ReplaceIdentityOp("city", ["em"], retire="demote",
                                  retire_as="old_cid")],
            store=store)
    store.schema = s2
    msgs = [str(c.message) for c in caught if c.category is UserWarning]
    assert any("NULL" in m and "addressable" in m for m in msgs)
    v = store.read_vertices("city")
    assert v.count() == 3                      # NULL-em rows both survive
    e = store.read_edges(eid)
    got = sorted(
        ((r["_src_em"], r["_dst_em"], r["_dst_cid"]) for r in e.collect()),
        key=lambda t: tuple((x is None, x) for x in t))
    assert got == [("a@x", None, 20), ("a@x", None, 30)]
    # and the graph stays fully traversable: 10 reaches both NULL-em
    # cities through their old_cid secondary addresses
    view = store.as_view()
    out = view.neighbors("city", {"field": "em", "op": "==", "value": "a@x"},
                         hops=1)
    keys = sorted(r["node_key"] for r in out.collect())
    assert keys == ["city\x1f#old_cid\x1f20", "city\x1f#old_cid\x1f30",
                    "city\x1fa@x"]


def test_merge_overlapping_identity_fields_no_duplicate_columns(
        spark, tmp_path):
    """r14 fuzz find #2a: a differently-keyed merge whose identities
    OVERLAP in a field name (into [pid, cid], other [cid]) renamed the
    mapped `__new` column onto the retained old key column, minting a
    duplicate column name that blew up the very next reference
    (AMBIGUOUS_REFERENCE). The mapped value equals the retained value by
    construction, so the duplicate is dropped instead."""
    import warnings as _w

    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT),
                              Field("cid", FieldType.INT)],
                   identity=["pid", "cid"]),
            Vertex("city", [Field("cid", FieldType.INT), Field("cn")],
                   identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1, 100), (2, 200)], "pid int, cid int"))
    store.upsert_vertices("city", spark.createDataFrame(
        [(10, "X"), (20, "Y")], "cid int, cn string"))
    store.insert_edges(EdgeId("person", "city", "lives_in"),
                       spark.createDataFrame(
                           [(1, 100, 10), (2, 200, 20)],
                           "_src_pid int, _src_cid int, _dst_cid int"))
    with _w.catch_warnings(record=True):
        _w.simplefilter("always")
        s2 = ev.apply_plan(
            schema, [ev.MergeVerticesOp(into="person", other="city")],
            store=store)
    store.schema = s2
    e = store.read_edges(EdgeId("person", "person", "lives_in"))
    assert len(e.columns) == len(set(e.columns))   # no duplicate names
    assert e.count() == 2
    # the merged graph still traverses through the secondary addresses
    view = store.as_view()
    out = view.neighbors("person",
                         {"field": "pid", "op": "==", "value": 1}, hops=1)
    assert out.count() == 2   # seed + city 10 through the funnel


def test_replace_identity_onto_stale_retained_key_column(spark, tmp_path):
    """r14 fuzz find #2b: ReplaceIdentityOp re-keying edges onto a column
    NAME an earlier migration had retained (the demoted merge key) minted
    the same duplicate. The stale column's funnel space is dead against
    the new primary (identical column set — the subset prune), so the
    fresh mapping replaces it."""
    import warnings as _w

    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT)],
                   identity=["pid"]),
            Vertex("city", [Field("cid", FieldType.INT)],
                   identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1,), (2,)], "pid int"))
    store.upsert_vertices("city", spark.createDataFrame(
        [(10,), (20,)], "cid int"))
    store.insert_edges(EdgeId("person", "city", "lives_in"),
                       spark.createDataFrame(
                           [(1, 10), (2, 20)], "_src_pid int, _dst_cid int"))
    with _w.catch_warnings(record=True):
        _w.simplefilter("always")
        s2 = ev.apply_plan(
            schema, [ev.MergeVerticesOp(into="person", other="city")],
            store=store)
        # person now carries cid (NULL for original persons, value for
        # merged cities) and edges retain _dst_cid; replacing person's
        # identity WITH cid re-keys onto that very column name
        s3 = ev.apply_plan(
            s2, [ev.ReplaceIdentityOp("person", ["cid"], retire="demote")],
            store=store)
    store.schema = s3
    e = store.read_edges(EdgeId("person", "person", "lives_in"))
    assert len(e.columns) == len(set(e.columns))   # no duplicate names
    assert e.count() == 2


def test_traverse_edge_keyed_in_older_space_than_vertex_winner(
        spark, tmp_path):
    """r14 fuzz find (seed 1201): after merge(person->city) the edges kept
    the merged_person key; a later ReplaceIdentityOp(city, [nm]) gave the
    former-person VERTEX rows a populated primary (nm) — their winner
    space moved UP while their incident edges stayed keyed in
    merged_person (the NULL-old-key bypass). Winner-vs-winner addressing
    silently missed those edges; canonical resolution (query._with_canon:
    per-space lookup -> vertex winner key) must traverse them in both
    directions."""
    import warnings as _w

    schema = CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT), Field("nm")],
                   identity=["pid"]),
            Vertex("city", [Field("cid", FieldType.INT)],
                   identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in")],
    )
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("person", spark.createDataFrame(
        [(1, "a"), (2, "b")], "pid int, nm string"))
    store.upsert_vertices("city", spark.createDataFrame(
        [(10,)], "cid int"))
    store.insert_edges(EdgeId("person", "city", "lives_in"),
                       spark.createDataFrame(
                           [(1, 10), (2, 10)], "_src_pid int, _dst_cid int"))
    with _w.catch_warnings(record=True):
        _w.simplefilter("always")
        s2 = ev.apply_plan(
            schema, [ev.MergeVerticesOp(into="city", other="person")],
            store=store)
        s3 = ev.apply_plan(
            s2, [ev.ReplaceIdentityOp("city", ["nm"], retire="demote")],
            store=store)
    store.schema = s3
    view = store.as_view()
    # forward: seed on the former-person row, whose winner is now the
    # populated primary (nm='a') while its edge is keyed _src_pid only
    out = view.neighbors("city", {"field": "nm", "op": "==", "value": "a"},
                         hops=1)
    keys = {r["node_key"]: r["hop"] for r in out.collect()}
    assert keys.get("city\x1fa") == 0
    assert any(k.startswith("city\x1f#") and h == 1
               for k, h in keys.items()), keys   # the city reached at hop 1
    # reverse: seed on the city, reach BOTH former persons by their
    # canonical (primary) keys
    back = view.neighbors("city", {"field": "cid", "op": "==", "value": 10},
                          hops=1)
    bkeys = {r["node_key"]: r["hop"] for r in back.collect()}
    assert bkeys.get("city\x1fa") == 1 and bkeys.get("city\x1fb") == 1
    # incidence agrees: fetch_edges anchored on the former person finds
    # its pid-keyed edge rewritten to canonical endpoint keys
    from graflo_spark.query import Direction

    inc = view.fetch_edges("city", {"field": "nm", "op": "==", "value": "a"},
                           direction=Direction.ANY, limit=None)
    assert inc.count() >= 1
