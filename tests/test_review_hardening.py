"""Review-hardening fixes for the graph core: version-counter floor across
schema-evolution snapshots (no pinned-version aliasing), upsert identity
guards, parameterized retention, NULL-safe secondary-identity policies,
deterministic blank-vertex positional zip, and NULL-endpoint BFS."""

import pytest
from pyspark.sql import functions as F

from graflo_spark.manifest import CoreSchema, Edge, EdgeId, Field, Vertex
from graflo_spark.query import Direction, GraphView
from graflo_spark.store import GraphStore


def _schema():
    return CoreSchema(
        vertices=[Vertex("n", [Field("id"), Field("name")],
                         identity=["id"])],
        edges=[Edge("n", "n", relation="to")],
    )


def test_snapshot_preserves_version_counter_and_graph_pins(spark, tmp_path):
    """A schema-evolution snapshot supersedes table history but must never
    RESTART the version counter: a later commit would otherwise silently
    alias a version number an unexpired graph manifest still pins to
    pre-evolution data. Post-fix: pre-evolution pins raise LOUDLY, the
    snapshot itself is addressable at the floor version, and post-evolution
    commits continue the counter."""
    store = GraphStore(spark, str(tmp_path / "g"), _schema())
    tdir = store._table_dir("vertices", "n")
    store.upsert_vertices("n", spark.createDataFrame(
        [(1, "a")], "id long, name string"))
    store.upsert_vertices("n", spark.createDataFrame(
        [(2, "b")], "id long, name string"))
    assert store._table_version(tdir) == 2
    g_pre = store.commit_graph()                 # pins vertices/n -> v2
    snap = spark.createDataFrame([(9, "evolved")], "id long, name string")
    store._write_snapshot(tdir, snap)
    # counter floor: the snapshot carries v3, not a restart to 0
    assert store._table_version(tdir) == 3
    # the snapshot-era graph commit pins v3 and reads the snapshot content
    g_post = store.commit_graph()
    got = store.read_vertices_at_graph("n", g_post).collect()
    assert [(r["id"], r["name"]) for r in got] == [(9, "evolved")]
    # pre-evolution pinned versions raise loudly instead of aliasing
    with pytest.raises(FileNotFoundError):
        store.read_vertices_at_graph("n", g_pre)
    # the next upsert migrates the snapshot and CONTINUES the counter
    store.upsert_vertices("n", spark.createDataFrame(
        [(10, "post")], "id long, name string"))
    assert store._table_version(tdir) == 4
    rows = {r["id"]: r["name"] for r in store.read_vertices("n").collect()}
    assert rows == {9: "evolved", 10: "post"}
    # v2 (pre-evolution) can never resolve to post-evolution data
    with pytest.raises(FileNotFoundError):
        store.read_vertices_at("n", 2)


def test_upsert_missing_identity_column_raises(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"), _schema())
    store.upsert_vertices("n", spark.createDataFrame(
        [(1, "a")], "id long, name string"))
    with pytest.raises(ValueError, match="missing identity"):
        store.upsert_vertices("n", spark.createDataFrame(
            [("x",)], "name string"))


def test_expire_versions_does_not_mutate_retention(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"), _schema())
    for i in range(4):
        store.upsert_vertices("n", spark.createDataFrame(
            [(i, f"v{i}")], "id long, name string"))
    before = store.snapshot_keep
    store.expire_versions("vertices", "n", keep=1)
    assert store.snapshot_keep == before         # instance state untouched
    assert store.read_vertices("n").count() == 4


def test_resolve_null_secondary_keys_not_ambiguous(spark):
    from graflo_spark.resolve import resolve_endpoints

    vertices = spark.createDataFrame(
        [(1, "a@x"), (2, None), (3, None), (4, "b@x")],
        "pk long, email string")
    edges = spark.createDataFrame(
        [("a@x", 100), ("b@x", 200), ("missing@x", 300)],
        "_src_email string, payload long")
    # two NULL-email vertices are NOT an ambiguity: error must not raise
    out = resolve_endpoints(
        edges, vertices, ["email"], ["pk"], policy="error")
    got = sorted((r["_src_pk"], r["payload"]) for r in out.collect())
    assert got == [(1, 100), (4, 200)]           # unresolved edge dropped
    # a REAL duplicate key still raises
    dup = vertices.unionByName(spark.createDataFrame(
        [(5, "a@x")], "pk long, email string"))
    with pytest.raises(ValueError, match="ambiguous"):
        resolve_endpoints(edges, dup, ["email"], ["pk"], policy="error")
    # skip drops only the truly ambiguous key, not the null-key vertices
    out2 = resolve_endpoints(
        edges, dup, ["email"], ["pk"], policy="skip")
    assert sorted((r["_src_pk"], r["payload"]) for r in out2.collect()) == [
        (4, 200)]


def test_blank_edge_join_positional_zip_deterministic(spark):
    from graflo_spark.resolve import blank_edge_join

    s = spark.createDataFrame(
        [(f"s{i}",) for i in range(20)], "_key string").repartition(7)
    t = spark.createDataFrame(
        [(f"t{i}",) for i in range(20)], "_key string").repartition(3)
    a = sorted(map(tuple, blank_edge_join(s, t, []).collect()))
    b = sorted(map(tuple, blank_edge_join(
        s.repartition(2), t.repartition(11), []).collect()))
    assert a == b and len(a) == 20               # partitioning-invariant
    with pytest.raises(ValueError, match="equal sides"):
        blank_edge_join(s, t.limit(5), [])


def test_blank_edge_join_zips_in_document_order(spark):
    """When both sides carry __doc_id, the positional zip pairs rows in
    DOCUMENT order (reference hq/db_writer.py:348 zips docs as extracted)
    — not by the minted keys, whose sort order is an arbitrary bijection
    that loses the row correspondence (advisor finding). Keys here are
    chosen so key-order and doc-order DISAGREE."""
    from graflo_spark.resolve import blank_edge_join

    # doc order 0,1,2 but source keys sort z,y,x and target keys a,b,c:
    # key-order zip would pair (x,a),(y,b),(z,c); doc-order pairs (z,a)...
    s = spark.createDataFrame(
        [("z", 0), ("y", 1), ("x", 2)], "_key string, __doc_id long"
    ).repartition(3)
    t = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2)], "_key string, __doc_id long"
    ).repartition(2)
    got = sorted(map(tuple, blank_edge_join(s, t, []).collect()))
    assert got == [("x", "c"), ("y", "b"), ("z", "a")]


def test_bfs_null_endpoint_not_reexpanded(spark):
    """An edge with a NULL destination key must not enter the frontier:
    pre-fix it re-entered visited every hop (null never equals null in the
    anti-join), emitting duplicate (node_key, hop) rows."""
    schema = _schema()
    verts = spark.createDataFrame(
        [(0, "z"), (1, "o"), (2, "t")], "id long, name string")
    edges = spark.createDataFrame(
        [(0, 1), (1, None), (2, None)], "_src_id long, _dst_id long")
    view = GraphView(
        vertices={"n": verts},
        edges={EdgeId("n", "n", "to"): edges},
        schema=schema,
    )
    out = view.neighbors(
        "n", {"field": "id", "op": "==", "value": 0}, hops=3,
        direction=Direction.OUT)
    rows = [(r["node_key"], r["hop"]) for r in out.collect()]
    assert len(rows) == len(set(r[0] for r in rows))  # one row per node
    assert sorted(rows) == [("n\x1f0", 0), ("n\x1f1", 1)]


def test_selectspec_same_name_join_key_not_ambiguous(spark):
    from graflo_spark.io import JoinClause, SelectSpec

    base = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    right = spark.createDataFrame([(1, "R1")], "id long, r string")
    spec = SelectSpec(
        base="b",
        joins=[JoinClause(table="r", on={"id": "id"})],
        where={"field": "id", "op": ">=", "value": 1},   # would be AMBIGUOUS pre-fix
        select=["id", "v", "r"],
    )
    out = spec.compile({"b": base, "r": right}).collect()
    assert sorted((r["id"], r["r"]) for r in out) == [(1, "R1"), (2, None)]


def test_round_str_no_thousands_separators(spark):
    from graflo_spark.transforms import Transform

    df = spark.createDataFrame([(1234.567,), (None,)], "x double")
    out = Transform(fn="round_str", input=["x"], output=["s"]).apply(df)
    vals = [r["s"] for r in out.orderBy(F.col("x").asc_nulls_last()).collect()]
    assert vals == ["1234.57", None]


def test_python_fn_none_stays_null(spark):
    from graflo_spark.transforms import Transform

    df = spark.createDataFrame([(1,), (2,)], "x long")
    t = Transform(python_fn=lambda v: None if v == 2 else f"v{v}",
                  input=["x"], output=["y"])
    rows = {r["x"]: r["y"] for r in t.apply(df).collect()}
    assert rows == {1: "v1", 2: None}            # not the string "None"


def test_remove_prefix_is_literal(spark):
    from graflo_spark.transforms import Transform

    df = spark.createDataFrame([("1.2-a",), ("1x2-b",)], "x string")
    out = Transform(fn="remove_prefix", input=["x"], output=["y"],
                    params={"prefix": "1.2-"}).apply(df)
    assert {r["x"]: r["y"] for r in out.collect()} == {
        "1.2-a": "a", "1x2-b": "1x2-b"}          # dot no longer wildcards


def test_parse_multi_item_double_quotes_and_bracketed_apostrophe(spark):
    from graflo_spark.transforms import Transform

    df = spark.createDataFrame(
        [('"name: John" "name: Jane"',), ("[name: O'Brien] [name: Jane]",)],
        "x string")
    out = Transform(fn="parse_multi_item", input=["x"], output=["names"],
                    params={"keys": {"name": "names"}}).apply(df)
    got = {r["x"]: r["names"] for r in out.collect()}
    assert got['"name: John" "name: Jane"'] == ["John", "Jane"]
    assert got["[name: O'Brien] [name: Jane]"] == ["O'Brien", "Jane"]


def test_dress_missing_input_nulls_declared_outputs(spark):
    from graflo_spark.transforms import Transform

    df = spark.createDataFrame([(1,)], "other long")
    t = Transform(fn="standardize", input=["price"],
                  dress={"key": "k", "value": "v"}, fail_on_missing=False)
    out = t.apply(df)
    assert {"k", "v"} <= set(out.columns)        # pivot columns exist, null
    r = out.first()
    assert r["k"] is None and r["v"] is None


def test_doc_id_free_cross_frame_edge_raises_clearly(spark):
    from graflo_spark.compiler import compile_resource
    from graflo_spark.steps import (
        EdgeLink, EdgeStep, ResourceConfig, TransformStep, VertexStep)
    from graflo_spark.transforms import Transform

    schema = CoreSchema(
        vertices=[Vertex("a", [Field("x")], identity=["x"]),
                  Vertex("b", [Field("y")], identity=["y"])],
        edges=[Edge("a", "b", relation="to")],
    )
    df = spark.createDataFrame([("1", "2")], "x string, y string")
    res = ResourceConfig("r", steps=[
        VertexStep(name="a"),
        TransformStep(transform=Transform(rename={"y": "y"})),
        VertexStep(name="b"),
        EdgeStep(links=[EdgeLink(source="a", target="b")]),
    ], infer_edges=False)
    with pytest.raises(ValueError, match="doc_key"):
        compile_resource(schema, res, df)


def test_dynamic_edge_step_sees_later_extracts(spark):
    """A DynamicEdgeStep placed BEFORE the router that fills its target
    role must still render those edges: link enumeration happens after the
    whole walk, not at the step's position (pre-fix the later router's
    types were silently absent from the cross product)."""
    from graflo_spark.compiler import compile_resource
    from graflo_spark.steps import (
        DynamicEdgeStep, ResourceConfig, VertexRouterStep)

    schema = CoreSchema(
        vertices=[Vertex("s", [Field("sid")], identity=["sid"]),
                  Vertex("t", [Field("tid")], identity=["tid"])],
        edges=[Edge("s", "t", relation="to")],
    )
    df = spark.createDataFrame(
        [(1, "s", 10, "t")], "sid long, skind string, tid long, tkind string")
    res = ResourceConfig("r", steps=[
        VertexRouterStep(type_field="skind", type_map={"s": "s"},
                         vertex_from_map={"s": {"sid": "sid"}},
                         role="src"),
        DynamicEdgeStep(source_role="src", target_role="dst"),
        # the target-role router comes AFTER the dynamic edge step
        VertexRouterStep(type_field="tkind", type_map={"t": "t"},
                         vertex_from_map={"t": {"tid": "tid"}},
                         role="dst"),
    ], infer_edges=False)
    batch = compile_resource(schema, res, df)
    eids = {(e.source, e.target) for e in batch.edges}
    assert ("s", "t") in eids
    assert batch.edges[next(iter(batch.edges))].count() == 1


def test_blank_edge_join_mixed_doc_id_uses_key_order_both_sides(spark):
    """Advisor finding (r12): when only ONE side carries __doc_id, the
    zip used doc-order on that side against key-order on the other — an
    arbitrary bijection sold as document order. The mixed case now falls
    back to key-order on BOTH sides (same contract as the no-doc_id
    case), keeping the zip a deterministic, partitioning-invariant pairing."""
    from graflo_spark.resolve import blank_edge_join

    # source carries __doc_id whose order DISAGREES with its key order;
    # target has no __doc_id. Key-order on both sides pairs x-a, y-b, z-c.
    s = spark.createDataFrame(
        [("z", 0), ("y", 1), ("x", 2)], "_key string, __doc_id long"
    ).repartition(3)
    t = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "_key string").repartition(2)
    got = sorted(map(tuple, blank_edge_join(s, t, []).collect()))
    assert got == [("x", "a"), ("y", "b"), ("z", "c")]
    # and it is invariant under repartitioning
    got2 = sorted(map(tuple, blank_edge_join(
        s.repartition(5), t.repartition(1), []).collect()))
    assert got2 == got
