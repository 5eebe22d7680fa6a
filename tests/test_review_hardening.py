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
