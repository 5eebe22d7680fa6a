"""Tests for inference, vertex weights, combinations casting, time filter,
RDF pivot — behaviors not (or only partially) covered by the oracle catalog."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import load


def test_propose_identity_multi_step(spark):
    """The greedy walk genuinely extends: at sf0.01 lineitem's
    (l_orderkey, l_linenumber) is NOT unique and the proposal is 3-wide."""
    from graflo_spark import infer

    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    key = infer.propose_identity(
        df, ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"], max_width=4
    )
    assert key == ["l_orderkey", "l_partkey", "l_suppkey"]


def test_propose_identity_uniqueness_beats_keylike_name(spark):
    """r11 deferred finding #2, the builder's reproduction: a non-unique
    ``*_id`` FK column must NOT outrank a strictly-unique natural key —
    uniqueness decides, the name prior only breaks ties among unique
    candidates. Pre-fix output was ['group_id','email']."""
    from graflo_spark import infer

    df = spark.createDataFrame(
        [(1, "a@x", "g1"), (1, "b@x", "g2"), (2, "c@x", "g3"),
         (2, "d@x", "g4")],
        "group_id int, email string, note string")
    assert infer.propose_identity(df) == ["email"]

    # among several unique candidates the key-like name wins the tie
    df2 = spark.createDataFrame(
        [(1, "a@x"), (2, "b@x"), (3, "c@x")], "user_id int, email string")
    assert infer.propose_identity(df2) == ["user_id"]

    # no single unique column: the composite walk still seeds from the
    # name prior and extends (most selective next) to a proven key
    df3 = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (2, "x", 1), (2, "y", 3)],
        "order_id int, line string, qty int")
    assert infer.propose_identity(df3) == ["order_id", "qty"]


def test_propose_identity_no_key(spark, tables):
    from graflo_spark import infer

    key = infer.propose_identity(tables["nation"], ["n_regionkey"], max_width=1)
    assert key == []


def test_column_uniqueness_values(spark, tables, duck):
    from graflo_spark import infer

    got = {
        r["column_name"]: r
        for r in infer.column_uniqueness(tables["customer"], ["c_custkey", "c_nationkey"]).collect()
    }
    n, d = duck.execute(
        "SELECT COUNT(*), COUNT(DISTINCT c_nationkey) FROM customer"
    ).fetchone()
    assert got["c_custkey"]["n_distinct"] == n
    assert got["c_nationkey"]["n_distinct"] == d
    assert got["c_custkey"]["uniqueness"] == 1.0


def test_fk_containment_negative_control(spark, tables):
    from graflo_spark import infer

    ev = infer.fk_containment(
        tables,
        [
            infer.FkCandidate("lineitem", "l_orderkey", "orders", "o_orderkey"),
            infer.FkCandidate("orders", "o_custkey", "supplier", "s_suppkey"),
        ],
    ).collect()
    by = {(r["child_table"], r["child_column"], r["parent_table"]): r for r in ev}
    assert by[("lineitem", "l_orderkey", "orders")]["containment"] == 1.0
    assert by[("orders", "o_custkey", "supplier")]["containment"] < 0.5


def test_fk_candidates_surrogate_pk_requires_table_stem(spark):
    """r11 deferred finding #3, the builder's reproduction: with bare
    surrogate `id` PKs, every table's pk cross-matched every other
    table's `id`-suffixed columns (and their identity columns), and
    sequential ids proved the containment spuriously — a bogus
    users->groups edge on users.id itself. The fix requires the child
    column stem to NAME the parent table (singular/plural-normalized)
    when the PK name carries no table information."""
    from graflo_spark import infer

    users = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")],
        "id int, group_id int, name string")
    groups = spark.createDataFrame(
        [(1, "g1"), (2, "g2"), (3, "g3")], "id int, label string")
    m = infer.infer_manifest_from_tables({"users": users, "groups": groups})
    pairs = {(e.source, e.target) for e in m.schema.edges}
    assert pairs == {("users", "groups")}
    # the proven FK is group_id, never the users.id identity column
    res = m.resource("users")
    lookup = [s for s in res.steps
              if getattr(s, "mapping", None) == {"id": "group_id"}]
    assert lookup, "group_id -> groups.id lookup step missing"
    users_res_cols = {
        c for s in res.steps for c in (getattr(s, "mapping", None) or {}).values()
    }
    assert "id" not in users_res_cols  # users.id never mapped as an FK


def test_fk_containment_empty_candidates_raises(spark):
    from graflo_spark import infer

    with pytest.raises(ValueError, match="at least one FkCandidate"):
        infer.fk_containment({}, [])


def test_combinations_vs_star_counts(spark, tables):
    """COMBINATIONS yields n*(n-1)/2 pairs per doc; star yields n-1."""
    from graflo_spark.catalog import compile_resource
    from graflo_spark.manifest import CoreSchema, Edge, Field, FieldType, Vertex
    from graflo_spark.steps import DescendStep, EdgeStep, ResourceConfig, VertexStep

    docs = tables["customer"].groupBy("c_nationkey").agg(
        F.sort_array(F.collect_list(F.struct("c_custkey"))).alias("members"),
        F.count(F.lit(1)).alias("n"),
    )
    sizes = {r["c_nationkey"]: r["n"] for r in docs.select("c_nationkey", "n").collect()}
    want_combo = sum(n * (n - 1) // 2 for n in sizes.values())
    want_star = sum(n - 1 for n in sizes.values())

    schema = CoreSchema(
        vertices=[Vertex("customer", [Field("c_custkey", FieldType.INT)],
                         identity=["c_custkey"])],
        edges=[Edge("customer", "customer")],
    )

    def build(casting):
        res = ResourceConfig("nations", steps=[
            DescendStep(key="members", steps=[VertexStep(name="customer")]),
            EdgeStep.single(source="customer", target="customer", casting=casting),
        ], infer_edges=False, doc_key=["c_nationkey"])
        b = compile_resource(schema, res, docs)
        return b.edges[list(b.edges)[0]].count()

    assert build("combinations") == want_combo
    assert build(None) == want_star


def test_add_vertex_weights_left_join(spark, tables):
    from graflo_spark.compiler import add_vertex_weights

    edges = tables["supplier"].select(
        F.col("s_suppkey").alias("_src_s_suppkey"),
        F.col("s_nationkey").alias("_dst_n_nationkey"),
    )
    # drop one nation from the weight side -> its edges keep NULL weight
    weights = tables["nation"].filter(F.col("n_nationkey") != 0)
    out = add_vertex_weights(
        edges, weights, on={"_dst_n_nationkey": "n_nationkey"},
        fields=["n_name"], prefix="nation",
    )
    assert out.count() == edges.count()  # left join never drops edges
    n_null = out.filter(F.col("nation@n_name").isNull()).count()
    n_zero = edges.filter(F.col("_dst_n_nationkey") == 0).count()
    assert n_null == n_zero


def test_column_time_filter_pushdown(spark, sf_dir):
    """The predicate must reach the parquet scan (PushedFilters)."""
    from graflo_spark.io import column_time_filter

    ev = load(spark, sf_dir, "events")  # ts is epoch-ns long here
    out = column_time_filter(ev, "event_id", after=10, before=2000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(event_id,10)" in plan
    lo, hi = out.agg(F.min("event_id"), F.max("event_id")).first()
    assert lo >= 10 and hi < 2000


def test_triples_roundtrip(spark, tables):
    from graflo_spark.io import triples_to_docs, triples_to_multidocs

    nat = tables["nation"]
    triples = nat.selectExpr(
        "concat('nation/', CAST(n_nationkey AS STRING)) AS subject",
        "stack(2, 'name', n_name, 'region', CAST(n_regionkey AS STRING)) "
        "AS (predicate, object)",
    )
    docs = triples_to_docs(triples, predicates=["name", "region"])
    assert docs.count() == nat.count()
    assert set(docs.columns) == {"_uri", "name", "region"}
    multi = triples_to_multidocs(triples, predicates=["name"])
    row = multi.filter(F.col("_uri") == "nation/0").first()
    assert isinstance(row["name"], list) and len(row["name"]) == 1


def test_store_upsert_null_never_clobbers(spark, tables, tmp_path):
    from graflo_spark.manifest import CoreSchema, Field, FieldType, Vertex
    from graflo_spark.store import GraphStore

    schema = CoreSchema(vertices=[Vertex(
        "customer",
        [Field("c_custkey", FieldType.INT), Field("c_mktsegment")],
        identity=["c_custkey"])])
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    base = tables["customer"].select("c_custkey", "c_mktsegment")
    store.upsert_vertices("customer", base)
    overlay = base.limit(10).select(
        "c_custkey", F.lit(None).cast("string").alias("c_mktsegment"))
    store.upsert_vertices("customer", overlay)
    out = store.read_vertices("customer")
    assert out.filter(F.col("c_mktsegment").isNull()).count() == 0


def test_sliding_window_total_rows(spark, events):
    """Each event lands in exactly duration/slide windows."""
    from graflo_spark.streaming import sliding_window_agg

    ev = events
    out = sliding_window_agg(ev, "ts", "2 hours", "1 hour", [], {"value": "count"})
    total = out.agg(F.sum("count_value")).first()[0]
    assert total == 2 * ev.count()


def test_infer_schema_from_ontology(spark):
    """OWL TBox -> schema: classes->vertices, datatype props->fields,
    object props->edges (incl. self-edge), then the inferred resource
    pipelines actually run an ABox end-to-end."""
    from graflo_spark import infer
    from graflo_spark.compiler import compile_resource
    from graflo_spark.io import triples_to_docs

    EX = "http://example.org/onto#"
    OWL = "http://www.w3.org/2002/07/owl#"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    tbox = [
        (EX + "Publication", TYPE, OWL + "Class"),
        (EX + "Author", TYPE, RDFS + "Class"),
        (OWL + "Thing", TYPE, OWL + "Class"),  # owl-namespace class: excluded
        (EX + "title", TYPE, OWL + "DatatypeProperty"),
        (EX + "title", RDFS + "domain", EX + "Publication"),
        (EX + "cites", TYPE, OWL + "ObjectProperty"),
        (EX + "cites", RDFS + "domain", EX + "Publication"),
        (EX + "cites", RDFS + "range", EX + "Publication"),
        (EX + "authored_by", TYPE, OWL + "ObjectProperty"),
        (EX + "authored_by", RDFS + "domain", EX + "Publication"),
        (EX + "authored_by", RDFS + "range", EX + "Author"),
    ]
    triples = spark.createDataFrame(tbox, ["subject", "predicate", "object"])
    schema, resources = infer.infer_schema_from_ontology(triples)

    assert sorted(schema.vertex_names) == ["Author", "Publication"]
    pub = schema.vertex("Publication")
    assert pub.identity == ["_uri"]
    assert "title" in pub.field_names
    eids = {(e.source, e.target, e.relation) for e in schema.edges}
    assert eids == {
        ("Publication", "Publication", "cites"),
        ("Publication", "Author", "authored_by"),
    }

    # ABox: two publications, one citing the other, each with an author
    abox = [
        (EX + "p1", EX + "title", "Paper One"),
        (EX + "p1", EX + "cites", EX + "p2"),
        (EX + "p1", EX + "authored_by", EX + "a1"),
        (EX + "p2", EX + "title", "Paper Two"),
        (EX + "p2", EX + "authored_by", EX + "a2"),
    ]
    docs = triples_to_docs(
        spark.createDataFrame(abox, ["subject", "predicate", "object"]),
        localize=True,
    )
    res = next(r for r in resources if r.name == "Publication")
    batch = compile_resource(schema, res, docs)
    vcounts = {name: df.count() for name, df in batch.vertices.items()}
    assert vcounts["Publication"] >= 2  # p1, p2 (+ cited p2 ref merges on _uri)
    assert vcounts["Author"] == 2
    ecounts = {eid: df.count() for eid, df in batch.edges.items()}
    cites = next(v for k, v in ecounts.items() if k.relation == "cites")
    authored = next(v for k, v in ecounts.items() if k.relation == "authored_by")
    assert cites == 1
    assert authored == 2


def test_infer_manifest_from_tables(spark, tables):
    """Relational-3NF manifest inference end-to-end on TPC-H: PKs proposed,
    FKs proven by containment, lineitem classified as a junction, and an
    inferred resource compiles and produces correct counts."""
    from graflo_spark import infer
    from graflo_spark.compiler import compile_resource

    rel = {
        n: tables[n]
        for n in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem")
    }
    manifest = infer.infer_manifest_from_tables(rel)
    schema = manifest.schema

    # lineitem has >=2 proven FKs and no unique column -> junction, not vertex
    assert "lineitem" not in schema.vertex_names
    assert sorted(schema.vertex_names) == [
        "customer", "nation", "orders", "part", "region", "supplier"]
    assert schema.vertex("customer").identity == ["c_custkey"]
    assert schema.vertex("orders").identity == ["o_orderkey"]

    pairs = {(e.source, e.target) for e in schema.edges}
    assert ("nation", "region") in pairs          # n_regionkey FK
    assert ("customer", "nation") in pairs        # c_nationkey FK
    assert ("orders", "customer") in pairs        # o_custkey FK
    # junction pairwise edges among lineitem's FK targets
    assert ("orders", "part") in pairs and ("orders", "supplier") in pairs

    # compile the inferred orders resource: order vertices + edge to customer
    res = manifest.resource("orders")
    batch = compile_resource(schema, res, rel["orders"])
    assert batch.vertices["orders"].count() == rel["orders"].count()
    eid = next(k for k in batch.edges if k.target == "customer")
    assert batch.edges[eid].count() == rel["orders"].count()

    # compile the junction resource: lineitem rows become order-part edges
    jres = manifest.resource("lineitem")
    jbatch = compile_resource(schema, jres, rel["lineitem"])
    jeid = next(k for k in jbatch.edges if {k.source, k.target} == {"orders", "part"})
    assert jbatch.edges[jeid].count() == rel["lineitem"].dropDuplicates(
        ["l_orderkey", "l_partkey"]).count()


def test_read_information_schema_rejects_injection(spark):
    """table_schema is interpolated into JDBC SQL text — anything that is
    not a plain identifier must be rejected BEFORE any query is built."""
    import pytest

    from graflo_spark.io import read_information_schema

    for bad in ("pub'lic", "a; DROP TABLE x--", "a b", "", "1abc", "x'||'y"):
        with pytest.raises(ValueError, match="identifier"):
            read_information_schema(spark, "jdbc:postgresql://h/db",
                                    table_schema=bad)


def test_infer_manifest_from_information_schema(spark):
    """JDBC catalog-introspection contract (reference
    db/postgres/schema_inference.py:24-110): the metadata layer is
    injectable — these four frames are exactly what io.read_information_schema
    fetches from a live server (env-gated: no JDBC server in the container).
    PKs become identities, catalog FKs become edges without data proof, a
    junction whose PK is covered by its two FKs becomes pairwise edges, SQL
    types map to FieldTypes, and an inferred resource compiles end-to-end."""
    from graflo_spark import infer
    from graflo_spark.compiler import compile_resource
    from graflo_spark.manifest import FieldType

    columns = spark.createDataFrame([
        ("customer", "c_custkey", "bigint", 1),
        ("customer", "c_name", "character varying(25)", 2),
        ("orders", "o_orderkey", "bigint", 1),
        ("orders", "o_custkey", "bigint", 2),
        ("orders", "o_totalprice", "numeric(12,2)", 3),
        ("orders", "o_ts", "timestamp without time zone", 4),
        ("orders", "o_flags", "text[]", 5),
        ("part", "p_partkey", "integer", 1),
        ("part", "p_name", "text", 2),
        ("supplier", "s_suppkey", "integer", 1),
        ("supplier", "s_acctbal", "double precision", 2),
        ("part_supplier", "ps_partkey", "integer", 1),
        ("part_supplier", "ps_suppkey", "integer", 2),
        ("part_supplier", "ps_qty", "numeric", 3),
    ], "table_name string, column_name string, data_type string, ordinal_position int")
    constraints = spark.createDataFrame([
        ("customer", "customer_pk", "PRIMARY KEY"),
        ("orders", "orders_pk", "PRIMARY KEY"),
        ("part", "part_pk", "PRIMARY KEY"),
        ("supplier", "supplier_pk", "PRIMARY KEY"),
        ("part_supplier", "ps_pk", "PRIMARY KEY"),
        ("orders", "orders_cust_fk", "FOREIGN KEY"),
        ("part_supplier", "ps_part_fk", "FOREIGN KEY"),
        ("part_supplier", "ps_supp_fk", "FOREIGN KEY"),
    ], "table_name string, constraint_name string, constraint_type string")
    kcu = spark.createDataFrame([
        ("customer_pk", "customer", "c_custkey", 1),
        ("orders_pk", "orders", "o_orderkey", 1),
        ("part_pk", "part", "p_partkey", 1),
        ("supplier_pk", "supplier", "s_suppkey", 1),
        ("ps_pk", "part_supplier", "ps_partkey", 1),
        ("ps_pk", "part_supplier", "ps_suppkey", 2),
        ("orders_cust_fk", "orders", "o_custkey", 1),
        ("ps_part_fk", "part_supplier", "ps_partkey", 1),
        ("ps_supp_fk", "part_supplier", "ps_suppkey", 1),
    ], "constraint_name string, table_name string, column_name string, ordinal_position int")
    refs = spark.createDataFrame([
        ("orders_cust_fk", "customer_pk"),
        ("ps_part_fk", "part_pk"),
        ("ps_supp_fk", "supplier_pk"),
    ], "constraint_name string, unique_constraint_name string")

    manifest = infer.infer_manifest_from_information_schema(
        columns, constraints, kcu, refs)
    schema = manifest.schema

    # junction (PK == its two FK columns) -> edges, not a vertex
    assert sorted(schema.vertex_names) == ["customer", "orders", "part", "supplier"]
    assert schema.vertex("orders").identity == ["o_orderkey"]

    types = {f.name: f.type for f in schema.vertex("orders").fields}
    assert types["o_orderkey"] == FieldType.INT
    assert types["o_totalprice"] == FieldType.DOUBLE
    assert types["o_ts"] == FieldType.DATETIME
    flags = next(f for f in schema.vertex("orders").fields if f.name == "o_flags")
    assert flags.type == FieldType.LIST and flags.item_type == FieldType.STRING
    assert {f.name: f.type for f in schema.vertex("supplier").fields}[
        "s_acctbal"] == FieldType.DOUBLE

    pairs = {(e.source, e.target) for e in schema.edges}
    assert ("orders", "customer") in pairs       # catalog FK, no data proof
    assert ("part", "supplier") in pairs         # junction pairwise edge

    # the inferred orders resource compiles and runs on actual rows
    rows = spark.createDataFrame(
        [(1, 10, 99.5, None, None), (2, 20, 5.0, None, None)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_ts timestamp, o_flags array<string>")
    batch = compile_resource(schema, manifest.resource("orders"), rows)
    assert batch.vertices["orders"].count() == 2
    eid = next(k for k in batch.edges if k.target == "customer")
    assert batch.edges[eid].count() == 2


def test_infer_information_schema_mysql_primary_collision(spark):
    """MySQL names EVERY primary key 'PRIMARY', so the parent-side
    constraint name in referential_constraints is ambiguous by itself the
    moment two tables have PKs. Resolution must (a) bucket constraint
    names by ROLE (the parent side can only be PRIMARY KEY/UNIQUE, the
    child only FOREIGN KEY) and (b) use the MySQL-extension
    referenced_table_name column to pick the parent table. A role-blind
    bare-name lookup silently dropped all proven FKs here."""
    from graflo_spark import infer

    columns = spark.createDataFrame([
        ("customer", "id", "bigint", 1),
        ("customer", "name", "varchar(25)", 2),
        ("orders", "id", "bigint", 1),
        ("orders", "customer_id", "bigint", 2),
    ], "table_name string, column_name string, data_type string, ordinal_position int")
    constraints = spark.createDataFrame([
        ("customer", "PRIMARY", "PRIMARY KEY"),
        ("orders", "PRIMARY", "PRIMARY KEY"),
        ("orders", "orders_ibfk_1", "FOREIGN KEY"),
    ], "table_name string, constraint_name string, constraint_type string")
    kcu = spark.createDataFrame([
        ("PRIMARY", "customer", "id", 1),
        ("PRIMARY", "orders", "id", 1),
        ("orders_ibfk_1", "orders", "customer_id", 1),
    ], "constraint_name string, table_name string, column_name string, ordinal_position int")
    refs = spark.createDataFrame([
        ("orders_ibfk_1", "PRIMARY", "customer"),
    ], "constraint_name string, unique_constraint_name string, "
       "referenced_table_name string")

    manifest = infer.infer_manifest_from_information_schema(
        columns, constraints, kcu, refs)
    schema = manifest.schema
    assert schema.vertex("customer").identity == ["id"]
    pairs = {(e.source, e.target) for e in schema.edges}
    assert ("orders", "customer") in pairs

    # without the referenced_table_name hint the name stays ambiguous:
    # skip (no mispairing), never guess
    refs_ansi = refs.select("constraint_name", "unique_constraint_name")
    m2 = infer.infer_manifest_from_information_schema(
        columns, constraints, kcu, refs_ansi)
    assert not {(e.source, e.target) for e in m2.schema.edges}


def test_cross_resource_identity_funnel_fallback(spark):
    """When no shared field tuple keys every resource, the proposal falls
    back to per-resource funnel branches (reference _fallback_proposal)."""
    from graflo_spark.cross_identity import (
        CrossResourceConfig, CrossResourceIdentityInferencer, name_similarity,
    )

    # resources share a non-unique 'segment' column; each keys itself
    a = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], ["cust_id", "segment"])
    b = spark.createDataFrame(
        [(10, "A"), (11, "B"), (12, "B")], ["party_id", "segment"])
    inf = CrossResourceIdentityInferencer(
        CrossResourceConfig(min_pair_score=0.4))
    prop = inf.infer({"a": a, "b": b}, vertex_name="party")
    assert prop.strategy == "funnel"
    assert prop.funnel == [["cust_id"], ["party_id"]]
    assert prop.alignments[0].canonical == "segment"

    # fewer than two resources is a stated no-viable case, not an error
    none = inf.infer({"a": a})
    assert none.strategy == "no_viable_identity" and "two resources" in none.reason

    # alignment evidence: token overlap vs char ratio, better wins
    assert name_similarity("customer_email", "email_address") > 0.3
    assert name_similarity("phone", "phone_no") > 0.7
    assert name_similarity("x", "x") == 1.0
