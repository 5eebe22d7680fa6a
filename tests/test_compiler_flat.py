"""End-to-end slice: star-schema manifest -> GraphBatch over flat parquet.

Golden-count style checks (reference test/ref/cast/*_sizes.yaml idea) with
DuckDB as the oracle.
"""

from graflo_spark.compiler import compile_resource
from graflo_spark.filters import FilterExpression as FE
from graflo_spark.manifest import CoreSchema, Edge, Field, Vertex
from graflo_spark.steps import EdgeStep, ResourceConfig, VertexStep


def star_schema() -> CoreSchema:
    return CoreSchema(
        vertices=[
            Vertex("region", [Field("r_regionkey"), Field("r_name")], identity=["r_regionkey"]),
            Vertex("nation", [Field("n_nationkey"), Field("n_name")], identity=["n_nationkey"]),
            Vertex(
                "customer",
                [Field("c_custkey"), Field("c_name"), Field("c_acctbal"), Field("c_mktsegment")],
                identity=["c_custkey"],
            ),
            Vertex(
                "order",
                [Field("o_orderkey"), Field("o_orderstatus"), Field("o_totalprice")],
                identity=["o_orderkey"],
            ),
        ],
        edges=[
            Edge("nation", "region"),
            Edge("customer", "nation"),
            Edge("order", "customer", relation="placed_by", properties=[Field("o_totalprice")]),
        ],
    )


def test_vertex_extraction_dedup(spark, tables, duck):
    schema = star_schema()
    res = ResourceConfig(
        name="orders",
        steps=[
            VertexStep(name="order", mapping={}),
            VertexStep(
                name="customer",
                mapping={"c_custkey": "o_custkey"},
                extraction_scope="mapped_only",
            ),
        ],
        infer_edges=False,
    )
    batch = compile_resource(schema, res, tables["orders"])
    n_orders = batch.vertices["order"].count()
    n_cust = batch.vertices["customer"].count()
    assert n_orders == duck.execute("SELECT COUNT(DISTINCT o_orderkey) FROM orders").fetchone()[0]
    assert n_cust == duck.execute("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]


def test_same_row_edge_and_inferred(spark, tables, duck):
    schema = star_schema()
    res = ResourceConfig(
        name="orders",
        steps=[
            VertexStep(name="order"),
            VertexStep(
                name="customer",
                mapping={"c_custkey": "o_custkey"},
                extraction_scope="mapped_only",
            ),
        ],
        infer_edges=True,
    )
    batch = compile_resource(schema, res, tables["orders"])
    eid = [e for e in batch.edges if e.source == "order"][0]
    edf = batch.edges[eid]
    assert edf.count() == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    # edge carries the o_totalprice weight from the schema edge properties
    assert "o_totalprice" in edf.columns
    got = edf.agg({"o_totalprice": "sum"}).collect()[0][0]
    want = duck.execute("SELECT SUM(o_totalprice) FROM orders").fetchone()[0]
    assert abs(got - want) < 1e-6 * abs(want)


def test_vertex_filters(spark, tables, duck):
    schema = star_schema()
    schema.vertex("order").filters = FE.AND(
        {"field": "o_totalprice", "op": ">", "value": 50000.0},
        FE.OR(
            ["==", "F", "o_orderstatus"],
            ["==", "O", "o_orderstatus"],
        ),
    )
    res = ResourceConfig(name="orders", steps=[VertexStep(name="order")], infer_edges=False)
    batch = compile_resource(schema, res, tables["orders"])
    got = batch.vertices["order"].count()
    want = duck.execute(
        "SELECT COUNT(*) FROM orders WHERE o_totalprice > 50000.0 "
        "AND (o_orderstatus = 'F' OR o_orderstatus = 'O')"
    ).fetchone()[0]
    assert got == want


def test_filter_sql_and_python_agree(duck):
    fe = FE.AND(
        {"field": "o_totalprice", "op": ">", "value": 100000.0},
        FE.NOT(["==", "P", "o_orderstatus"]),
        FE.IF_THEN(
            {"field": "o_orderpriority", "op": "==", "value": "1-URGENT"},
            {"field": "o_totalprice", "op": ">=", "value": 120000.0},
        ),
    )
    sql_n = duck.execute(
        f"SELECT COUNT(*) FROM orders WHERE {fe.to_sql()}"
    ).fetchone()[0]
    rows = duck.execute(
        "SELECT o_totalprice, o_orderstatus, o_orderpriority FROM orders"
    ).fetchall()
    py_n = sum(
        fe.evaluate(dict(zip(["o_totalprice", "o_orderstatus", "o_orderpriority"], r)))
        for r in rows
    )
    assert sql_n == py_n


def test_map_in_map_descend_no_duplicate_loc_key(spark):
    """Nested map descend (review finding): the inner explode re-aliased
    __loc_key/__item while the outer pair was still in the frame, leaving
    duplicate columns that made every later reference ambiguous. The
    innermost descend owns the canonical names; the enclosing level is
    sheltered at __loc_key<depth>/__item<depth>."""
    from graflo_spark.steps import DescendStep
    from pyspark.sql import types as T

    schema = CoreSchema(vertices=[
        Vertex("entry", [Field("outer"), Field("inner"), Field("val")],
               identity=["outer", "inner"]),
    ])
    df = spark.createDataFrame(
        [({"a": {"x": 1, "y": 2}, "b": {"z": 3}},)],
        T.StructType([T.StructField(
            "m", T.MapType(T.StringType(),
                           T.MapType(T.StringType(), T.IntegerType())))]),
    )
    res = ResourceConfig(name="maps", steps=[
        DescendStep(key="m", steps=[
            DescendStep(key="__item", steps=[
                VertexStep(name="entry", mapping={
                    "outer": "__loc_key1", "inner": "__loc_key",
                    "val": "__item"}),
            ]),
        ]),
    ])
    batch = compile_resource(schema, res, df)
    rows = {(r["outer"], r["inner"], r["val"])
            for r in batch.vertices["entry"].collect()}
    assert rows == {("a", "x", 1), ("a", "y", 2), ("b", "z", 3)}


def test_array_in_array_descend_no_duplicate_item(spark):
    """Scalar array-of-array: the inner posexplode re-aliased __item with
    the outer __item still present (same duplicate-column family). The
    outer item is the array being exploded here, so only __pos columns
    and the fresh __item remain."""
    from graflo_spark.steps import DescendStep

    schema = CoreSchema(vertices=[
        Vertex("cell", [Field("val")], identity=["val"]),
    ])
    df = spark.createDataFrame(
        [([[1, 2], [3]],)], "arr array<array<int>>")
    res = ResourceConfig(name="arrs", steps=[
        DescendStep(key="arr", steps=[
            DescendStep(key="__item", steps=[
                VertexStep(name="cell", mapping={"val": "__item"}),
            ]),
        ]),
    ])
    batch = compile_resource(schema, res, df)
    assert {r["val"] for r in batch.vertices["cell"].collect()} == {1, 2, 3}
