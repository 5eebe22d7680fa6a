"""Structured Streaming ingest end-to-end (file stream replay ->
foreachBatch -> store upsert) + GraphView.hydrate."""

import time

from pyspark.sql import functions as F

from graflo_spark.manifest import CoreSchema, Edge, Field, FieldType, Vertex
from graflo_spark.steps import ResourceConfig, VertexStep
from graflo_spark.store import GraphStore
from graflo_spark.streaming import replay_as_stream, stream_ingest


def test_stream_ingest_idempotent_upsert(spark, tables, tmp_path):
    schema = CoreSchema(
        vertices=[
            Vertex("customer", [Field("c_custkey", FieldType.INT), Field("c_name")],
                   identity=["c_custkey"]),
            Vertex("nation", [Field("n_nationkey", FieldType.INT)],
                   identity=["n_nationkey"]),
        ],
        edges=[Edge("customer", "nation", relation="located_in")],
    )
    res = ResourceConfig("customer", steps=[
        VertexStep(name="customer"),
        VertexStep(name="nation", mapping={"n_nationkey": "c_nationkey"},
                   extraction_scope="mapped_only", lookup_only=True),
    ])
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()

    src = tables["customer"].select("c_custkey", "c_name", "c_nationkey")
    # split into several files so the stream delivers multiple micro-batches
    stream = replay_as_stream(spark, src.repartition(3))
    q = stream_ingest(stream, schema, res, store,
                      checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if store.read_vertices("customer").count() == src.count():
                    break
            except FileNotFoundError:
                pass
            time.sleep(0.5)
    finally:
        q.stop()

    assert store.read_vertices("customer").count() == src.count()
    eid = store.edge_ids()[0]
    assert store.read_edges(eid).count() == src.count()


def test_hydrate_returns_full_docs(spark, sf_dir):
    from graflo_spark.catalog import star_view
    from graflo_spark.query import Direction

    view = star_view(spark, sf_dir)
    nodes = view.neighbors(
        "nation", {"field": "n_nationkey", "op": "==", "value": 3},
        hops=1, direction=Direction.ANY)
    cust = view.hydrate(nodes, "customer")
    n = cust.count()
    assert n > 0
    assert "c_name" in cust.columns  # full docs, not just keys
    # every hydrated customer really is adjacent to nation 3
    keys = {r["node_key"] for r in nodes.filter(F.col("node_type") == "customer")
            .select("node_key").collect()}
    assert n == len(keys)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Watermarked streaming dedup: duplicate keys arriving within the
    watermark window emit once; state is bounded by the watermark (the only
    dedup shape that survives an unbounded stream)."""
    import datetime as dt

    from pyspark.sql import types as T

    from graflo_spark.streaming import stream_dedup

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.LongType()),
    ])
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(base + dt.timedelta(minutes=m), k)
            for m, k in [(0, 1), (1, 1), (1, 2), (2, 2), (2, 1), (3, 3)]]
    src = str(tmp_path / "dd_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup(stream, ["k"], ts_col="ts", watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory").queryName("dd_stream")
        .outputMode("append").option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(r["k"] for r in spark.table("dd_stream").collect())
    assert got == [1, 2, 3]

    # batch fallback: plain dropDuplicates
    batch = spark.createDataFrame(rows, schema)
    assert stream_dedup(batch, ["k"]).count() == 3
