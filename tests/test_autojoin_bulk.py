"""Auto-join derivation, bulk CSV staging, extra_weights round-trip."""

from pyspark.sql import functions as F

from graflo_spark import infer
from graflo_spark.io import bulk_stage_csv, derive_join_spec, read_source
from graflo_spark.manifest import CoreSchema, Field, FieldType, Vertex
from graflo_spark.store import GraphStore


def test_derive_join_spec_from_fk_evidence(spark, tables):
    ev = infer.fk_containment(
        tables,
        [
            infer.FkCandidate("customer", "c_nationkey", "nation", "n_nationkey"),
            infer.FkCandidate("customer", "c_custkey", "supplier", "s_suppkey"),  # not an FK
        ],
    )
    spec = derive_join_spec(
        "customer", ev, select_fields={"nation": ["n_name"]})
    assert [j.table for j in spec.joins] == ["nation"]  # negative pair excluded
    assert spec.not_null_guards == ["c_nationkey"]
    out = spec.compile(tables)
    assert out.count() == tables["customer"].filter(
        F.col("c_nationkey").isNotNull()).count()
    assert "n_name" in out.columns


def test_bulk_stage_csv_roundtrip(spark, tables, tmp_path):
    path = str(tmp_path / "stage")
    job = bulk_stage_csv(tables["nation"].select("n_nationkey", "n_name"), path)
    assert job["columns"] == ["n_nationkey", "n_name"]
    back = read_source(spark, path, fmt="csv")
    assert back.count() == tables["nation"].count()


def test_bulk_stage_csv_uri_path(spark, tables, tmp_path):
    """Object-store staging contract: a Hadoop-filesystem URI goes through
    the same writer code path as a local path (s3a://... behaves like the
    file:// URI exercised here), and aliased schemes normalize to the
    maintained connector."""
    from graflo_spark.io import normalize_staging_uri

    assert normalize_staging_uri("s3://bucket/stage") == "s3a://bucket/stage"
    assert normalize_staging_uri("gs://bucket/x") == "gs://bucket/x"
    assert normalize_staging_uri("/local/dir") == "/local/dir"

    uri = f"file://{tmp_path}/uri_stage"
    job = bulk_stage_csv(tables["region"].select("r_regionkey", "r_name"), uri)
    assert job["path"] == uri
    back = read_source(spark, uri, fmt="csv")
    assert back.count() == tables["region"].count()


def test_store_extra_weights(spark, tables, tmp_path):
    schema = CoreSchema(vertices=[
        Vertex("nation", [Field("n_nationkey", FieldType.INT), Field("n_name")],
               identity=["n_nationkey"])])
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    store.upsert_vertices("nation", tables["nation"].select("n_nationkey", "n_name"))

    edges = tables["supplier"].select(
        F.col("s_suppkey").alias("_src_s_suppkey"),
        F.col("s_nationkey").alias("_dst_n_nationkey"))
    out = store.extra_weights(
        edges, "nation", on={"_dst_n_nationkey": "n_nationkey"}, fields=["n_name"])
    assert out.count() == edges.count()
    assert out.filter(F.col("nation@n_name").isNull()).count() == 0


def test_read_source_xml_native(spark, tmp_path):
    """Spark 4 ships a native XML reader; read_source must route to it with
    a default rowTag and full ingest-compatible schema inference."""
    from graflo_spark.io import read_source

    p = str(tmp_path / "cities.xml")
    with open(p, "w") as f:
        f.write(
            "<rows><row><name>ams</name><pop>900</pop></row>"
            "<row><name>rot</name><pop>650</pop></row></rows>"
        )
    df = read_source(spark, p)
    rows = {(r["name"], r["pop"]) for r in df.collect()}
    assert rows == {("ams", 900), ("rot", 650)}
