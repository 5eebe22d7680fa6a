"""GraphEngine lifecycle + API source tests (SURVEY §3.2, §2.1)."""

import pytest
from pyspark.sql import functions as F

from graflo_spark.engine import GraphEngine, IngestionParams
from graflo_spark.io import ApiSourceConfig, read_api_source, read_source
from graflo_spark.manifest import CoreSchema, Edge, Field, FieldType, Vertex
from graflo_spark.steps import ResourceConfig, VertexStep


def small_schema() -> CoreSchema:
    return CoreSchema(
        vertices=[
            Vertex("customer", [Field("c_custkey", FieldType.INT), Field("c_name")],
                   identity=["c_custkey"]),
            Vertex("nation", [Field("n_nationkey", FieldType.INT), Field("n_name")],
                   identity=["n_nationkey"]),
        ],
        edges=[Edge("customer", "nation", relation="located_in")],
    )


def resources(tables):
    lk = dict(extraction_scope="mapped_only", lookup_only=True)
    return [
        (ResourceConfig("nation", steps=[VertexStep(name="nation")],
                        infer_edges=False),
         tables["nation"]),
        (ResourceConfig("customer", steps=[
            VertexStep(name="customer"),
            VertexStep(name="nation", mapping={"n_nationkey": "c_nationkey"}, **lk),
        ]), tables["customer"]),
    ]


def test_define_and_ingest_then_migrate(spark, tables, tmp_path):
    eng = GraphEngine(spark, small_schema(), str(tmp_path / "g1"))
    store = eng.define_and_ingest(resources(tables))
    assert store.read_vertices("customer").count() == tables["customer"].count()
    assert store.read_vertices("nation").count() == tables["nation"].count()
    eids = store.edge_ids()
    assert len(eids) == 1
    n_edges = store.read_edges(eids[0]).count()
    assert n_edges == tables["customer"].count()

    # graph -> graph migration preserves every table
    dst = eng.migrate_graph(str(tmp_path / "g2"))
    assert dst.read_vertices("customer").count() == tables["customer"].count()
    assert dst.read_edges(eids[0]).count() == n_edges

    # re-ingest is idempotent (merge-on-identity)
    eng.ingest(resources(tables))
    assert store.read_vertices("customer").count() == tables["customer"].count()
    assert store.read_edges(eids[0]).count() == n_edges


def test_ingest_scoping_and_caps(spark, tables, tmp_path):
    eng = GraphEngine(spark, small_schema(), str(tmp_path / "g"))
    eng.define_schema()
    eng.ingest(resources(tables),
               IngestionParams(resources=["nation"], max_items=10))
    assert eng.store.read_vertices("nation").count() == 10
    with pytest.raises(FileNotFoundError):
        eng.store.read_vertices("customer")


def test_sample_resource(spark, tables, tmp_path):
    eng = GraphEngine(spark, small_schema(), str(tmp_path / "g"))
    docs = eng.sample_resource(tables["customer"], n=5)
    assert len(docs) == 5 and "c_custkey" in docs[0]


def _pages(rows, size):
    return [rows[i:i + size] for i in range(0, len(rows), size)]


def test_api_source_offset_and_page(spark):
    rows = [{"id": i, "name": f"r{i}"} for i in range(25)]

    def fetch(params):
        off = params.get("offset", params.get("page", 0) * params["limit"])
        if "page" in params:
            off = params["page"] * params["limit"]
        return rows[off:off + params["limit"]], None

    for mode in ("offset", "page"):
        df = read_api_source(
            spark, fetch, ApiSourceConfig(pagination=mode, page_size=10))
        assert df.count() == 25
        assert df.agg(F.max("id")).first()[0] == 24


def test_api_source_cursor_and_retry(spark):
    rows = [{"id": i} for i in range(30)]
    calls = {"n": 0}

    def fetch(params):
        calls["n"] += 1
        if calls["n"] == 2:  # one transient failure; retry must recover
            raise ConnectionError("flaky")
        start = int(params.get("cursor", 0))
        batch = rows[start:start + params["limit"]]
        nxt = str(start + len(batch)) if start + len(batch) < len(rows) else None
        return batch, nxt

    df = read_api_source(
        spark, fetch,
        ApiSourceConfig(pagination="cursor", page_size=10, backoff_seconds=0.01))
    assert df.count() == 30


def test_api_source_empty_needs_schema(spark):
    def fetch(params):
        return [], None

    with pytest.raises(ValueError):
        read_api_source(spark, fetch)
    df = read_api_source(spark, fetch, schema="id LONG")
    assert df.count() == 0


def test_read_source_csv_jsonl_roundtrip(spark, tables, tmp_path):
    nat = tables["nation"].select("n_nationkey", "n_name")
    csv_dir = str(tmp_path / "nation_csv")
    jl_dir = str(tmp_path / "nation_jsonl")
    nat.write.option("header", True).csv(csv_dir)
    nat.write.json(jl_dir)
    # write paths have no extension -> explicit fmt
    got_csv = read_source(spark, csv_dir, fmt="csv")
    got_jl = read_source(spark, jl_dir, fmt="jsonl")
    assert got_csv.count() == nat.count()
    assert got_jl.count() == nat.count()
    assert set(got_csv.columns) == {"n_nationkey", "n_name"}


def test_sparql_source_config_and_pagination(spark):
    from graflo_spark.io import SparqlSourceConfig, read_sparql_source

    cfg = SparqlSourceConfig(rdf_class="http://ex/Nation",
                             graph_uri="http://ex/g", page_size=3)
    q = cfg.build_query(offset=6)
    assert "GRAPH <http://ex/g>" in q and "?s a <http://ex/Nation>" in q
    assert q.endswith("ORDER BY ?s LIMIT 3 OFFSET 6")
    custom = SparqlSourceConfig(
        sparql_query="SELECT ?s ?p ?o WHERE { ?s ?p ?o } ORDER BY ?o")
    assert "ORDER BY ?s" not in custom.build_query()  # custom order kept

    bindings = [
        {"s": "http://ex/a#x", "p": "name", "o": "ada"},
        {"s": "http://ex/a#x", "p": "age", "o": "1"},
        {"s": "http://ex/b#y", "p": "name", "o": "bob"},
        {"s": "http://ex/b#y", "p": "age", "o": "2"},
    ]
    calls = []

    def execute(query):
        import re
        m = re.search(r"LIMIT (\d+) OFFSET (\d+)", query)
        calls.append(query)
        off = int(m.group(2))
        return bindings[off:off + int(m.group(1))]

    out = read_sparql_source(
        spark, execute, SparqlSourceConfig(page_size=3),
        predicates=["name", "age"])
    rows = {r["_key"]: (r["name"], r["age"]) for r in out.collect()}
    # subject split across page boundary still merges into one doc
    assert rows == {"x": ("ada", "1"), "y": ("bob", "2")}
    assert len(calls) == 2  # paginated: full page then short page

    with pytest.raises(ValueError):
        read_sparql_source(spark, lambda q: [], SparqlSourceConfig())
