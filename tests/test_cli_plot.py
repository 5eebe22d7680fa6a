"""CLI + DOT plot surface (reference graflo/cli/, plot/plotter.py)."""

import os

from graflo_spark import cli, plot, yaml_io

MANIFEST_YAML = """
schema:
  vertices:
    - name: customer
      fields: [{name: c_custkey, type: int}, c_name]
      identity: [c_custkey]
    - name: nation
      fields: [{name: n_nationkey, type: int}]
      identity: [n_nationkey]
  edges:
    - {source: customer, target: nation, relation: located_in}
resources:
  - name: customer
    steps:
      - vertex: customer
      - vertex:
          name: nation
          mapping: {n_nationkey: c_nationkey}
          extraction_scope: mapped_only
"""


def _write_manifest(tmp_path) -> str:
    p = str(tmp_path / "m.yaml")
    with open(p, "w") as fh:
        fh.write(MANIFEST_YAML)
    return p


def test_manifest_to_dot(tmp_path):
    m = yaml_io.loads_manifest(MANIFEST_YAML)
    dot = plot.manifest_to_dot(m)
    assert dot.startswith("digraph manifest {")
    assert '"customer"' in dot and '"nation"' in dot
    assert '"customer" -> "nation" [label="located_in"];' in dot
    assert "*c_custkey" in dot  # identity starred
    assert '"resource::customer" -> "customer"' in dot
    # schema-only render
    slim = plot.manifest_to_dot(m.schema, include_fields=False)
    assert "c_name" not in slim


def test_cli_plot_and_rdf_roundtrip(tmp_path, capsys):
    mpath = _write_manifest(tmp_path)
    dot_out = str(tmp_path / "m.dot")
    assert cli.main(["plot-manifest", mpath, "-o", dot_out]) == 0
    assert "digraph" in open(dot_out).read()

    nt = str(tmp_path / "m.nt")
    assert cli.main(["export-rdf", mpath, "-o", nt]) == 0
    back = str(tmp_path / "m2.yaml")
    assert cli.main(["import-rdf", nt, "-o", back]) == 0
    m1 = yaml_io.load_manifest(mpath)
    m2 = yaml_io.load_manifest(back)
    assert yaml_io.manifest_to_dict(m1) == yaml_io.manifest_to_dict(m2)


def test_cli_migrate_plan(tmp_path, capsys):
    old = _write_manifest(tmp_path)
    new_yaml = MANIFEST_YAML.replace("c_name", "c_name\n        - c_phone")
    new = str(tmp_path / "new.yaml")
    with open(new, "w") as fh:
        fh.write(new_yaml)
    assert cli.main(["migrate-schema", "plan", "--old", old, "--new", new]) == 0
    out = capsys.readouterr().out
    assert "AddPropertyOp" in out and "c_phone" in out


def test_cli_ingest_end_to_end(tmp_path, spark, sf_dir):
    mpath = _write_manifest(tmp_path)
    store_dir = str(tmp_path / "graph")
    src = os.path.join(sf_dir, "customer.parquet")
    rc = cli.main([
        "ingest", "--manifest", mpath, "--store", store_dir,
        "--source", f"customer={src}",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(store_dir, "vertices", "customer"))
    assert os.path.isdir(os.path.join(store_dir, "vertices", "nation"))


def test_cli_prepare_training_data(tmp_path, spark, sf_dir, capsys):
    out_dir = str(tmp_path / "prepared")
    docs = os.path.join(sf_dir, "documents.parquet")
    rc = cli.main([
        "prepare-training-data", "--docs", docs, "--output", out_dir,
        "--benchmark", docs,  # every doc overlaps itself -> all decontam'd
        "--chunk-tokens", "64", "--split", "train=1.0",
    ])
    assert rc == 0
    funnel_out = capsys.readouterr().out
    assert "decontam" in funnel_out
    ann = spark.read.parquet(f"{out_dir}/annotated")
    assert ann.filter("drop_stage IS NULL").count() == 0  # self-benchmark
    # clean run: no benchmark -> survivors exist and chunks cover them
    rc = cli.main([
        "prepare-training-data", "--docs", docs, "--output", out_dir,
        "--chunk-tokens", "64", "--split", "train=1.0",
    ])
    assert rc == 0
    chunks = spark.read.parquet(f"{out_dir}/chunks")
    kept = spark.read.parquet(f"{out_dir}/annotated").filter(
        "drop_stage IS NULL")
    assert chunks.select("id").distinct().count() == kept.count()


def test_cli_analyze_graph(spark, tmp_path):
    """analyze-graph bootstraps the schema from the store's own
    graph_schema.json and writes the requested metric as parquet."""
    from graflo_spark.cli import main
    from graflo_spark.manifest import CoreSchema, Edge, Field, Vertex
    from graflo_spark.store import GraphStore

    schema = CoreSchema(
        vertices=[Vertex("n", [Field("id")], identity=["id"])],
        edges=[Edge("n", "n", relation="to")],
    )
    root = str(tmp_path / "g")
    st = GraphStore(spark, root, schema)
    st.apply_target_schema()
    st.upsert_vertices("n", spark.createDataFrame(
        [(i,) for i in range(4)], "id long"))
    from graflo_spark.manifest import EdgeId
    st.insert_edges(EdgeId("n", "n", "to"), spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "_src_id long, _dst_id long"))

    out = str(tmp_path / "pr")
    assert main(["analyze-graph", "--store", root, "--metric", "pagerank",
                 "--output", out]) == 0
    pr = {r["node_key"]: r["rank"] for r in spark.read.parquet(out).collect()}
    assert len(pr) == 4 and all(v > 0 for v in pr.values())

    out2 = str(tmp_path / "tri")
    assert main(["analyze-graph", "--store", root, "--metric", "triangles",
                 "--output", out2]) == 0
    tri = {r["node_key"]: r["n_triangles"]
           for r in spark.read.parquet(out2).collect()}
    assert tri["n\x1f0"] == 1 and tri["n\x1f3"] == 0

    out3 = str(tmp_path / "comm")
    assert main(["analyze-graph", "--store", root, "--metric", "communities",
                 "--output", out3]) == 0
    assert spark.read.parquet(out3).count() == 4


def test_cli_analyze_graph_version_time_travel(spark, tmp_path):
    """--graph-version analyzes the CONSISTENT snapshot one atomic graph
    commit pinned: after a second batch grows the graph, analyzing at the
    first graph version still sees only the first batch's nodes."""
    from graflo_spark.cli import main
    from graflo_spark.container import GraphBatch
    from graflo_spark.manifest import CoreSchema, Edge, EdgeId, Field, Vertex
    from graflo_spark.store import GraphStore

    schema = CoreSchema(
        vertices=[Vertex("n", [Field("id")], identity=["id"])],
        edges=[Edge("n", "n", relation="to")],
    )
    root = str(tmp_path / "g")
    st = GraphStore(spark, root, schema)
    st.apply_target_schema()
    eid = EdgeId("n", "n", "to")

    def batch(ids, pairs):
        return GraphBatch(
            vertices={"n": spark.createDataFrame([(i,) for i in ids],
                                                 "id long")},
            edges={eid: spark.createDataFrame(
                pairs, "_src_id long, _dst_id long")})

    st.write_batch(batch(range(3), [(0, 1), (1, 2)]))
    g1 = st.graph_versions()[-1]
    st.write_batch(batch(range(3, 6), [(3, 4), (4, 5)]))

    out_old = str(tmp_path / "pr_old")
    assert main(["analyze-graph", "--store", root, "--metric", "pagerank",
                 "--graph-version", str(g1), "--output", out_old]) == 0
    assert spark.read.parquet(out_old).count() == 3  # first batch only

    out_new = str(tmp_path / "pr_new")
    assert main(["analyze-graph", "--store", root, "--metric", "pagerank",
                 "--graph-version", "0", "--output", out_new]) == 0
    assert spark.read.parquet(out_new).count() == 6  # 0 = latest commit
