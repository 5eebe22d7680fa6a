"""Command-line surface (reference graflo/cli/: ingest.py,
migrate_schema.py plan/apply, plot_manifest.py — click there, stdlib
argparse here; same verbs).

Usage::

    python -m graflo_spark.cli ingest --manifest m.yaml --store /graph \\
        --source customer=/data/customer.parquet --source orders=/data/orders.parquet
    python -m graflo_spark.cli migrate-schema plan --old a.yaml --new b.yaml
    python -m graflo_spark.cli migrate-schema apply --old a.yaml --new b.yaml --store /graph
    python -m graflo_spark.cli plot-manifest m.yaml -o manifest.dot
    python -m graflo_spark.cli export-rdf m.yaml -o manifest.nt
    python -m graflo_spark.cli import-rdf manifest.nt -o m.yaml
    python -m graflo_spark.cli prepare-training-data --docs corpus.parquet \\
        --benchmark evalset.parquet --output /out --split train=0.95 --split val=0.05
"""

from __future__ import annotations

import argparse
import sys


def _load_manifest(path: str):
    from graflo_spark.yaml_io import load_manifest

    return load_manifest(path)


def cmd_ingest(args) -> int:
    from graflo_spark.engine import GraphEngine
    from graflo_spark.io import read_source
    from graflo_spark.session import get_spark

    m = _load_manifest(args.manifest)
    spark = get_spark("graflo-ingest")
    pairs = []
    sources = dict(kv.split("=", 1) for kv in args.source)
    for res in m.resources:
        if res.name not in sources:
            if args.strict:
                print(f"no source for resource {res.name!r}", file=sys.stderr)
                return 2
            continue
        pairs.append((res, read_source(spark, sources[res.name])))
    engine = GraphEngine(spark, m.schema, args.store)
    engine.define_and_ingest(pairs, recreate=args.recreate)
    engine.export_graph().counts().show(200, truncate=False)
    return 0


def cmd_migrate_plan(args) -> int:
    from graflo_spark import evolve

    old = _load_manifest(args.old).schema
    new = _load_manifest(args.new).schema
    for op in evolve.diff(old, new):
        print(type(op).__name__, vars(op))
    return 0


def cmd_migrate_apply(args) -> int:
    from graflo_spark import evolve
    from graflo_spark.session import get_spark
    from graflo_spark.store import GraphStore

    old = _load_manifest(args.old).schema
    new = _load_manifest(args.new).schema
    plan = evolve.diff(old, new)
    store = GraphStore(get_spark("graflo-migrate"), args.store, old)
    evolve.apply_plan(old, plan, store=store)
    print(f"applied {len(plan)} ops to {args.store}")
    return 0


def cmd_plot(args) -> int:
    from graflo_spark.plot import manifest_to_dot

    dot = manifest_to_dot(
        _load_manifest(args.manifest),
        include_fields=not args.no_fields,
        include_resources=not args.no_resources,
    )
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(dot)
    else:
        print(dot, end="")
    return 0


def cmd_export_rdf(args) -> int:
    from graflo_spark.rdf_manifest import save_manifest_rdf

    save_manifest_rdf(_load_manifest(args.manifest), args.output)
    return 0


def cmd_import_rdf(args) -> int:
    from graflo_spark.rdf_manifest import load_manifest_rdf
    from graflo_spark.yaml_io import save_manifest

    save_manifest(load_manifest_rdf(args.input), args.output)
    return 0


def cmd_prepare(args) -> int:
    from graflo_spark.io import read_source
    from graflo_spark.ops.pipeline import PipelineConfig, prepare_training_data
    from graflo_spark.session import get_spark

    spark = get_spark("graflo-prepare")
    docs = read_source(spark, args.docs)
    bench = read_source(spark, args.benchmark) if args.benchmark else None
    splits = {}
    for kv in args.split or ["train=0.9", "val=0.05", "test=0.05"]:
        name, w = kv.split("=", 1)
        splits[name] = float(w)
    cfg = PipelineConfig(
        id_col=args.id_col, text_col=args.text_col, url_col=args.url_col,
        min_quality=args.min_quality, min_tokens=args.min_tokens,
        decontam_ngram=args.decontam_ngram,
        near_dup_threshold=args.near_dup_threshold,
        max_cross_entropy=args.max_cross_entropy,
        chunk_tokens=args.chunk_tokens, splits=splits,
    )
    chunks, annotated, funnel = prepare_training_data(docs, bench, cfg)
    annotated.write.mode("overwrite").parquet(f"{args.output}/annotated")
    chunks.write.mode("overwrite").parquet(f"{args.output}/chunks")
    funnel.orderBy("stage").show(50, truncate=False)
    return 0


def cmd_analyze(args) -> int:
    """Graph analytics over a persisted store: the schema is bootstrapped
    from the store's own graph_schema.json (written by
    apply_target_schema), so no manifest file is needed at read time."""
    import json
    import os

    from pyspark.sql import functions as F

    from graflo_spark.manifest import CoreSchema, Edge, Field, Vertex
    from graflo_spark.session import get_spark
    from graflo_spark.store import GraphStore

    spark = get_spark("graflo-analyze")
    with open(os.path.join(args.store, "graph_schema.json")) as f:
        meta = json.load(f)
    schema = CoreSchema(
        vertices=[
            Vertex(n, [Field(fl) for fl in v["fields"]],
                   identity=v["identity"])
            for n, v in meta["vertices"].items()
        ],
        edges=[
            Edge(e["source"], e["target"], relation=e.get("relation"))
            for e in meta["edges"]
        ],
    )
    store = GraphStore(spark, args.store, schema)
    if getattr(args, "graph_version", None) is not None:
        # graph-level time travel: analytics over the CONSISTENT snapshot
        # one atomic graph commit pinned (0 = latest committed graph)
        view = store.as_view_at(args.graph_version or None)
    else:
        view = store.as_view()
    rels = args.relations or None
    if args.metric == "pagerank":
        out = view.pagerank(relations=rels).orderBy(F.col("rank").desc())
    elif args.metric == "components":
        out = view.connected_components(relations=rels)
    elif args.metric == "communities":
        out = view.label_propagation(relations=rels)
    else:  # triangles
        out = view.triangle_count(relations=rels, per_node=True).orderBy(
            F.col("n_triangles").desc())
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.top, truncate=False)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="graflo-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="run a manifest's resources into a graph store")
    ing.add_argument("--manifest", required=True)
    ing.add_argument("--store", required=True)
    ing.add_argument("--source", action="append", default=[],
                     metavar="RESOURCE=PATH")
    ing.add_argument("--recreate", action="store_true")
    ing.add_argument("--strict", action="store_true",
                     help="fail when a resource has no bound source")
    ing.set_defaults(fn=cmd_ingest)

    mig = sub.add_parser("migrate-schema", help="diff two manifests")
    msub = mig.add_subparsers(dest="subcmd", required=True)
    plan = msub.add_parser("plan")
    plan.add_argument("--old", required=True)
    plan.add_argument("--new", required=True)
    plan.set_defaults(fn=cmd_migrate_plan)
    apply_ = msub.add_parser("apply")
    apply_.add_argument("--old", required=True)
    apply_.add_argument("--new", required=True)
    apply_.add_argument("--store", required=True)
    apply_.set_defaults(fn=cmd_migrate_apply)

    plot = sub.add_parser("plot-manifest", help="emit Graphviz DOT")
    plot.add_argument("manifest")
    plot.add_argument("-o", "--output")
    plot.add_argument("--no-fields", action="store_true")
    plot.add_argument("--no-resources", action="store_true")
    plot.set_defaults(fn=cmd_plot)

    erdf = sub.add_parser("export-rdf", help="manifest -> N-Triples")
    erdf.add_argument("manifest")
    erdf.add_argument("-o", "--output", required=True)
    erdf.set_defaults(fn=cmd_export_rdf)

    irdf = sub.add_parser("import-rdf", help="N-Triples -> YAML manifest")
    irdf.add_argument("input")
    irdf.add_argument("-o", "--output", required=True)
    irdf.set_defaults(fn=cmd_import_rdf)

    prep = sub.add_parser(
        "prepare-training-data",
        help="hygiene+dedup+split+pack a document corpus; writes "
        "annotated/ and chunks/ parquet plus a funnel report",
    )
    prep.add_argument("--docs", required=True)
    prep.add_argument("--output", required=True)
    prep.add_argument("--benchmark", help="eval-set source for decontamination")
    prep.add_argument("--id-col", default="doc_id")
    prep.add_argument("--text-col", default="text")
    prep.add_argument("--url-col")
    prep.add_argument("--min-quality", type=float, default=0.5)
    prep.add_argument("--min-tokens", type=int, default=5)
    prep.add_argument("--decontam-ngram", type=int, default=13,
                      help="overlap n-gram size (13 = GPT-3-style standard)")
    prep.add_argument("--near-dup-threshold", type=float, default=0.7)
    prep.add_argument("--max-cross-entropy", type=float,
                      help="CCNet-style LM fluency gate (nats/bigram); "
                      "omit to disable")
    prep.add_argument("--chunk-tokens", type=int, default=2048)
    prep.add_argument("--split", action="append", metavar="NAME=WEIGHT")
    prep.set_defaults(fn=cmd_prepare)

    ana = sub.add_parser(
        "analyze-graph",
        help="graph analytics over a persisted store: pagerank, connected "
        "components, label-propagation communities, per-node triangles",
    )
    ana.add_argument("--store", required=True)
    ana.add_argument(
        "--metric", default="pagerank",
        choices=["pagerank", "components", "communities", "triangles"])
    ana.add_argument("--relations", action="append",
                     help="restrict to these edge relations")
    ana.add_argument("--output", help="write parquet instead of showing")
    ana.add_argument("--top", type=int, default=20)
    ana.add_argument(
        "--graph-version", type=int, dest="graph_version",
        help="analyze the consistent snapshot pinned by this atomic "
        "graph-level commit (0 = latest committed graph; omit to read "
        "each table's newest version independently)")
    ana.set_defaults(fn=cmd_analyze)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
