"""Exactly-once under micro-batch replay, proven at the STATE level
(r13 verdict Next #3): every streaming store commits under a
(seq, batch_id) protocol whose design promises that re-delivering an
already-committed batch id — foreachBatch retry semantics after a
sink-side failure — leaves the store state identical. The existing
per-store replay tests assert query-result identity; these assert the
stronger claim on the persisted state itself: every committed parquet
dir's CONTENT (sorted rows, parquet file names are legitimately
nondeterministic) and every state/meta file's BYTES are unchanged by
the replay.

Reference analogue: graflo's incremental writers re-run a delivery
under its original transaction id (hq/db_writer.py upsert semantics);
here the contract is carried by the stores' ``batch=<seq>`` overwrite
+ ``_seq`` compare (ops/simsearch.py:578, ops/retrieval.py:529,
ops/dedup.py:1057,1575, ops/packing.py:328).
"""

import os

from pyspark.sql import functions as F

from graflo_spark.ops import dedup as dd
from graflo_spark.ops import packing as pk
from graflo_spark.ops import retrieval as rt
from graflo_spark.ops import simsearch as ss


def _fingerprint(spark, root):
    """Canonical content of a store directory: {relpath: payload} where
    parquet leaf dirs contribute their sorted row set + column names and
    small state/meta files contribute raw bytes. Hidden dirs (in-flight
    staging / compact scratch) and Spark bookkeeping files are excluded —
    they are not part of the committed state."""
    out = {}
    for dirpath, dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        parts = [] if rel == "." else rel.split(os.sep)
        if any(p.startswith(".") for p in parts):
            dirnames[:] = []
            continue
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        pq = [f for f in filenames if f.endswith(".parquet")]
        if pq:
            df = spark.read.parquet(dirpath)
            rows = sorted(
                tuple("\x00null" if r[c] is None else str(r[c])
                      for c in sorted(df.columns))
                for r in df.collect())
            out[rel] = ("parquet", tuple(sorted(df.columns)), tuple(rows))
        for f in filenames:
            if f.endswith((".parquet", ".crc")) or f == "_SUCCESS":
                continue
            if f.startswith("."):
                continue
            with open(os.path.join(dirpath, f), "rb") as fh:
                out[os.path.join(rel, f)] = ("file", fh.read())
    assert out, f"empty fingerprint for {root} - wrong path?"
    return out


def _assert_replay_identical(spark, path, deliver, last_bid):
    """Commit → fingerprint → re-deliver the last batch id → fingerprint →
    assert the persisted state is content-identical, key by key."""
    before = _fingerprint(spark, path)
    deliver(last_bid)   # the foreachBatch retry: same batch id, same data
    after = _fingerprint(spark, path)
    assert sorted(before) == sorted(after), (
        f"replay changed the file set: only-before="
        f"{sorted(set(before) - set(after))} only-after="
        f"{sorted(set(after) - set(before))}")
    for k in before:
        assert before[k] == after[k], f"replay changed {k}: " \
            f"{before[k]!r} != {after[k]!r}"


def _docs(spark):
    rows = [(i, f"alpha beta gamma doc{i} " + "common tail " * (i % 3 + 1),
             10 + i) for i in range(12)]
    return spark.createDataFrame(rows, "doc_id int, text string, n_tok int")


def _vecs(spark):
    rows = [(i, [float((i * 7 + j * 3) % 5) / 4.0 for j in range(8)])
            for i in range(12)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def _batches(df, col, n=3):
    return [df.filter(F.col(col) % n == i) for i in range(n)]


def test_ivf_store_replay_state_identical(spark, tmp_path):
    vecs = _vecs(spark)
    cents = [r["embedding"] for r in vecs.limit(3).collect()]
    store = ss.IvfIndexStore(spark, str(tmp_path / "ivf"), centroids=cents)
    bs = _batches(vecs, "vec_id")
    for i, b in enumerate(bs):
        store.ingest_batch(b, batch_id=i)
    _assert_replay_identical(
        spark, store.path, lambda bid: store.ingest_batch(bs[-1], batch_id=bid),
        len(bs) - 1)


def test_lexical_store_replay_state_identical(spark, tmp_path):
    docs = _docs(spark)
    store = rt.LexicalIndexStore(spark, str(tmp_path / "lex"), n_buckets=4)
    bs = _batches(docs, "doc_id")
    for i, b in enumerate(bs):
        store.ingest_batch(b, batch_id=i)
    _assert_replay_identical(
        spark, store.path, lambda bid: store.ingest_batch(bs[-1], batch_id=bid),
        len(bs) - 1)


def test_semdedup_store_replay_state_identical(spark, tmp_path):
    vecs = _vecs(spark)
    cents = [r["embedding"] for r in vecs.limit(3).collect()]
    store = dd.SemDedupStore(spark, str(tmp_path / "sem"),
                             threshold=0.9, centroids=cents)
    bs = _batches(vecs, "vec_id")
    for i, b in enumerate(bs):
        store.ingest_batch(b, batch_id=i)
    _assert_replay_identical(
        spark, str(tmp_path / "sem"),
        lambda bid: store.ingest_batch(bs[-1], batch_id=bid), len(bs) - 1)


def test_line_dedup_store_replay_state_identical(spark, tmp_path):
    docs = _docs(spark)
    store = dd.LineDedupStore(spark, str(tmp_path / "line"))
    bs = _batches(docs, "doc_id")
    for i, b in enumerate(bs):
        store.scrub_batch(b, batch_id=i).collect()

    def deliver(bid):
        store.scrub_batch(bs[-1], batch_id=bid).collect()

    _assert_replay_identical(spark, store.path, deliver, len(bs) - 1)


def test_packing_store_replay_state_identical(spark, tmp_path):
    docs = _docs(spark)
    store = pk.PackingStore(spark, str(tmp_path / "pack"), chunk_tokens=64)
    bs = _batches(docs, "doc_id")
    for i, b in enumerate(bs):
        store.pack_batch(b, batch_id=i)

    def deliver(bid):
        store.pack_batch(bs[-1], batch_id=bid)

    _assert_replay_identical(spark, store.path, deliver, len(bs) - 1)


def test_graph_store_reupsert_same_rows_version_only(spark, tmp_path):
    """The GraphStore twin: re-upserting an identical batch is not a
    replay protocol (no batch ids — OCC versions instead) but must be
    CONTENT-idempotent: a new version is committed, yet the reader-visible
    rows are unchanged. Guards the merge-on-identity upsert against
    accidental row duplication under redelivery."""
    from graflo_spark.manifest import CoreSchema, Field, FieldType, Vertex
    from graflo_spark.store import GraphStore

    schema = CoreSchema(
        vertices=[Vertex("person", [Field("pid", FieldType.INT),
                                    Field("nm")], identity=["pid"])],
        edges=[])
    store = GraphStore(spark, str(tmp_path / "g"), schema)
    store.apply_target_schema()
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "pid int, nm string")
    store.upsert_vertices("person", batch)
    before = sorted((r["pid"], r["nm"])
                    for r in store.read_vertices("person").collect())
    store.upsert_vertices("person", batch)   # redelivery
    after = sorted((r["pid"], r["nm"])
                   for r in store.read_vertices("person").collect())
    assert before == after == [(1, "a"), (2, "b")]
