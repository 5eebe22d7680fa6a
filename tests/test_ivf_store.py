"""IvfIndexStore: incremental dense-ANN index maintenance (the
embedding-side twin of retrieval.LexicalIndexStore) — incremental ==
one-shot probe parity, both crash windows, tiered + full compaction,
explicit refit, and the foreachBatch wrapper."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from graflo_spark.ops import simsearch as ss


def _frozen_centroids(emb, n=4):
    """Deterministic centroids: the first n embeddings by vec_id."""
    return [r["embedding"]
            for r in emb.orderBy("vec_id").limit(n).collect()]


def _probe(emb, index, k=5, n_probe=None):
    qs = emb.filter(F.col("vec_id") < 3)
    n_probe = n_probe or index.centroids.count()
    got = ss.ivf_probe(index, qs, k=k, n_probe=n_probe).collect()
    return sorted(
        ((r["query_id"], r["rank"], r["neighbor_id"],
          round(r["cosine"], 9)) for r in got))


def _batches(emb, n=3):
    """Split embeddings into n disjoint batches by vec_id mod n."""
    return [emb.filter(F.col("vec_id") % n == i) for i in range(n)]


def test_ivf_store_incremental_equals_oneshot(spark, tables, tmp_path):
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = ss.IvfIndexStore(spark, str(tmp_path / "st"), centroids=cents)
    for i, b in enumerate(_batches(emb)):
        store.ingest_batch(b, batch_id=i)
    oneshot = ss.assign_to_centroids(emb, cents)
    assert _probe(emb, store.as_index()) == _probe(emb, oneshot)
    # pruned probes agree too (same centroids, same assignment rule)
    assert _probe(emb, store.as_index(), n_probe=2) == _probe(
        emb, oneshot, n_probe=2)


def test_ivf_store_replay_same_batch_id(spark, tables, tmp_path):
    """Post-commit replay: repeating the LAST committed batch_id re-runs
    under its original seq — no double-indexing, identical probes."""
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = ss.IvfIndexStore(spark, str(tmp_path / "st"), centroids=cents)
    bs = _batches(emb)
    for i, b in enumerate(bs):
        store.ingest_batch(b, batch_id=i)
    before = _probe(emb, store.as_index())
    n_before = store.as_index().assigned.count()
    store.ingest_batch(bs[-1], batch_id=len(bs) - 1)   # replay
    assert store._state()[0] == len(bs)                # seq did not move
    assert store.as_index().assigned.count() == n_before
    assert _probe(emb, store.as_index()) == before


def test_ivf_store_compact_full_and_replay(spark, tables, tmp_path):
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = ss.IvfIndexStore(spark, str(tmp_path / "st"), centroids=cents)
    bs = _batches(emb, n=5)
    for i, b in enumerate(bs):
        store.ingest_batch(b, batch_id=i)
    before = _probe(emb, store.as_index())
    root = f"{store.path}/index/assigned"
    assert len(glob.glob(f"{root}/batch=*")) == 5
    store.compact(full=True)
    vals = sorted(int(d.rsplit("=", 1)[1])
                  for d in glob.glob(f"{root}/batch=*"))
    assert vals == [0, 4]   # folded + preserved replay window
    assert _probe(emb, store.as_index()) == before
    # replay window still overwrites in place after the fold
    store.ingest_batch(bs[-1], batch_id=4)
    assert _probe(emb, store.as_index()) == before


def test_ivf_store_tiered_compact_skips_big_tier(spark, tables, tmp_path):
    """Size-tiered fold: the big consolidated dir enters the new root as
    hardlinks (same inodes — no rewrite); only the small ready tier
    folds."""
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = ss.IvfIndexStore(spark, str(tmp_path / "st"), centroids=cents)
    big = emb.filter(F.col("vec_id") >= 40)
    store.ingest_batch(big, batch_id="big")
    for i in range(1, 6):
        store.ingest_batch(
            emb.filter(F.col("vec_id") == i - 1), batch_id=i)
    before = _probe(emb.filter(F.col("vec_id") < 45), store.as_index())
    root = f"{store.path}/index/assigned"
    big_inos = {f: os.stat(f).st_ino
                for f in glob.glob(f"{root}/batch=0/*/*.parquet")}
    assert big_inos
    store.compact(min_run=4)
    vals = sorted(int(d.rsplit("=", 1)[1])
                  for d in glob.glob(f"{root}/batch=*"))
    assert vals == [0, 1, 5]
    for f, ino in big_inos.items():
        assert os.stat(f).st_ino == ino
    assert _probe(
        emb.filter(F.col("vec_id") < 45), store.as_index()) == before


def test_ivf_store_crash_window_restores(spark, tables, tmp_path):
    """Death between compact()'s two renames leaves the store only under
    .old-index-*; the next access — read OR ingest — restores it."""
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = ss.IvfIndexStore(spark, str(tmp_path / "st"), centroids=cents)
    bs = _batches(emb, n=4)
    for i, b in enumerate(bs[:3]):
        store.ingest_batch(b, batch_id=i)
    before = _probe(emb, store.as_index())
    os.rename(f"{store.path}/index", f"{store.path}/.old-index-deadbeef")
    assert _probe(emb, store.as_index()) == before   # read-path restore
    assert glob.glob(f"{store.path}/index/assigned/batch=*")
    # the write path restores too: ingest into the crashed state
    os.rename(f"{store.path}/index", f"{store.path}/.old-index-crash2")
    os.makedirs(f"{store.path}/index/assigned")
    store.ingest_batch(bs[3], batch_id=3)
    got = store.as_index()
    assert got.assigned.count() == emb.count()
    assert not glob.glob(f"{store.path}/.old-index-*")  # stale swept


def test_ivf_store_refit_rebuilds_and_keeps_replay(spark, tables, tmp_path):
    emb = tables["embeddings"]
    # deliberately bad bootstrap centroids: refit must fix recall
    dim = len(emb.first()["embedding"])
    store = ss.IvfIndexStore(
        spark, str(tmp_path / "st"),
        centroids=[[float(i)] * dim for i in range(2)])
    bs = _batches(emb)
    for i, b in enumerate(bs):
        store.ingest_batch(b, batch_id=i)
    store.refit(n_centroids=4, seed=7)
    idx = store.as_index()
    assert idx.centroids.count() == 4
    assert idx.assigned.count() == emb.count()
    # full probe == brute force through the refit index
    qs = emb.filter(F.col("vec_id") < 3)
    brute = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in ss.brute_force_topk(qs, emb, k=5).collect()}
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ss.ivf_probe(idx, qs, k=5, n_probe=4).collect()}
    assert got == brute
    # post-commit replay after refit: overwrites its own dir, no growth
    n = idx.assigned.count()
    store.ingest_batch(bs[-1], batch_id=len(bs) - 1)
    assert store.as_index().assigned.count() == n
    # a reopened store adopts the refit centroids
    reopened = ss.IvfIndexStore(spark, str(tmp_path / "st"))
    assert len(reopened._centroids) == 4


def test_ivf_store_centroid_arg_validation(spark, tables, tmp_path):
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    with pytest.raises(ValueError, match="needs centroids"):
        ss.IvfIndexStore(spark, str(tmp_path / "fresh"))
    store = ss.IvfIndexStore(spark, str(tmp_path / "st"), centroids=cents)
    store.ingest_batch(emb.filter(F.col("vec_id") < 5), batch_id=0)
    # conflicting explicit centroids raise; matching and omitted are fine
    with pytest.raises(ValueError, match="persisted centroids"):
        ss.IvfIndexStore(spark, str(tmp_path / "st"),
                         centroids=[[0.0] * len(cents[0])] * 2)
    assert ss.IvfIndexStore(
        spark, str(tmp_path / "st"), centroids=cents)._centroids
    assert ss.IvfIndexStore(spark, str(tmp_path / "st"))._centroids
    with pytest.raises(ValueError, match="empty IvfIndexStore"):
        ss.IvfIndexStore(spark, str(tmp_path / "empty"),
                         centroids=cents).as_index()


def test_stream_ivf_index_end_to_end(spark, tables, tmp_path):
    from graflo_spark.streaming import replay_as_stream, stream_ivf_index

    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = ss.IvfIndexStore(spark, str(tmp_path / "st"), centroids=cents)
    q = stream_ivf_index(
        replay_as_stream(spark, emb.repartition(3)), store,
        str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert _probe(emb, store.as_index()) == _probe(
        emb, ss.assign_to_centroids(emb, cents))
