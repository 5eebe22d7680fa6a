"""SemDedupStore: incremental semantic dedup (the embedding-side twin of
MinHashDedupStore, composed over IvfIndexStore) — incremental == one-shot
pair/cluster parity, replay idempotence, both crash windows, compaction,
threshold persistence, and the foreachBatch wrapper."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from graflo_spark.ops.dedup import SemDedupStore, semantic_dedup


def _frozen_centroids(emb, n=4):
    return [r["embedding"]
            for r in emb.orderBy("vec_id").limit(n).collect()]


def _batches(emb, n=3):
    return [emb.filter(F.col("vec_id") % n == i) for i in range(n)]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _fill(spark, tmp_path, emb, n_batches=3, threshold=0.4):
    cents = _frozen_centroids(emb)
    store = SemDedupStore(spark, str(tmp_path / "st"),
                          threshold=threshold, centroids=cents)
    for i, b in enumerate(_batches(emb, n_batches)):
        store.ingest_batch(b, batch_id=i)
    return store, cents


def test_semdedup_store_incremental_equals_oneshot(spark, tables, tmp_path):
    emb = tables["embeddings"]
    store, cents = _fill(spark, tmp_path, emb)
    oneshot = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.4, centroids=cents)
    assert store.duplicate_pairs().count() > 0   # non-degenerate corpus
    assert _rows(store.clusters()) == _rows(oneshot)
    # quality-aware representatives agree too
    scores = emb.select("vec_id", F.col("label").alias("score"))
    oneshot_s = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.4, centroids=cents,
        scores=scores)
    assert _rows(store.clusters(scores=scores)) == _rows(oneshot_s)


def test_semdedup_store_pair_set_equals_oneshot_pairs(spark, tables,
                                                      tmp_path):
    """The union of per-batch pair sets is EXACTLY the one-shot within-cell
    pair set — each pair enumerated once, when its later member arrives."""
    emb = tables["embeddings"]
    store, cents = _fill(spark, tmp_path, emb, n_batches=4)
    got = _rows(store.duplicate_pairs())
    assert got == sorted(set(got))               # no pair emitted twice
    from graflo_spark.ops.dedup import _normalized_cells, _pair_dot
    from graflo_spark.ops.simsearch import assign_to_centroids

    assigned = assign_to_centroids(emb, cents).assigned
    a = _normalized_cells(assigned, "id_a", "v_a")
    b = _normalized_cells(assigned, "id_b", "v_b")
    want = _rows(
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_pair_dot() >= F.lit(0.4))
        .select("id_a", "id_b"))
    assert got == want


def test_semdedup_store_replay_same_batch_id(spark, tables, tmp_path):
    """Post-commit replay: repeating the LAST committed batch_id re-runs
    under its original seq against strictly-pre-batch history — identical
    pairs, no growth, no self-matches against its own stored vectors."""
    emb = tables["embeddings"]
    store, _ = _fill(spark, tmp_path, emb)
    before_pairs = _rows(store.duplicate_pairs())
    before_clusters = _rows(store.clusters())
    last = _batches(emb)[-1]
    replay_out = store.ingest_batch(last, batch_id=2)
    assert store._vectors._state()[0] == 3       # seq did not move
    assert _rows(store.duplicate_pairs()) == before_pairs
    assert _rows(store.clusters()) == before_clusters
    # the replay's returned feed is the batch's original pair set
    orig = [p for p in before_pairs]
    assert set(_rows(replay_out)) <= set(orig)


def test_semdedup_store_pre_commit_crash_retry(spark, tables, tmp_path):
    """Death AFTER the pair write but BEFORE the vector commit: the retry
    overwrites the orphaned pair dir and lands the batch once."""
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = SemDedupStore(spark, str(tmp_path / "st"),
                          threshold=0.4, centroids=cents)
    bs = _batches(emb)
    store.ingest_batch(bs[0], batch_id=0)
    real_ingest = store._vectors.ingest_batch

    def boom(*a, **kw):
        raise RuntimeError("crash before vector commit")

    store._vectors.ingest_batch = boom
    with pytest.raises(RuntimeError, match="crash before"):
        store.ingest_batch(bs[1], batch_id=1)
    # pair dir for seq=1 exists but nothing is committed
    assert os.path.isdir(f"{store.path}/pairs/batch=1")
    assert store._vectors._state()[0] == 1
    store._vectors.ingest_batch = real_ingest
    store.ingest_batch(bs[1], batch_id=1)        # retry
    store.ingest_batch(bs[2], batch_id=2)
    oneshot = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.4, centroids=cents)
    assert _rows(store.clusters()) == _rows(oneshot)


def test_semdedup_store_compact_and_crash_window(spark, tables, tmp_path):
    emb = tables["embeddings"]
    store, cents = _fill(spark, tmp_path, emb, n_batches=5)
    before = _rows(store.clusters())
    proot = f"{store.path}/pairs"
    assert len(glob.glob(f"{proot}/batch=*")) == 5
    store.compact(full=True)
    vals = sorted(int(d.rsplit("=", 1)[1])
                  for d in glob.glob(f"{proot}/batch=*"))
    assert vals == [0, 4]                        # folded + replay window
    vroot = f"{store.path}/vectors/index/assigned"
    assert sorted(int(d.rsplit("=", 1)[1])
                  for d in glob.glob(f"{vroot}/batch=*")) == [0, 4]
    assert _rows(store.clusters()) == before
    # crash inside the pairs-root swap: restore on next read
    os.rename(proot, f"{store.path}/.old-pairs-deadbeef")
    assert _rows(store.clusters()) == before
    assert glob.glob(f"{proot}/batch=*")
    assert not glob.glob(f"{store.path}/.old-pairs-*")
    # replay window still overwrites in place after the fold
    store.ingest_batch(_batches(emb, 5)[-1], batch_id=4)
    assert _rows(store.clusters()) == before


def test_semdedup_store_tiered_compact_preserves_big_tier(spark, tables,
                                                          tmp_path):
    """Size-tiered fold on the pairs side: the consolidated dir enters the
    new root as hardlinks (same inodes), only the ready tier folds."""
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = SemDedupStore(spark, str(tmp_path / "st"),
                          threshold=0.4, centroids=cents)
    store.ingest_batch(emb.filter(F.col("vec_id") >= 40), batch_id="big")
    for i in range(1, 6):
        store.ingest_batch(
            emb.filter(F.col("vec_id") == i - 1), batch_id=i)
    store.compact(full=True)                     # one big consolidated dir
    for i in range(6, 11):
        store.ingest_batch(
            emb.filter(F.col("vec_id") == i - 2), batch_id=i)
    before = _rows(store.clusters())
    proot = f"{store.path}/pairs"
    # the VECTOR side's consolidated dir is genuinely a bigger tier (45
    # vectors vs 1-vector dirs) — it must enter the new root as hardlinks;
    # the pairs dirs are parquet-overhead-sized and may share one tier
    vroot = f"{store.path}/vectors/index/assigned"
    big_inos = {f: os.stat(f).st_ino
                for f in glob.glob(f"{vroot}/batch=0/*/*.parquet")}
    assert big_inos
    n_pair_dirs = len(glob.glob(f"{proot}/batch=*"))
    store.compact(min_run=4)
    for f, ino in big_inos.items():
        assert os.stat(f).st_ino == ino          # no rewrite of the big tier
    assert len(glob.glob(f"{proot}/batch=*")) < n_pair_dirs
    assert _rows(store.clusters()) == before


def test_semdedup_store_threshold_meta(spark, tables, tmp_path):
    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    with pytest.raises(ValueError, match="needs threshold"):
        SemDedupStore(spark, str(tmp_path / "fresh"), centroids=cents)
    store = SemDedupStore(spark, str(tmp_path / "st"),
                          threshold=0.4, centroids=cents)
    store.ingest_batch(emb.filter(F.col("vec_id") < 5), batch_id=0)
    with pytest.raises(ValueError, match="threshold=0.4"):
        SemDedupStore(spark, str(tmp_path / "st"), threshold=0.9)
    reopened = SemDedupStore(spark, str(tmp_path / "st"))
    assert reopened.threshold == 0.4             # adopted, with centroids
    assert reopened._vectors._centroids == [
        [float(x) for x in c] for c in cents]
    with pytest.raises(ValueError, match="empty SemDedupStore"):
        SemDedupStore(spark, str(tmp_path / "e2"), threshold=0.4,
                      centroids=cents).duplicate_pairs()


def test_stream_semantic_dedup_end_to_end(spark, tables, tmp_path):
    from graflo_spark.streaming import (
        replay_as_stream, stream_semantic_dedup)

    emb = tables["embeddings"]
    cents = _frozen_centroids(emb)
    store = SemDedupStore(spark, str(tmp_path / "st"),
                          threshold=0.4, centroids=cents)
    out_dir = str(tmp_path / "feed")
    q = stream_semantic_dedup(
        replay_as_stream(spark, emb.repartition(3)), store,
        str(tmp_path / "ckpt"), output_dir=out_dir)
    q.processAllAvailable()
    q.stop()
    oneshot = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.4, centroids=cents)
    assert _rows(store.clusters()) == _rows(oneshot)
    # the live feed carries exactly the store's pair set (appends may
    # duplicate only under replay, which processAllAvailable doesn't do)
    feed = spark.read.parquet(out_dir).select("id_a", "id_b").distinct()
    assert _rows(feed) == _rows(store.duplicate_pairs())


def test_semdedup_store_refit_then_replay_is_row_identical(spark, tables,
                                                           tmp_path):
    """refit() re-derives the replay-window batch's pairs under the NEW
    blocking (sharing ingest's assignment float path), so a post-commit
    replay of the last batch_id AFTER a refit overwrites both its dirs
    with row-identical content — pairs and clusters don't move."""
    emb = tables["embeddings"]
    store, _ = _fill(spark, tmp_path, emb)
    store.refit(n_centroids=4, seed=7)
    pairs_after_refit = _rows(store.duplicate_pairs())
    clusters_after_refit = _rows(store.clusters())
    assert pairs_after_refit                      # non-degenerate
    store.ingest_batch(_batches(emb)[-1], batch_id=2)   # replay post-refit
    assert store._vectors._state()[0] == 3              # seq did not move
    assert _rows(store.duplicate_pairs()) == pairs_after_refit
    assert _rows(store.clusters()) == clusters_after_refit
