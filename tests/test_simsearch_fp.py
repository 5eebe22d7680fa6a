"""IVF top-k and winnowing fingerprint tests."""

from pyspark.sql import functions as F

from graflo_spark.ops import simsearch as ss
from graflo_spark.ops import textstats as ts


def test_ivf_full_probe_equals_brute_force(spark, tables):
    """n_probe == n_centroids means no pruning: IVF must return exactly the
    brute-force top-k (validates all the plumbing around the pruning)."""
    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3)
    brute = ss.brute_force_topk(queries, emb, k=5)
    ivf = ss.ivf_topk(queries, emb, k=5, n_centroids=4, n_probe=4)
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in brute.collect()}
    i = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ivf.collect()}
    assert b == i


def test_ivf_driver_fit_matches_brute_and_mllib_at_full_probe(
        spark, tables):
    """r14: build_ivf_index fits driver-side below the row bound. Under
    ANY centroids a full probe is exact, so both fit paths must return
    exactly the brute-force top-k; the driver fit must also be
    deterministic (same data -> same centroids)."""
    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3)
    brute = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in ss.brute_force_topk(queries, emb, k=5).collect()}
    for dmax in (100_000, 0):
        ivf = ss.ivf_topk(queries, emb, k=5, n_centroids=4, n_probe=4)
        idx = ss.build_ivf_index(emb, n_centroids=4,
                                 driver_fit_max_rows=dmax)
        got = {(r["query_id"], r["rank"]): r["neighbor_id"]
               for r in ss.ivf_probe(idx, queries, k=5, n_probe=4).collect()}
        assert got == brute, dmax
    c1 = ss.build_ivf_index(emb, n_centroids=4).centroids.collect()
    c2 = ss.build_ivf_index(emb, n_centroids=4).centroids.collect()
    assert sorted(map(tuple, ((r["cluster"], tuple(r["centroid"]))
                              for r in c1))) == \
        sorted(map(tuple, ((r["cluster"], tuple(r["centroid"]))
                           for r in c2)))


def test_ivf_pruned_is_subset_shape(spark, tables):
    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3)
    out = ss.ivf_topk(queries, emb, k=5, n_centroids=8, n_probe=2).collect()
    assert all(1 <= r["rank"] <= 5 for r in out)
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_index_reused_across_query_batches_without_refit(
        spark, tables, monkeypatch, tmp_path):
    """The index lifecycle API: ONE build serves many query batches — no
    KMeans refit per probe (counted via a fit spy on BOTH fit paths: the
    r14 driver Lloyd's and the distributed MLlib fallback) — and the index
    survives a write/read round-trip partitioned by cluster."""
    from pyspark.ml.clustering import KMeans

    fits = []
    orig_fit = KMeans.fit
    monkeypatch.setattr(
        KMeans, "fit", lambda self, df: (fits.append(1), orig_fit(self, df))[1])
    orig_driver = ss._driver_kmeans_fit
    monkeypatch.setattr(
        ss, "_driver_kmeans_fit",
        lambda *a, **kw: (fits.append(1), orig_driver(*a, **kw))[1])

    emb = tables["embeddings"]
    index = ss.build_ivf_index(emb, n_centroids=4)
    batch1 = emb.filter(F.col("vec_id") < 3)
    batch2 = emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 6))
    got1 = ss.ivf_probe(index, batch1, k=5, n_probe=4).collect()
    got2 = ss.ivf_probe(index, batch2, k=5, n_probe=4).collect()
    assert len(fits) == 1, "probing must not refit KMeans"

    # full-probe == brute force, for both batches, through the same index
    for batch, got in ((batch1, got1), (batch2, got2)):
        brute = {(r["query_id"], r["rank"]): r["neighbor_id"]
                 for r in ss.brute_force_topk(batch, emb, k=5).collect()}
        assert {(r["query_id"], r["rank"]): r["neighbor_id"]
                for r in got} == brute

    # persistence: write partitioned-by-cluster, read back, same answers
    path = str(tmp_path / "ivf_index")
    index.write(path)
    import os
    assert any(d.startswith("cluster=") for d in os.listdir(f"{path}/assigned"))
    reread = ss.IvfIndex.read(spark, path)
    got1b = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in ss.ivf_probe(reread, batch1, k=5, n_probe=4).collect()}
    assert got1b == {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got1}
    assert len(fits) == 1


def test_ivf_probe_from_disk_gets_dynamic_partition_pruning(
        spark, tables, tmp_path):
    """The 100 TB payoff of IvfIndex.write's partitionBy(cluster): a probe
    against the on-disk index must show a dynamic-partition-pruning filter
    on `cluster` in the scan — the executor never opens files for clusters
    the query doesn't probe."""
    emb = tables["embeddings"]
    index = ss.build_ivf_index(emb, n_centroids=4)
    path = str(tmp_path / "ivf")
    index.write(path)
    reread = ss.IvfIndex.read(spark, path)
    out = ss.ivf_probe(reread, emb.filter(F.col("vec_id") < 2),
                       k=3, n_probe=1)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "dynamicpruningexpression(cluster" in plan, plan[:800]


def test_lsh_bucket_expr_wide_dim(spark):
    """Production embedding widths: at dim=1536 x 12 planes the bucket
    projection must (a) stay one whole-stage-codegen subtree — the r2
    per-dimension unrolled form was ~18k expression nodes and fell back to
    interpreted eval — and (b) agree exactly with a NumPy-free Python
    re-computation of the splitmix planes."""
    dim, n_planes = 1536, 12
    vecs = [
        [((v * 31 + i * 7) % 1000) / 500.0 - 1.0 for i in range(dim)]
        for v in range(4)
    ]
    df = spark.createDataFrame(
        [(v, vec) for v, vec in enumerate(vecs)], "id long, v array<double>")
    out = df.select("id", ss.lsh_bucket_expr(F.col("v"), dim, n_planes).alias("b"))

    expected = {}
    for v, vec in enumerate(vecs):
        bucket = 0
        for p in range(n_planes):
            dot = 0.0
            for i in range(dim):
                dot += vec[i] * ss._plane_component(p, i)
            if dot > 0:
                bucket |= 1 << p
        expected[v] = bucket
    assert {r["id"]: r["b"] for r in out.collect()} == expected

    # the codegen-span assertion needs compiled mode; the test session
    # runs interpreted (conftest) — toggle the runtime conf around a
    # fresh plan build
    prev = spark.conf.get("spark.sql.codegen.wholeStage")
    prev_fm = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    try:
        out2 = df.select(
            "id", ss.lsh_bucket_expr(F.col("v"), dim, n_planes).alias("b"))
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "codegen")
        s = out2._jdf.queryExecution().explainString(mode)
        assert "Found 1 WholeStageCodegen subtrees" in s, s.splitlines()[0]
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
        spark.conf.set("spark.sql.codegen.factoryMode", prev_fm)


def test_lsh_topk_multi_probe_raises_recall(spark, tables):
    """multi_probe=1 probes the query bucket plus all 1-bit-flip buckets:
    recall vs brute force must not drop (and on this fixture strictly
    rises), results contain no duplicate neighbors, ranks stay contiguous."""
    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 8)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in ss.brute_force_topk(queries, emb, k=5).collect()
    }

    def run(mp):
        rows = ss.lsh_topk(queries, emb, k=5, n_planes=8,
                           multi_probe=mp).collect()
        seen = set()
        per_q = {}
        for r in rows:
            key = (r["query_id"], r["neighbor_id"])
            assert key not in seen, "duplicate neighbor in top-k"
            seen.add(key)
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        for ranks in per_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
        return seen

    r0 = run(0) & brute
    r1 = run(1) & brute
    assert len(r1) >= len(r0)
    assert len(r1) > 0
    import pytest
    with pytest.raises(ValueError, match="multi_probe"):
        ss.lsh_topk(queries, emb, multi_probe=2)


def test_winnowing_shared_run_guarantee(spark):
    """Docs sharing a run of >= k + window - 1 chars share a fingerprint;
    identical docs have identical fingerprint sets."""
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "CCCCCC " + shared + " DDDD"),
        (3, shared),
        (4, "completely different content with no overlap at all zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = ts.winnowing_fingerprints(df, "doc_id", "text", k=7, window=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]  # shared run -> shared fingerprint
    assert by_doc[3] <= by_doc[1] | by_doc[2] or by_doc[3]
    assert not (by_doc[4] & by_doc[3])

    # determinism: same text -> same fingerprint set
    df2 = spark.createDataFrame([(9, shared)], "doc_id long, text string")
    fp2 = {r["fp"] for r in ts.winnowing_fingerprints(
        df2, "doc_id", "text", k=7, window=4).collect()}
    assert fp2 == by_doc[3]


def test_banded_lsh_near_dup_recall(spark, tables):
    """Banded LSH (16x2) at threshold 0.3 must recover nearly all exact
    pairs (theory: ~0.999 candidate prob at cosine 0.3), and every pair it
    returns must be a true pair (cosine is exact post-filter)."""
    from graflo_spark.ops import dedup as dd

    emb = tables["embeddings"]
    exact = {
        (r["id_a"], r["id_b"])
        for r in dd.embedding_near_dup_exact(
            emb, "vec_id", "embedding", threshold=0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dd.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.3,
            n_bands=16, band_planes=2).collect()
    }
    assert exact, "fixture should contain pairs at cosine >= 0.3"
    assert lsh <= exact  # no false positives: exact cosine filters candidates
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} below floor"


def test_ivf_index_extend_incremental_matches_full_build(spark):
    """IvfIndex.extend assigns new vectors to the EXISTING centroids (no
    refit); probing the extended index at n_probe == n_centroids equals
    brute force over the union — the recall-1 point where assignment
    bookkeeping is fully checkable."""
    import pyspark.sql.functions as F

    from graflo_spark.ops.simsearch import (
        assign_to_centroids, brute_force_topk, ivf_probe)

    base = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 5).cast("double"),
            F.lit(1.0)).alias("embedding"))
    fresh = spark.range(40, 60).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 5).cast("double"),
            F.lit(1.0)).alias("embedding"))
    cents = [[0.0, 0.0, 1.0], [6.0, 4.0, 1.0], [3.0, 2.0, 1.0]]
    idx = assign_to_centroids(base, cents)
    ext = idx.extend(fresh)
    assert ext.assigned.count() == 60
    # old assignments untouched
    old = {r["neighbor_id"]: r["cluster"] for r in idx.assigned.collect()}
    new = {r["neighbor_id"]: r["cluster"] for r in ext.assigned.collect()}
    assert all(new[k] == v for k, v in old.items())

    union = base.unionByName(fresh)
    queries = union.filter("vec_id IN (3, 47)")
    got = ivf_probe(ext, queries, k=5, n_probe=3)
    want = brute_force_topk(queries, union, k=5)
    g = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got.collect()}
    w = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want.collect()}
    assert g == w


# ------------------------------------------- mean-pool aggregation (r9)

def test_mean_pool_matches_numpy(spark, tables):
    import numpy as np
    from pyspark.sql import functions as F

    from graflo_spark.ops.simsearch import mean_pool_embeddings

    emb = tables["embeddings"].withColumn("g", F.col("vec_id") % 4)
    got = {r.g: r for r in mean_pool_embeddings(emb, "g").collect()}
    rows = emb.select("g", "embedding").collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(np.asarray(r.embedding, np.float64))
    for g, vecs in by_g.items():
        assert got[g].n_members == len(vecs)
        assert np.allclose(got[g].embedding,
                           np.mean(vecs, axis=0), atol=1e-9)


def test_mean_pool_normalize_and_null_groups(spark):
    import numpy as np
    from graflo_spark.ops.simsearch import mean_pool_embeddings

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (0, [3.0, 4.0]), (1, None)],
        "g long, embedding array<double>")
    out = {r.g: r for r in mean_pool_embeddings(
        df, "g", normalize=True).collect()}
    assert set(out) == {0}                      # all-NULL group dropped
    v = np.asarray(out[0].embedding)
    assert np.isclose(np.linalg.norm(v), 1.0)
    assert np.allclose(v, [0.6, 0.8])


def test_lsh_bucket_batch_matches_expr(spark):
    """The Arrow-batched bucket twins must be BIT-identical to the
    expression path — including degenerate rows (NULL vector, wrong
    length, NULL element), which hash to bucket 0 on both paths."""
    import random

    rng = random.Random(31)
    dim = 16
    rows = []
    for v in range(40):
        vec = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((v, vec))
    rows.append((100, None))                      # NULL vector
    rows.append((101, [0.5] * (dim - 3)))         # short vector
    rows.append((102, [0.5] * (dim + 2)))         # long vector
    rows.append((103, [None] + [0.5] * (dim - 1)))  # NULL element
    df = spark.createDataFrame(rows, "id long, v array<double>")

    expr = df.select(
        "id", ss.lsh_bucket_expr(F.col("v"), dim, 8).alias("b"))
    fast = df.select(
        "id", ss.lsh_bucket_batch(dim, 8)(F.col("v")).alias("b"))
    assert ({r["id"]: r["b"] for r in expr.collect()}
            == {r["id"]: r["b"] for r in fast.collect()})

    # banded form: element b == lsh_bucket_expr with plane_offset b*planes
    n_bands, band_planes = 5, 3
    expr_bands = df.select("id", F.array(*[
        ss.lsh_bucket_expr(F.col("v"), dim, band_planes,
                           plane_offset=b * band_planes)
        for b in range(n_bands)
    ]).alias("bs"))
    fast_bands = df.select("id", ss.lsh_band_batch(
        dim, band_planes, n_bands)(F.col("v")).alias("bs"))
    assert ({r["id"]: r["bs"] for r in expr_bands.collect()}
            == {r["id"]: list(r["bs"]) for r in fast_bands.collect()})
