"""PCA (ops/pca.py): distributed one-pass fit == numpy, orthonormal
components in descending variance order, codegen projection parity, and
layout stability."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graflo_spark.ops import pca as pc


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def X(emb):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    return np.array([np.asarray(r.embedding, dtype=np.float64)
                     for r in rows])


def _numpy_pca(X, k):
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / X.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for i in order:
        v = evecs[:, i]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    return mu, np.array(comps), evals[order]


def test_fit_matches_numpy(emb, X):
    model = pc.fit_pca(emb, "embedding", k=6)
    mu, comps, evals = _numpy_pca(X, 6)
    assert np.allclose(model.mean, mu, atol=1e-12)
    assert np.allclose(model.explained_variance, evals, atol=1e-12)
    assert np.allclose(model.components, comps, atol=1e-8)


def test_components_orthonormal_and_ordered(emb):
    model = pc.fit_pca(emb, "embedding", k=5)
    C = np.array(model.components)
    assert np.allclose(C @ C.T, np.eye(5), atol=1e-10)
    ev = model.explained_variance
    assert all(a >= b for a, b in zip(ev, ev[1:]))
    assert all(v > 0 for v in ev)


def test_fit_layout_stable(emb):
    a = pc.fit_pca(emb.repartition(2), "embedding", k=3)
    b = pc.fit_pca(emb.repartition(7, "vec_id"), "embedding", k=3)
    assert np.allclose(a.mean, b.mean, atol=1e-12)
    assert np.allclose(a.components, b.components, atol=1e-8)


def test_apply_matches_numpy(emb, X):
    model = pc.fit_pca(emb, "embedding", k=4)
    out = sorted(pc.apply_pca(emb, model).select("vec_id", "pca").collect(),
                 key=lambda r: r.vec_id)
    ref = (X - np.asarray(model.mean)) @ np.asarray(model.components).T
    got = np.array([r.pca for r in out])
    assert np.allclose(got, ref, atol=1e-12)


def test_projection_preserves_topk_better_than_random(emb, X):
    """PCA-space cosine ordering correlates with full-space ordering —
    sanity that the projection is the variance-maximizing one, not noise.
    (The synthetic embeddings are near-isotropic, so demand only a clearly
    better-than-random overlap, not high recall.)"""
    model = pc.fit_pca(emb, "embedding", k=16)
    P = (X - np.asarray(model.mean)) @ np.asarray(model.components).T

    def topk(M, q, k=10):
        sims = M @ M[q] / (np.linalg.norm(M, axis=1) * np.linalg.norm(M[q]))
        sims[q] = -np.inf
        return set(np.argsort(-sims)[:k])

    overlap = np.mean([
        len(topk(X, q) & topk(P, q)) / 10 for q in range(5)])
    random_overlap = 10 / (X.shape[0] - 1)
    assert overlap > 3 * random_overlap


def test_fit_sample_bounded_and_deterministic(emb):
    """max_sample < n: the fit runs on the seeded sample only and two
    invocations are bit-identical (fixed seed + layout + combine order)."""
    a = pc.fit_pca(emb, "embedding", k=3, max_sample=400)
    b = pc.fit_pca(emb, "embedding", k=3, max_sample=400)
    assert a.mean == b.mean
    assert a.components == b.components
    C = np.array(a.components)
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-10)
    assert all(v > 0 for v in a.explained_variance)


def test_fit_partials_bounded(emb):
    """max_partials caps the driver collect regardless of input tasks —
    and changes nothing but float grouping (1-ulp territory)."""
    a = pc.fit_pca(emb.repartition(16), "embedding", k=3, max_partials=2)
    b = pc.fit_pca(emb, "embedding", k=3)
    assert np.allclose(a.mean, b.mean, atol=1e-12)
    assert np.allclose(a.components, b.components, atol=1e-8)


def test_fit_cancellation_safe_with_large_offset(spark):
    """A big shared offset (embedding columns often carry one) must not
    corrupt the one-pass covariance: the pivot shift keeps E[yy^T] O(1)
    where the unshifted form loses all variance digits at offset 1e8."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 6))
    X[:, 0] *= 4.0
    X[:, 1] *= 2.0
    Xoff = X + 1e8
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(Xoff)],
        "vec_id long, embedding array<double>")
    model = pc.fit_pca(df, "embedding", k=2)
    mu, comps, evals = _numpy_pca(Xoff, 2)
    assert np.allclose(model.mean, mu, rtol=1e-12)
    assert np.allclose(model.components, comps, atol=1e-6)
    assert np.allclose(model.explained_variance, evals, rtol=1e-6)


def test_fit_validation(spark, emb):
    with pytest.raises(ValueError):
        pc.fit_pca(emb, "embedding", k=0)
    with pytest.raises(ValueError):
        pc.fit_pca(emb, "embedding", k=10_000)
    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError):
        pc.fit_pca(empty, "embedding", k=2)


def test_fit_pca_null_vectors_filtered(spark):
    """A NULL first vector must not poison the pivot (advisor finding):
    NULL rows are dropped before the moment pass, and the fit equals the
    fit over the non-null subset."""
    import numpy as np

    from graflo_spark.ops.pca import fit_pca

    rows = [(0, None), (1, [1.0, 2.0, 3.0]), (2, [2.0, 1.0, 0.0]),
            (3, None), (4, [0.5, 0.5, 4.0]), (5, [3.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    clean = df.filter(F.col("embedding").isNotNull())
    got = fit_pca(df, k=2)
    ref = fit_pca(clean, k=2)
    assert np.allclose(got.mean, ref.mean)
    assert np.allclose(got.components, ref.components)


def test_fit_pca_empty_and_overaggressive_sample_messages(spark):
    import pytest

    from graflo_spark.ops.pca import fit_pca

    empty = spark.createDataFrame([], "id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        fit_pca(empty)
    all_null = spark.createDataFrame(
        [(0, None), (1, None)], "id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null vectors"):
        fit_pca(all_null)
    # a sample fraction so small the Bernoulli draw returns nothing must
    # say so, not claim the input was empty. Which seed drains the draw
    # depends on the partition layout, so scan a few: at fraction 1/200
    # each seed is empty w.p. ~0.37, so 50 misses is ~1e-22.
    many = spark.range(200).select(
        F.array(F.col("id").cast("double")).alias("embedding"))
    for seed in range(50):
        try:
            fit_pca(many, k=1, max_sample=1, seed=seed)
        except ValueError as e:
            assert "Bernoulli sample came back" in str(e)
            break
    else:
        raise AssertionError("no seed produced an empty sample")
