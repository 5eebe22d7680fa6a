"""PCA over embedding columns: one-pass distributed fit, codegen apply.

Dimensionality reduction is the standard pre-step before large-scale
vector search (PCA'd-then-quantized pipelines — Jégou et al. 2011 §V
apply PQ after a rotation/projection; IVF probes get cheaper in the
reduced space). No reference analogue.

100 TB shape:

- **fit** is ONE Arrow-batched pass: each partition emits a single
  (count, sum, sum-of-outer-products) partial — d*(d+1)/2 + d + 1 doubles
  — and the driver combines the P partials and eigendecomposes the d x d
  covariance with numpy. Nothing quadratic in n ever shuffles; the d x d
  combine is the classic treeAggregate shape. Bounded by d (fine through
  d ~ 2048, i.e. every production embedding width).
- **apply** is pure codegen: each output dimension is one
  ``aggregate(zip_with(vec - mean, component))`` over an array literal —
  the O(k) expression-tree trick from ops/simsearch.lsh_bucket_expr. No
  Python, no shuffle; the projection rides whatever scan it's attached to.

Determinism: the fit's partial sums are float64 and their combine order
is fixed (sorted partition id), so refits on the same layout agree;
eigenvector SIGN is canonicalized (largest-|coefficient| entry positive).
The APPLY path on frozen literal components is bit-identical across
engines: index-order fold == DuckDB's list_inner_product.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graflo_spark.ops.simsearch import dot_expr


@dataclass
class PcaModel:
    mean: list[float]           # d
    components: list[list[float]]   # k rows, each d (orthonormal)
    explained_variance: list[float]  # k eigenvalues, descending

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> PcaModel:
    """Fit PCA in one distributed pass (per-partition moment partials ->
    driver eigendecomposition). The collect is P rows of d^2-bounded
    partials — index metadata, not data."""
    import numpy as np

    schema = ("pid long, n long, s array<double>, "
              "outer array<double>")

    def partials(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        s = None
        outer = None
        for pdf in batches:
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if vecs.size == 0:
                continue
            n += vecs.shape[0]
            bs = vecs.sum(axis=0)
            bo = vecs.T @ vecs
            s = bs if s is None else s + bs
            outer = bo if outer is None else outer + bo
        if n:
            yield pd.DataFrame({
                "pid": [pid], "n": [n], "s": [s.tolist()],
                "outer": [outer.reshape(-1).tolist()],
            })

    parts = df.select(vec_col).mapInPandas(partials, schema=schema).collect()
    if not parts:
        raise ValueError("fit_pca: empty input")
    n = sum(p["n"] for p in parts)
    d = len(parts[0]["s"])
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    s = np.zeros(d)
    outer = np.zeros((d, d))
    for p in sorted(parts, key=lambda r: r["pid"]):  # fixed combine order
        s += np.asarray(p["s"])
        outer += np.asarray(p["outer"]).reshape(d, d)
    mean = s / n
    cov = outer / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for i in order:
        v = evecs[:, i]
        # sign canonicalization: largest-|coeff| entry positive
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v.tolist())
    return PcaModel(
        mean=mean.tolist(),
        components=comps,
        explained_variance=[float(evals[i]) for i in order],
    )


def project_expr(vec: Column, model: PcaModel) -> Column:
    """``array<double>`` projection of ``vec`` onto the model's components
    — k literal-array dot products over the centered vector, all codegen."""
    centered = F.zip_with(
        vec, F.lit(model.mean), lambda x, m: x.cast("double") - m)
    return F.array(*[
        dot_expr(centered, F.lit(comp)) for comp in model.components
    ])


def apply_pca(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    return df.withColumn(out_col, project_expr(F.col(vec_col), model))
