"""PCA over embedding columns: one-pass distributed fit, codegen apply.

Dimensionality reduction is the standard pre-step before large-scale
vector search (PCA'd-then-quantized pipelines — Jégou et al. 2011 §V
apply PQ after a rotation/projection; IVF probes get cheaper in the
reduced space). No reference analogue.

100 TB shape:

- **fit** is ONE Arrow-batched pass over a BOUNDED input: corpora larger
  than ``max_sample`` rows are seeded-Bernoulli-sampled first (expected
  sample size ``max_sample``; a per-partition filter — no shuffle, no
  LIMIT, parallelism preserved. PCA on a sample is standard practice —
  the train_pq/train_bpe precedent; the apply path is frozen-literal and
  scale-free either way), and the sampled frame is coalesced to at most
  ``max_partials`` partitions (no shuffle), so the driver collect is
  <= max_partials * d^2 doubles — with the 256-partial default that is
  ~8 GB worst case at d=2048 and single-digit MBs at typical test
  widths — never one partial per input task. Each partition emits a
  single (count, sum, sum-of-outer-products) partial; the driver
  combines and eigendecomposes the d x d covariance with numpy. Nothing
  quadratic in n ever shuffles.
- **cancellation-safe**: moments accumulate over PIVOT-SHIFTED vectors
  (x - x_first) so the one-pass E[yy^T] - mean_y*mean_y^T form cannot
  catastrophically cancel when a large shared offset dominates the
  variance (common for embedding columns); the pivot shift changes no
  eigenvector mathematically, only conditioning.
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
    *,
    max_sample: int | None = 1_048_576,
    max_partials: int = 256,
    seed: int = 13,
) -> PcaModel:
    """Fit PCA on a bounded, pivot-shifted moment pass (see module notes).

    ``max_sample``: EXPECTED row bound for the fit — corpora larger than
    it are seeded-Bernoulli-sampled down first (``sample(fraction)``
    only: a per-partition filter that keeps parallelism; a LIMIT here
    would funnel the whole sample through one partition AND truncate an
    arbitrary shuffle-order-dependent subset). None disables.
    Deterministic for a fixed seed and input layout. ``max_partials``:
    the (sampled) frame is coalesced to at most this many partitions,
    which bounds the driver collect to ``max_partials`` d^2-sized
    partials regardless of how many tasks scanned the input."""
    import numpy as np

    schema = ("pid long, n long, s array<double>, "
              "outer array<double>")

    # NULL vectors carry no moment information and a NULL pivot would
    # crash numpy with an opaque TypeError — drop them up front
    vecs = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    sampled = False
    if max_sample is not None:
        n_total = vecs.count()
        if n_total == 0:
            raise ValueError("fit_pca: empty input (no non-null vectors)")
        if n_total > max_sample:
            vecs = vecs.sample(fraction=max_sample / n_total, seed=seed)
            sampled = True
    vecs = vecs.coalesce(max_partials)

    head = vecs.head()
    if head is None:
        if sampled:
            raise ValueError(
                "fit_pca: the seeded Bernoulli sample came back empty — "
                f"max_sample={max_sample} is too aggressive for this "
                "input; raise it or pass max_sample=None")
        raise ValueError("fit_pca: empty input (no non-null vectors)")
    pivot = np.asarray(head[0], dtype=np.float64)

    def partials(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        s = None
        outer = None
        for pdf in batches:
            vs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if vs.size == 0:
                continue
            vs = vs - pivot  # conditioning shift, mathematically inert
            n += vs.shape[0]
            bs = vs.sum(axis=0)
            bo = vs.T @ vs
            s = bs if s is None else s + bs
            outer = bo if outer is None else outer + bo
        if n:
            yield pd.DataFrame({
                "pid": [pid], "n": [n], "s": [s.tolist()],
                "outer": [outer.reshape(-1).tolist()],
            })

    parts = vecs.mapInPandas(partials, schema=schema).collect()
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
    mean_y = s / n
    mean = pivot + mean_y
    cov = outer / n - np.outer(mean_y, mean_y)
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
