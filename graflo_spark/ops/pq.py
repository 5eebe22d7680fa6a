"""Product quantization (PQ) for embedding search at corpus scale — the
canonical memory-compression path (Jégou et al., TPAMI 2011, public): a
d-dim float vector (e.g. 1536 floats = 6 KB) becomes ``m`` uint8 codes
(e.g. 16 bytes), a ~400x shrink that lets a 100 TB embedding corpus fit a
few hundred GB of codes, scanned with asymmetric distance computation
(ADC): per query, one lookup table of ``m x k_sub`` exact sub-dot-products;
each candidate's score is m table lookups, no float math per dimension.

Spark shape:
- **train**: codebooks fit on a driver-side SAMPLE (standard PQ practice —
  codebooks need ~100k vectors, not the corpus) with a deterministic
  seeded Lloyd's in numpy. Bounded by ``train_sample``.
- **encode**: one distributed pass; an Arrow-batched ``mapInPandas`` does
  the vectorized argmin against the broadcast codebooks (numpy einsum over
  the batch — the sanctioned Python escape hatch, never per-row).
- **search**: queries' LUTs travel in the task closure (tiny); each
  partition emits its LOCAL top-k per query (bounded output), a final
  window takes the global top-k. The corpus shuffle is k rows per
  (query, partition) — never the codes themselves.

Exactness note: ADC scores are approximations of the true dot product;
:func:`pq_topk`'s quality contract is recall against exact search (tested),
not bit-equality — hence unit-proven, not DuckDB-oracled.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lloyd(x: "np.ndarray", k: int, iters: int, seed: int) -> "np.ndarray":
    """Deterministic seeded Lloyd's k-means (numpy); returns (k, dsub)
    centroids. Empty clusters re-seed from the farthest points."""
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    if len(centers) < k:  # tiny sample: pad with jittered repeats
        pad = centers[rng.randint(0, len(centers), size=k - len(centers))]
        centers = np.vstack([centers, pad + rng.normal(0, 1e-4, pad.shape)])
    x2 = (x * x).sum(axis=1, keepdims=True)
    for _ in range(iters):
        # expanded form: (N,K) only — the (N,K,dsub) broadcast temp would
        # cost ~1 GB at the default 100k-vector training sample
        c2 = (centers * centers).sum(axis=1)
        d2 = x2 - 2.0 * x @ centers.T + c2[None, :]
        assign = d2.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                centers[j] = x[mask].mean(axis=0)
            else:
                centers[j] = x[d2.min(axis=1).argmax()]
    return centers


@dataclass
class PqCodebook:
    """Per-subspace centroid tables: ``centroids[j]`` is (k_sub, dsub)."""

    centroids: list  # list[np.ndarray], length m
    dim: int

    @property
    def m(self) -> int:
        return len(self.centroids)

    @property
    def dsub(self) -> int:
        return self.centroids[0].shape[1]


def train_pq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k_sub: int = 256,
    train_sample: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> PqCodebook:
    """Fit PQ codebooks on a bounded driver-side sample. ``m`` must divide
    the embedding dim; ``k_sub <= 256`` keeps codes one byte each."""
    if not 1 <= k_sub <= 256:
        raise ValueError("k_sub must be in [1, 256] for uint8 codes")
    n = corpus.count()
    frac = min(1.0, train_sample / max(n, 1))
    rows = (
        corpus.select(F.col(vec_col).cast("array<float>").alias("v"))
        .sample(fraction=frac, seed=seed)
        .limit(train_sample)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float32)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide embedding dim {dim}")
    dsub = dim // m
    cents = [
        _lloyd(
            np.ascontiguousarray(x[:, j * dsub : (j + 1) * dsub]),
            k_sub, iters, seed + j,
        )
        for j in range(m)
    ]
    return PqCodebook(centroids=cents, dim=dim)


_CODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("code", T.ArrayType(T.IntegerType())),
    ]
)


def pq_encode(
    corpus: DataFrame,
    book: PqCodebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One distributed encode pass: ``(id, code ARRAY<INT> length m)``.
    Vectorized per Arrow batch; the codebooks ride the task closure
    (m * k_sub * dsub floats — a few MB at most)."""
    cents = [c.astype(np.float32) for c in book.centroids]
    dsub = book.dsub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf["v"]), dtype=np.float32)
            codes = np.empty((len(x), len(cents)), dtype=np.int32)
            for j, c in enumerate(cents):
                sub = x[:, j * dsub : (j + 1) * dsub]
                # ||s - c||^2 argmin via the expanded form (no NxKxD temp)
                d2 = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * sub @ c.T
                    + (c * c).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "code": list(codes)})

    narrowed = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<float>").alias("v"),
    )
    return narrowed.mapInPandas(run, schema=_CODE_SCHEMA)


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    book: PqCodebook,
    k: int = 10,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes: per partition, numpy gathers each query's
    LUT rows for every code and emits the local top-k; a window takes the
    global top-k. Returns ``(query_id, neighbor_id, score, rank)`` where
    score approximates the dot product (== cosine for L2-normalized
    vectors). Queries are collected to the driver — the query batch is the
    small side by construction."""
    q_rows = queries.select(
        F.col(query_id).cast("long").alias("qid"),
        F.col(query_vec).cast("array<float>").alias("v"),
    ).collect()
    cents = [c.astype(np.float32) for c in book.centroids]
    dsub = book.dsub
    luts = []  # (qid, (m, k_sub) float32 LUT of exact sub-dot-products)
    for r in q_rows:
        qv = np.asarray(r["v"], dtype=np.float32)
        lut = np.stack(
            [cents[j] @ qv[j * dsub : (j + 1) * dsub] for j in range(len(cents))]
        )
        luts.append((int(r["qid"]), lut))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            code_mat = np.asarray(list(pdf["code"]), dtype=np.int64)
            j_idx = np.arange(code_mat.shape[1])
            for qid, lut in luts:
                scores = lut[j_idx, code_mat].sum(axis=1)
                keep = ids != qid
                s, i = scores[keep], ids[keep]
                top = np.argsort(-s, kind="stable")[:k]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": i[top],
                        "score": s[top].astype(np.float64),
                    }
                )

    local = codes.mapInPandas(run, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_pq_topk(
    queries: DataFrame,
    ivf_index,
    codes: DataFrame,
    book: PqCodebook,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """The classic IVF-PQ layout: IVF pruning picks the ``n_probe``
    clusters nearest each query (tiny broadcast centroid ranking), then
    ADC scores ONLY the PQ codes inside those clusters — the 100 TB scan
    reads ``n_probe/n_centroids`` of a corpus that is already ~400x
    smaller than the floats. ``ivf_index`` is a
    :class:`graflo_spark.ops.simsearch.IvfIndex` built over the SAME
    corpus the codes encode. At ``n_probe == n_centroids`` results equal
    :func:`pq_topk` exactly (pruning disabled, same ADC scores)."""
    from graflo_spark.ops.simsearch import cosine_expr

    q = queries.select(
        F.col(query_id).cast("long").alias("query_id"),
        F.col(query_vec).cast("array<float>").alias("v"),
    )
    qc = q.crossJoin(F.broadcast(ivf_index.centroids)).select(
        "query_id", "v", "cluster",
        cosine_expr(
            F.col("v").cast("array<double>"), F.col("centroid")
        ).alias("c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), "cluster"
    )
    probes = (
        qc.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "cluster")
    )
    cand = (
        ivf_index.assigned.select(
            F.col("neighbor_id").alias("id"), "cluster"
        )
        .join(codes, "id")
        .join(F.broadcast(probes), "cluster")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "code")
    )

    cents = [c.astype(np.float32) for c in book.centroids]
    dsub = book.dsub
    luts = {}
    for r in q.collect():
        qv = np.asarray(r["v"], dtype=np.float32)
        luts[int(r["query_id"])] = np.stack(
            [cents[j] @ qv[j * dsub : (j + 1) * dsub] for j in range(len(cents))]
        )

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            for qid, grp in pdf.groupby("query_id"):
                lut = luts[int(qid)]
                code_mat = np.asarray(list(grp["code"]), dtype=np.int64)
                scores = lut[np.arange(code_mat.shape[1]), code_mat].sum(axis=1)
                top = np.argsort(-scores, kind="stable")[:k]
                yield pd.DataFrame(
                    {
                        "query_id": int(qid),
                        "neighbor_id": grp["neighbor_id"].to_numpy()[top],
                        "score": scores[top].astype(np.float64),
                    }
                )

    local = cand.mapInPandas(run, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
