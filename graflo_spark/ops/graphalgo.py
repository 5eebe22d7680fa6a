"""Distributed graph algorithms over edge-pair DataFrames.

The first consumer is near-duplicate CLUSTERING: pairwise dedup candidates
(MinHash/SimHash/embedding LSH) only say "a ~ b"; keeping one representative
per duplicate *group* needs the transitive closure — connected components.

``connected_components`` implements the alternating large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014): each round is a constant number of groupBy/join shuffles and the
parent forest provably flattens in O(log n) rounds REGARDLESS of graph
diameter — unlike naive min-label propagation, whose round count equals the
diameter (a 100 TB web-graph chain would never finish). Rounds are
checkpointed to truncate lineage, so plan size stays constant as iterations
accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of every edge, self-loops dropped."""
    fwd = edges.select(F.col("a"), F.col("b"))
    rev = edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    return fwd.unionByName(rev).filter(F.col("a") != F.col("b")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of N(u) ∪ {u}."""
    m = edges.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        edges.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u over its smaller-or-equal neighborhood: connect every
    member (and u) to the minimum."""
    smaller = edges.filter(F.col("b") <= F.col("a"))
    m = smaller.groupBy("a").agg(F.min("b").alias("m"))
    out = (
        smaller.join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(m.select(F.col("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return out


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """Connected components of the undirected graph given as id pairs.

    Returns (node, component) with ``component`` = the minimum node id in the
    component — a deterministic representative. Every node that appears in
    ``pairs`` gets a row (roots map to themselves); isolated nodes never in
    ``pairs`` don't appear (callers outer-join them back; see
    ``near_dup_clusters``).

    Scale design: every round is groupBy + join on node ids (AQE-safe equi
    shuffles, map-side combinable), O(log n) rounds by the star-contraction
    bound, per-round ``localCheckpoint`` so the logical plan doesn't grow
    with iterations. No driver-side state beyond the per-round convergence
    counter (a count() action on the round's delta).
    """
    edges = _symmetrize(
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")))
    if checkpoint:
        edges = edges.localCheckpoint(eager=True)

    for _ in range(max_iter):
        edges = _large_star(_symmetrize(edges))
        edges = _small_star(_symmetrize(edges))
        if checkpoint:
            edges = edges.localCheckpoint(eager=True)
        # converged when the forest is flat: every parent is a root
        # (no edge's target appears as a source pointing somewhere smaller)
        deeper = (
            edges.alias("e1")
            .join(edges.alias("e2"), F.col("e1.b") == F.col("e2.a"), "inner")
            .filter(F.col("e2.b") < F.col("e1.b"))
        )
        if deeper.limit(1).count() == 0:
            break

    comp = edges.select(
        F.col("a").alias("node"), F.col("b").alias("component"))
    roots = comp.select(
        F.col("component").alias("node"), F.col("component")).distinct()
    return comp.unionByName(roots).distinct()


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Duplicate-group assignment: every doc gets a ``cluster`` id (the
    minimum doc id of its near-dup component; singletons are their own
    cluster) and an ``is_representative`` flag. The keep-one-per-group
    training-data dedup is then ``filter(is_representative)``."""
    cc = connected_components(pairs, id_a, id_b)
    out = (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster"),
        )
        .withColumn("is_representative", F.col(id_col) == F.col("cluster"))
    )
    return out
