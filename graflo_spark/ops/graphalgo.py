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

    # Convergence criterion (Kiveris et al. §3): iterate until the edge set
    # is STABLE across a full large-star/small-star round. A weaker check
    # ("every parent is a root") is unsound — a node can hold edges to two
    # distinct roots with no parent chain between them, so the loop would
    # stop with a multi-parent forest and emit one node in two components.
    prev = edges
    prev_cnt = edges.count()
    converged = False
    for _ in range(max_iter):
        edges = _large_star(_symmetrize(edges))
        edges = _small_star(_symmetrize(edges))
        if checkpoint:
            edges = edges.localCheckpoint(eager=True)
        cnt = edges.count()
        if cnt == prev_cnt and edges.exceptAll(prev).limit(1).count() == 0:
            # same cardinality + no edge outside prev ⇒ identical sets
            # (both sides are distinct()), so another round is a no-op.
            converged = True
            break
        prev, prev_cnt = edges, cnt
    if not converged:
        # an unconverged forest can assign one node to two components —
        # silently returning it would corrupt downstream dedup
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the star-contraction bound is O(log n) — raise max_iter")

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
