"""Distributed connected components — the clustering step of a dedup
pipeline (near-dup PAIRS -> duplicate GROUPS -> keep one representative).

Implements the alternating Large-Star / Small-Star algorithm (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC 2014 — a published public algorithm), expressed
entirely as DataFrame joins and aggregations:

* Each round is two join+groupBy passes over the edge list — no driver-side
  graph, no RDDs, no per-node state.
* Converges in O(log^2 n) rounds even for pathological chain components
  (a drifting duplicate chain doc_1 ~ doc_2 ~ ... ~ doc_1e6), where naive
  min-label propagation needs O(diameter) = O(n) rounds.
* Lineage is truncated with ``localCheckpoint`` every TWO rounds (two
  large∘small passes share one materialization + convergence checksum) so
  the plan does not grow with iteration count while the per-round fixed job
  overhead — the dominant cost at bench scale — is halved.

Scale notes: edge lists shuffle on node id each round; skew is bounded by
the largest star (a node with d neighbors contributes d rows to one
partition), which the algorithm itself keeps shrinking — large-star points
high-degree hubs at their component minimum.  The per-round convergence
check is a single tiny aggregate (count + xor of edge hashes), not a
collect of the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _both_directions(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min({u} U N(u)).

    The per-neighborhood minimum is an unordered WINDOW over u — one hash
    exchange feeding every row its group min in place — rather than the
    groupBy + self-join formulation, which pays two more exchanges per
    round for the same rows (the joins dominated the iteration's fixed cost
    at bench scale and shuffle the same data at cluster scale)."""
    from pyspark.sql.window import Window

    nb = _both_directions(edges)
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        nb.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor smaller than u (and u itself) to the minimum
    of u's smaller neighborhood — window-min formulation, same as
    :func:`_large_star` (the (u, m) self-edge rides along per-row and the
    trailing distinct collapses it)."""
    from pyspark.sql.window import Window

    nb = _both_directions(edges).where(F.col("v") < F.col("u"))
    nb = nb.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    return (
        nb.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(nb.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-insensitive set digest that cannot overflow (ANSI
        # mode makes sum() of hashes a runtime error)
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Component label for every node appearing in ``pairs``:
    ``(node, component)`` where ``component`` is the smallest node id in the
    connected component — the canonical "representative to keep" in dedup.

    ``pairs`` is an undirected edge list (each row one edge, any order);
    isolated documents never appear in pairs and so get no row — a caller
    wanting singletons unions them back with ``component = node``.
    """
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # lazy checkpoint: the checksum aggregate right after is the single
        # action that materializes it — one job per round, not two
        .localCheckpoint(eager=False)
    )
    prev = _edge_checksum(edges)
    # TWO large∘small rounds per convergence checksum: at bench scale the
    # wall clock is dominated by fixed per-action overhead, so halving the
    # action count (one checksum job materializes both rounds' lazy
    # checkpoints) cuts most of it.  Each round still gets its OWN
    # localCheckpoint — each star pass references its input twice, so an
    # un-checkpointed round-1 subtree would be re-planned (and re-executed)
    # several times inside round 2's plan.  Correctness is unaffected: the
    # star fixed point is stable (applying the operators to a converged
    # star set returns the same set), so comparing checksums every second
    # round still detects convergence, at worst one redundant pass after
    # the fixed point is reached.
    for _ in range((max_rounds + 1) // 2):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur = _edge_checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # fixed point is a union of stars centered at each component's minimum:
    # every node's label is the smallest id it touches (itself if center)
    nb = _both_directions(edges)
    return (
        nb.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("mv"))
        .select("node", F.least("node", "mv").alias("component"))
    )
