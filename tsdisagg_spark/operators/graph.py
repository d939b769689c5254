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
    coalesce_threshold: int = 100_000,
) -> DataFrame:
    """Component label for every node appearing in ``pairs``:
    ``(node, component)`` where ``component`` is the smallest node id in the
    connected component — the canonical "representative to keep" in dedup.

    ``pairs`` is an undirected edge list (each row one edge, any order);
    isolated documents never appear in pairs and so get no row — a caller
    wanting singletons unions them back with ``component = node``.

    ``coalesce_threshold``: once the convergence checksum shows at most
    this many surviving edges, each round's input is read coalesce(1) —
    a narrow squeeze, nothing recomputed — so the star passes stop
    launching one near-empty task per inherited checkpoint partition
    (the count is data-adaptive, same discipline as pagerank's
    ``broadcast_threshold``; a big graph never trips it and keeps the
    full width).  The dedup graphs this operator clusters are pair lists
    ALREADY thresholded by similarity, orders of magnitude smaller than
    their corpora, so bench-scale rounds were pure task-scheduling
    overhead (r13 opt, guide section 2).
    """
    sc = pairs.sparkSession.sparkContext
    # The initial checkpoint is NOT release-tracked: its plan references
    # the caller's frames (often persisted, e.g. jaccard_pairs' caches),
    # and physical planning can register those cache RDDs inside any id
    # diff taken around a job.  Round checkpoints (below) sit on pure
    # LogicalRDD inputs, where call-time tracking is exact.
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
    #
    # Checkpoint blocks are released as the loop advances: a lazy
    # localCheckpoint REGISTERS its persisted RDD at call time (no job
    # runs, so the id diff around the call is exactly that checkpoint —
    # verified empirically, and unlike DataFrame.persist, which registers
    # only at materialization).  Once the round's checksum job has
    # materialized checkpoint k, the blocks of k-1 (and of the
    # mid-iteration checkpoint, whose lineage k has truncated) are dead;
    # without the release a long run stacks one edge-list-sized RDD per
    # round for the life of the session.  The final checkpoint is kept —
    # the returned (lazy) labeling reads it; its lifetime is
    # caller-managed (cacheutil.release_all).
    def _tracked_ckpt(df: DataFrame):
        before = _persistent_rdd_ids(sc)
        out = df.localCheckpoint(eager=False)
        return out, _persistent_rdd_ids(sc) - before

    live_ids: set = set()
    for _ in range((max_rounds + 1) // 2):
        src = edges.coalesce(1) if prev[0] <= coalesce_threshold else edges
        mid, mid_ids = _tracked_ckpt(_small_star(_large_star(src)))
        edges, new_ids = _tracked_ckpt(_small_star(_large_star(mid)))
        cur = _edge_checksum(edges)
        _release_checkpoint_blocks(sc, live_ids | mid_ids)
        live_ids = new_ids
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


def _release_checkpoint_blocks(sc, rdd_ids) -> None:
    """Unpersist the storage blocks behind a ``localCheckpoint``.

    ``DataFrame.unpersist()`` does NOT free them (verified empirically:
    the checkpointed Dataset wraps a LogicalRDD whose backing RDD was
    persisted internally, and the Dataset-level unpersist only touches the
    cache manager), so without this every iteration of an iterative
    operator leaks one node-sized RDD into executor storage for the life
    of the session.  Best-effort by design: failure to release costs
    memory, never correctness."""
    if not rdd_ids:
        return
    try:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in rdd_ids:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)
    except Exception:  # noqa: BLE001 — storage cleanup must never fail a query
        pass


def _persistent_rdd_ids(sc) -> set:
    try:
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())
    except Exception:  # noqa: BLE001
        return set()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    broadcast_threshold: int = 100_000,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution, as a
    fixed number of chained DataFrame iterations (Page, Brin, Motwani &
    Winograd 1999 — the power-iteration formulation).

    ``r_{t+1}(v) = (1-d)/N + d * (sum_u r_t(u) * w(u,v)/W(u) + dang_t/N)``
    where ``W(u)`` is u's total out-weight and ``dang_t`` the rank mass
    sitting on nodes with no out-edges.  Node set = every id appearing as
    source or destination.

    Returns ``(node, rank)``.  A FIXED iteration count (not a convergence
    loop) keeps the result a pure function of the input — which is what
    makes it oracle-checkable by unrolling the same iterations in SQL —
    and is standard practice at scale anyway (convergence tests cost a
    full pass each).

    Scale shape: each iteration is one equi-join of the edge list against
    the current rank vector plus a groupBy on dst — the per-iteration
    dangling-mass scalar rides along as a broadcast one-row frame and the
    only driver-side value is the node COUNT (one int, data-size
    independent, same discipline as kmeans_fit's k x d state).  The
    node-sized contribution vector is eagerly checkpointed once per
    iteration (see the loop comment for why the lazy alternative
    compounds into a 3^k stage forest); the PREVIOUS iteration's
    checkpoint blocks are released as soon as the next eager checkpoint
    has consumed them, so executor storage stays O(1) in the iteration
    count instead of growing linearly.

    The contribution vector is squeezed to one partition ONLY when the
    graph has at most ``broadcast_threshold`` nodes (then the single tiny
    partition lets AQE broadcast the next join and the per-iteration jobs
    are pure fixed overhead).  Above the threshold it keeps the groupBy's
    hash partitioning on node id — on a billion-node graph a coalesce(1)
    contribution vector would funnel every iteration through a single
    task, so the gate is what makes this the same operator at both
    scales.
    """
    e = edges.select(
        F.col(src).alias("e_src"),
        F.col(dst).alias("e_dst"),
        (F.col(weight) if weight else F.lit(1.0)).cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
    )
    # Spark resolves identifiers case-insensitively, so the total must not
    # be named `W` next to `w`
    outw = e.groupBy("e_src").agg(F.sum("w").alias("out_total"))
    norm = e.join(outw, "e_src").select(
        "e_src", "e_dst", (F.col("w") / F.col("out_total")).alias("p")
    )
    # iteration-invariant frames are consumed once per iteration — without
    # a persist every iteration re-derives the (possibly fact-table-sized)
    # edge aggregation from scratch, turning 5 iterations into 5 rescans
    norm = norm.persist()
    nodes = nodes.persist()

    # One scalar to the driver: the node count both seeds the uniform
    # rank vector and gates the physical strategy below.  (nodes is
    # persisted, so this count doubles as its materialization.)
    n_nodes = float(nodes.count())
    if n_nodes == 0:
        # empty edge list: no nodes, no ranks — return the empty (node,
        # rank) frame instead of dividing by zero below
        return nodes.select("node", F.lit(1.0).cast("double").alias("rank"))
    # Materialize norm's cache BEFORE the loop: the pre-checkpoint RDD-id
    # snapshot below must already contain norm's cached RDD, or iteration
    # 0's diff would claim it and iteration 1's release would unpersist the
    # iteration-invariant persist — re-deriving the edge aggregation every
    # round, exactly what the persist exists to prevent.
    norm.count()
    small_graph = n_nodes <= broadcast_threshold
    if small_graph:
        # Squeeze the iteration-INVARIANT frames to one partition as well
        # (the per-iteration contribution vector already is, below): their
        # caches keep the upstream shuffle width, so on a tiny graph every
        # iteration's join/agg stages otherwise launch that many near-empty
        # tasks — measured 58 stages x 32 tasks of pure scheduling on a
        # 25-node graph, ~60ms/stage of wall for zero work (r13 opt, guide
        # section 2 "partitioning that matches the data, not the config").
        # coalesce is a narrow read of the already-materialized cache, so
        # nothing is recomputed; above the threshold the cached width is
        # exactly what a big graph needs, so this is gated, not global.
        norm = norm.coalesce(1)
        nodes = nodes.coalesce(1)
    sc = edges.sparkSession.sparkContext

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    prev_ckpt_ids: set = set()
    for _it in range(iterations):
        # ONE real pass per iteration: the edge-vs-rank join.  The
        # node-sized contribution vector is eagerly checkpointed
        # (coalesce(1) → its size is known-tiny, so AQE broadcasts the
        # next iteration's joins) and BOTH remaining quantities derive
        # from it — in particular the dangling mass comes from mass
        # conservation, dang_t = 1 − Σ_v cin_t(v), because every node
        # WITH out-edges contributes its full rank (its p-row sums to 1).
        # The earlier formulation recomputed `ranks` for a dangling
        # anti-join each round; three consumers per level compounded the
        # lazy DAG ~3x per iteration into a 3^k forest of micro-stages —
        # measured 6.3s for 5 iterations on a 25-node graph at sf0.1,
        # pure scheduling overhead, vs ~2s this shape (identical ranks to
        # float dust, absorbed by the query's 6-decimal rounding).
        contrib = (
            norm.join(ranks, norm.e_src == ranks.node)
            .groupBy("e_dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("cin"))
            .select(F.col("e_dst").alias("node"), "cin")
        )
        if small_graph:
            # single tiny partition -> AQE broadcasts the next join and
            # the eager-checkpoint job is one task of fixed overhead
            contrib = contrib.coalesce(1)
        before = _persistent_rdd_ids(sc)
        contrib = contrib.localCheckpoint(eager=True)
        # The eager checkpoint just MATERIALIZED this iteration from the
        # previous one, so the previous blocks are dead — release them.
        # CAVEAT on the id diff: norm/nodes were materialized before the
        # loop, so their cache ids sit in `before` and never land in the
        # diff.  The diff can still over-collect if ANOTHER thread of the
        # same session persists concurrently — and unpersisting a foreign
        # localCheckpoint RDD is NOT merely a recompute (its lineage is
        # truncated; the blocks are unrecoverable), so concurrent
        # same-session iterative jobs should not share a SparkContext with
        # this operator.  Single-threaded sessions — the engine's execution
        # model — are exact: the diff is precisely this iteration's
        # checkpoint RDD.
        _release_checkpoint_blocks(sc, prev_ckpt_ids)
        prev_ckpt_ids = _persistent_rdd_ids(sc) - before
        dang = contrib.agg(
            (1.0 - F.coalesce(F.sum("cin"), F.lit(0.0))).alias("dang")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    (1.0 - damping) / n_nodes
                    + damping
                    * (
                        F.coalesce(F.col("cin"), F.lit(0.0))
                        + F.col("dang") / n_nodes
                    )
                ).alias("rank"),
            )
        )
    return ranks


class KCoreRoundBudgetExceeded(RuntimeError):
    """Peeling needed more rounds than the caller certified for.

    Raised by :func:`kcore` when ``rounds_budget`` is set and the
    fixpoint took longer: an unrolled-SQL oracle is only exact if its
    unroll depth covers the actual peel count, so exceeding the budget
    must be a NAMED failure at build time — not a silent hash mismatch
    discovered downstream."""


def kcore(
    pairs: DataFrame,
    k: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 100,
    rounds_budget: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """The k-CORE of an undirected graph — the maximal subgraph in which
    every node keeps degree >= k — as ``(node, core_degree)`` rows, with
    ``core_degree`` the node's degree INSIDE the core (Seidman 1983;
    Matula & Beck 1983 peeling).

    A training-data pipeline reads cores off the near-dup / co-occurrence
    graph to find the densely-interlinked clusters (template farms, SEO
    mirror networks) that pairwise thresholds miss: a mirror network's
    pages each resemble many siblings a little, not one sibling a lot.

    Algorithm: iterative peeling to the exact fixpoint.  Each round
    recomputes degrees (one hash aggregation over an ``explode(array(u,
    v))`` endpoint stream — each undirected edge contributes one count to
    both endpoints), keeps nodes with degree >= k, and drops every edge
    touching a peeled node (two node-keyed joins).  The peel state is the
    CANONICAL ``u < v`` edge list, not a both-directions adjacency: the
    doubled adjacency carried 2x the rows through every round's scan,
    checkpoint and joins for information the explode reconstructs for
    free inside codegen (r13 opt, guide section 2.4 "shuffle fewer
    bytes").  The result is the standard k-core regardless of peel order
    — peeling is confluent — so the output is deterministic and matches
    an unrolled-SQL oracle with any sufficient round count.

    Scale shape: every structure is node- or edge-keyed and shuffles on
    those keys; the only driver-side value is the per-round alive-node
    COUNT (one scalar — the convergence test).  Round checkpoints
    truncate the growing lineage and release the previous round's blocks
    (same storage discipline as :func:`connected_components`): executor
    storage holds at most two edge-list snapshots at any time.

    ``rounds_budget``: optional certification bound — raise
    :class:`KCoreRoundBudgetExceeded` if the fixpoint is not reached
    within that many peel rounds (the convergence-confirming round is
    free).  Callers whose correctness oracle is an UNROLLED peel pass
    their unroll depth here so an under-deep oracle fails loudly by
    name instead of silently hash-mismatching.

    ``stats``: optional dict the call fills with ``rounds_used`` (peel
    rounds before the convergence-confirming pass) — observability for
    stress runs correlating peel depth with graph density.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sc = pairs.sparkSession.sparkContext
    # canonical orientation BEFORE distinct: an input carrying both (a, b)
    # and (b, a) must collapse to ONE undirected edge, or the symmetrized
    # adjacency double-counts that neighbor's degree contribution
    ua = F.col(id_a).cast("long")
    ub = F.col(id_b).cast("long")
    before_edges = _persistent_rdd_ids(sc)
    edges = (
        pairs.select(
            F.least(ua, ub).alias("u"), F.greatest(ua, ub).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # tracked so the error paths below can release it: an exception that
    # leaves the edges checkpoint (plus the current round's blocks) behind
    # would later trip the sweep/bench zero-leak gates with a signature
    # pointing at the wrong query
    edges_ids = _persistent_rdd_ids(sc) - before_edges
    live = edges

    def _tracked_ckpt(df: DataFrame):
        before = _persistent_rdd_ids(sc)
        out = df.localCheckpoint(eager=False)
        return out, _persistent_rdd_ids(sc) - before

    def _one_round(src: DataFrame) -> DataFrame:
        deg = (
            src.select(
                F.explode(F.array(F.col("u"), F.col("v"))).alias("n")
            )
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = deg.where(F.col("d") >= k)
        return (
            src.join(alive.select(F.col("n").alias("u")), "u")
            .join(alive.select(F.col("n").alias("v")), "v")
            .select("u", "v")
        )

    def _budget_raise(extra_ids: set) -> None:
        # the result is abandoned, so nothing still references the live
        # blocks — release them (and the edges checkpoint) before
        # raising, or a long-lived session later fails the zero-leak
        # gates on this dead residue
        _release_checkpoint_blocks(sc, extra_ids | edges_ids)
        raise KCoreRoundBudgetExceeded(
            f"kcore(k={k}) still peeling after {rounds_budget} "
            f"certified rounds — deepen the unrolled oracle (or raise "
            f"rounds_budget) before trusting a hash comparison"
        )

    # TWO peel rounds per driver round trip (r14 opt, VERDICT r13 #4):
    # both snapshots are (lazily) checkpointed, so ONE count job
    # materializes the pair — the RDD-level boundary dedupes the mid
    # snapshot inside the job (it is one RDD object, computed once and
    # stored), which is what makes batching safe where raw two-deep
    # DataFrame lineage would re-plan the first peel once per consumer.
    # The mid count needed to disambiguate convergence (and keep the
    # rounds_budget certification EXACTLY the serial semantics — the
    # "extra snapshot" of the r13 design note) is a per-partition count
    # over already-cached blocks: ~free next to a peel round.  Convergence
    # scalar semantics unchanged: edge count stable <=> no endpoint peeled
    # <=> fixpoint (degrees are a pure function of the edge set).
    live_ids: set = set()
    prev_edges = -1
    rounds_used = 0
    converged = False
    for _ in range((max_rounds + 1) // 2):
        mid, mid_ids = _tracked_ckpt(_one_round(live))
        live_next, new_ids = _tracked_ckpt(_one_round(mid))
        # materializes mid's checkpoint first (its blocks back live_next's
        # lineage), then live_next's — so releasing the previous round's
        # blocks below is safe: nothing live references them anymore
        n2 = live_next.count()
        n1 = mid.count()  # cached-block count: cheap, no recompute
        if n1 == prev_edges:
            # the FIRST peel of the pair was the confirming pass: the
            # fixpoint was already reached, the second peel is a no-op
            # snapshot we discard
            _release_checkpoint_blocks(sc, live_ids | new_ids)
            live_ids = mid_ids
            live = mid
            converged = True
            break
        # first peel changed the edge set: it consumes certified budget
        # exactly as the serial loop did (and raises at the same point —
        # BEFORE the second peel's outcome is considered)
        rounds_used += 1
        if rounds_budget is not None and rounds_used > rounds_budget:
            _budget_raise(live_ids | mid_ids | new_ids)
        if n2 == n1:
            # second peel confirmed convergence (free, like serial)
            _release_checkpoint_blocks(sc, live_ids | mid_ids)
            live_ids = new_ids
            live = live_next
            converged = True
            break
        rounds_used += 1
        if rounds_budget is not None and rounds_used > rounds_budget:
            _budget_raise(live_ids | mid_ids | new_ids)
        _release_checkpoint_blocks(sc, live_ids | mid_ids)
        live_ids = new_ids
        live = live_next
        prev_edges = n2
    if not converged:
        _release_checkpoint_blocks(sc, live_ids | edges_ids)
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
    if stats is not None:
        stats["rounds_used"] = rounds_used
    return (
        live.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
