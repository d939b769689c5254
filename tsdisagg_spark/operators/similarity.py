"""Similarity search over embedding columns (``array<float>``).

Two paths:

* :func:`cosine_topk` — exact brute force.  The query side is broadcast
  (it is small by construction), the corpus side streams: no shuffle of the
  corpus at all until the final per-query top-k aggregation, which moves
  only ``k`` rows per (query, partition).  Dot products use
  ``zip_with``/``aggregate`` — Catalyst higher-order functions, no Python.
* :func:`lsh_topk` — random-hyperplane LSH for the 100 TB case: sign-bit
  buckets computed from a seeded plane matrix (deterministic), candidates
  drawn from the query's bucket with optional multiprobe (Hamming-1
  neighbors), exact cosine re-ranking within candidates.  Turns O(N*Q) into
  O(N/2^bits * Q) at a measured recall cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# The str fast paths below exist because PySpark higher-order-function
# lambdas are py4j-chatty at CONSTRUCTION time: each `lambda x: ...`
# conversion costs ~30-80 ms of driver round-trips (measured: dot 83 ms,
# norm 83 ms, _as_double 29 ms per call vs 3 ms for the same expression
# parsed from SQL), and the ANN/PQ/kmeans builders call them per centroid
# or per plane.  The SQL bodies are the exact expressions the lambda form
# builds — same fold order, same 0.0D double seed — so results are
# bit-identical; the Column path stays for callers holding computed
# expressions.


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x)"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns via zip_with + aggregate (JVM-side).
    Pass column names/SQL fragments as strings for the cheap-construction
    path; Columns still work."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(
            f"sqrt(aggregate(transform({a}, x -> x * x), 0.0D, "
            "(acc, x) -> acc + x))"
        )
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def _as_double(col: Column | str) -> Column:
    if isinstance(col, str):
        return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine: ``(query_id, neighbor_id, rank, cosine)``.

    ``queries`` is broadcast — a BroadcastNestedLoopJoin where the big side
    never shuffles.  Norms are computed once per side before the join.
    Ranking ties break on neighbor id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cvec"),
    ).withColumn("cnorm", norm("cvec"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qvec"),
    ).withColumn("qnorm", norm("qvec"))

    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (dot("cvec", "qvec") / (F.col("cnorm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _const_vec(values) -> Column:
    """A literal double-array Column built with ONE py4j round-trip.

    ``F.array(*[F.lit(v) ...])`` costs one py4j call per element; at
    K x d centroid literals that is thousands of driver round-trips —
    measured 1.9s of DRIVER time on knn_ivf's build (vs 1.0s execution)
    at 8x64 doubles.  ``repr(float)`` is the shortest round-trip decimal
    and Java's ``Double.parseDouble`` recovers the exact same IEEE double,
    so the literal VALUES are bit-identical to the F.lit form (pinned by
    test_const_vec_literals_bit_identical)."""
    body = ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values)
    return F.expr(f"array({body})")


def _plane_literals(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).round(6).tolist()


def _const_vec_sql(values) -> str:
    """SQL text of a literal double array (see :func:`_const_vec`)."""
    body = ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values)
    return f"array({body})"


def bucket_expr(vec: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from the hyperplane matrix, as a pure expression:
    bit i = (vec . plane_i) >= 0.  ``vec`` is a column name/SQL fragment;
    the whole n_bits-plane sum parses in ONE py4j round-trip (the Column
    form paid ~0.1s per plane at construction)."""
    terms = [
        "shiftleft(CASE WHEN "
        + _dot_sql(vec, _const_vec_sql(plane))
        + f" >= 0 THEN 1L ELSE 0L END, {i})"
        for i, plane in enumerate(planes)
    ]
    if not terms:  # n_bits=0: the exhaustive twins' single-bucket case
        return F.expr("CAST(0 AS BIGINT)")
    return F.expr("CAST(0 AS BIGINT) + " + " + ".join(terms))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH + exact re-rank.

    The corpus is bucketed once (a derived column — at scale, persist or
    partition the corpus BY this bucket so queries prune partitions).
    Queries probe their own bucket plus, with ``multiprobe``, all Hamming-1
    neighbor buckets — 1+n_bits buckets out of 2^n_bits, so the scanned
    fraction is ~(1+n_bits)/2^n_bits of the corpus.

    Pass ``dim`` (the embedding width) to avoid the one-row probe job that
    otherwise runs just to size the plane matrix.
    """
    if dim is None:
        dim = len(corpus.select(F.col(vec_col)).first()[0])
    planes = _plane_literals(dim, n_bits, seed)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cvec"),
    )
    c = c.withColumn("bucket", bucket_expr("cvec", planes)).withColumn(
        "cnorm", norm("cvec")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qvec"),
    ).withColumn("qbucket", bucket_expr("qvec", planes))
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(n_bits)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("qbucket"))
    q = q.withColumn("qnorm", norm("qvec"))

    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        (dot("cvec", "qvec") / (F.col("cnorm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _centroid_scores_sql(vec: str, centroids: list[list[float]]) -> str:
    """SQL text of the (dot, idx) struct array over the centroid literals —
    one parse for the whole K-way scoring (the Column form paid ~0.1s per
    centroid in lambda construction)."""
    items = ", ".join(
        f"named_struct('score', {_dot_sql(vec, _const_vec_sql(c))}, 'idx', {i})"
        for i, c in enumerate(centroids)
    )
    return f"array({items})"


def _nearest_centroid(vec: str, centroids: list[list[float]]) -> Column:
    """Index of the max-dot-product centroid, as a pure expression: build an
    array of (dot, idx) structs and take array_max (struct ordering compares
    fields in order, so the max dot wins; idx breaks exact ties upward).
    Right for a handful of rows (the query side); for corpus-wide
    assignment use :func:`_nearest_centroid_gemm` — HOF lambdas evaluate
    interpreted per element, and the corpus-side assignment was measured at
    0.9 s of knn_ivf's 1.6 s at sf0.1 in expression form."""
    return F.expr(f"array_max({_centroid_scores_sql(vec, centroids)}).idx")


def _nearest_centroid_gemm(vec: Column, centroids: list[list[float]]) -> Column:
    """Corpus-side centroid assignment as one BLAS GEMM per Arrow batch
    (vectorized pandas UDF): thousands of rows x L centroids in a single
    matrix product instead of per-element interpreted lambdas.  Tie-break
    matches :func:`_nearest_centroid` exactly (equal scores -> higher
    index), so the two forms are interchangeable."""
    Cm = np.array(centroids, dtype=float)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy())
        sims = M @ Cm.T
        # argmax of the column-reversed matrix = LAST max in the original
        # order = higher index on exact ties (array_max struct semantics)
        idx = Cm.shape[0] - 1 - np.argmax(sims[:, ::-1], axis=1)
        return pd.Series(idx.astype(np.int32))

    return assign(vec)


def _top_probe_lists(vec: str, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the ``nprobe`` centroid indices nearest to ``vec`` (by dot),
    via sort_array on (score, idx) structs descending."""
    return F.expr(
        f"slice(transform(sort_array({_centroid_scores_sql(vec, centroids)}, "
        f"false), s -> s.idx), 1, {nprobe})"
    )


def train_centroids(
    df: DataFrame,
    n_lists: int = 8,
    vec_col: str = "embedding",
    sample_size: int = 2048,
    iters: int = 5,
    seed: int = 42,
    order_col: str | None = None,
) -> list[list[float]]:
    """Driver-side k-means on a bounded sample — the IVF coarse quantizer.

    Training is deliberately NOT distributed: a few thousand sampled vectors
    fit in driver memory at any corpus scale, and Lloyd iterations on them
    take milliseconds in NumPy.  The expensive parts — assignment of the
    full corpus and probing — stay distributed.  Pass ``order_col`` (an id
    column) to make the training sample deterministic on multi-partition
    inputs — a bare ``limit()`` takes whichever partitions answer first.
    """
    proj = df.select(vec_col, *( [order_col] if order_col else [] ))
    if order_col:
        proj = proj.orderBy(order_col)
    sample = np.array(
        [
            [float(x) for x in row[0]]
            for row in proj.select(vec_col).limit(sample_size).collect()
        ]
    )
    if len(sample) == 0:
        raise ValueError("train_centroids: empty corpus sample")
    n_lists = min(n_lists, len(sample))
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=n_lists, replace=False)]
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = sims.argmax(axis=1)
        for j in range(n_lists):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids.round(6).tolist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 8,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus rows are assigned to
    their nearest coarse centroid's list; each query scans only its
    ``nprobe`` nearest lists — an equi-join on the list id, so the scanned
    fraction is ~nprobe/n_lists of the corpus.

    At 100 TB the corpus would be *written partitioned by* ``list`` so probe
    queries prune file-level partitions; here the list id is a derived
    column feeding a hash join.
    """
    if centroids is None:
        centroids = train_centroids(corpus, n_lists, vec_col, order_col=id_col)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cvec"),
    )
    c = c.withColumn(
        "list", _nearest_centroid_gemm(F.col("cvec"), centroids)
    ).withColumn("cnorm", norm("cvec"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qvec"),
    )
    q = q.withColumn(
        "list", F.explode(_top_probe_lists("qvec", centroids, nprobe))
    ).withColumn("qnorm", norm("qvec"))

    scored = c.join(F.broadcast(q), "list").select(
        "query_id",
        "neighbor_id",
        (dot("cvec", "qvec") / (F.col("cnorm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def exact_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: every (a, b) with
    ``round(cosine, 6) >= threshold`` — ``(id_a, id_b, cosine)``.

    The correctness baseline for :func:`embedding_dup_pairs` (which prunes
    candidate pairs through LSH buckets).  All-pairs is O(N^2) in compute
    but organized as *blocked GEMM*: vectors hash into ``n_blocks`` blocks,
    each row is replicated to its B block-pair groups, and each group runs
    one NumPy matrix multiply over Arrow-transferred batches.  A Catalyst
    higher-order-function dot product evaluates interpreted per element and
    was measured 5-10x slower at the same N; BLAS turns the pair scoring
    into a dense kernel exactly like the disaggregation solves.  Shuffle
    volume is N x B rows against N^2 scored pairs; work per group is
    (N/B)^2 dots.  The threshold applies to the ROUNDED cosine so engines
    that differ below 1e-6 agree at the boundary.
    """
    import math

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    if n_blocks is None:
        # ~B(B+1)/2 tasks total: pick B so every core gets a few
        p = spark.sparkContext.defaultParallelism
        n_blocks = max(2, int(math.ceil(math.sqrt(2.0 * p))))

    id_type = df.schema[id_col].dataType.simpleString()
    v = df.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("vec")
    ).withColumn("blk", F.pmod(F.hash("vid"), F.lit(n_blocks)))
    replicated = (
        v.withColumn(
            "other", F.explode(F.array(*[F.lit(j) for j in range(n_blocks)]))
        )
        .withColumn("gi", F.least("blk", "other"))
        .withColumn("gj", F.greatest("blk", "other"))
    )

    def score_block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        # Arrow delivers group rows in arbitrary order; sort by id so the
        # diagonal block's triu_indices emit canonical id_a < id_b pairs
        # deterministically regardless of partitioning.
        pdf = pdf.sort_values("vid", kind="mergesort", ignore_index=True)
        gi, gj = pdf["gi"].iloc[0], pdf["gj"].iloc[0]
        mat = np.array(pdf["vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        unit = mat / np.where(norms == 0, 1.0, norms)[:, None]
        ids = pdf["vid"].to_numpy()
        if gi == gj:
            sims = unit @ unit.T
            ia, ib = np.triu_indices(len(ids), k=1)
            id_a, id_b, cos = ids[ia], ids[ib], sims[ia, ib]
        else:
            a_mask = (pdf["blk"] == gi).to_numpy()
            ua, ub = unit[a_mask], unit[~a_mask]
            ids_a, ids_b = ids[a_mask], ids[~a_mask]
            sims = ua @ ub.T
            ia, ib = np.nonzero(np.ones_like(sims, dtype=bool))
            id_a, id_b, cos = ids_a[ia], ids_b[ib], sims[ia, ib]
            swap = id_a > id_b
            id_a[swap], id_b[swap] = id_b[swap], id_a[swap].copy()
        cos = np.round(cos, 6)
        keep = cos >= threshold
        keep &= id_a != id_b
        return pd.DataFrame(
            {"id_a": id_a[keep], "id_b": id_b[keep], "cosine": cos[keep]}
        )

    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"
    return replicated.groupBy("gi", "gj").applyInPandas(
        score_block_pair, schema=out_schema
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, LSH-bucketed so
    only same-bucket pairs are compared: ``(id_a, id_b, cosine)``.

    Pass ``dim`` to skip the one-row probe job that sizes the planes."""
    if dim is None:
        dim = len(df.select(F.col(vec_col)).first()[0])
    planes = _plane_literals(dim, n_bits, seed)
    v = df.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("vec")
    )
    v = v.withColumn("bucket", bucket_expr("vec", planes)).withColumn(
        "vnorm", norm("vec")
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(
                dot("a.vec", "b.vec")
                / (F.col("a.vnorm") * F.col("b.vnorm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.95,
    backend: str = "expr",
) -> DataFrame:
    """SemDeDup-style cluster-blocked semantic deduplication (Abbas et al.
    2023, arXiv:2303.09540): assign every vector to its nearest of
    ``n_clusters`` deterministic seed centroids (the ``id < n_clusters``
    vectors), then flag as duplicate any vector that has a LOWER-id
    same-cluster neighbor with ``round(cosine, 6) >= threshold``.  Returns
    one row per input vector: ``(id, cluster, is_dup)``.

    This is the economics that makes embedding dedup feasible at corpus
    scale: the O(N^2) pair space collapses to sum(N_c^2) over clusters, and
    only same-cluster rows ever meet in the self-join.  Scale shape:

    * assignment fans out (id, seed_id, d2) triples against a BROADCAST
      seed table — the embedding arrays are never replicated K ways — and
      reduces with one ``min_by`` hash aggregation;
    * the pair stage shuffles each row once on its cluster id; within a
      cluster the join carries (id, vec, norm) and scores pairs with the
      same sequential-fold dot/norm arithmetic as :func:`exact_dup_pairs`'s
      oracle contract (fold order is bit-identical across engines, so the
      6-decimal rounding guard only arbitrates sub-ULP formula residue);
    * keep-lowest-id inside a cluster needs no connected components: "has
      ANY lower-id near neighbor" is a single semi-join-shaped aggregation,
      mirroring SemDeDup's keep-one-representative semantics.

    The K=seed variant here is the oracle-able twin; the production path at
    100k+ clusters swaps the assignment stage for
    :func:`train_centroids` + :func:`kmeans_assign` (sampled k-means, GEMM
    per Arrow batch) with the identical pair stage downstream.

    ``backend`` selects the pair-stage engine:

    * ``"expr"`` (default) — Catalyst fold arithmetic end-to-end.
      Bit-identical to a SQL oracle (the registry twin), but the
      interpreted HOF dot is the bottleneck past ~1M intra-cluster pairs.
    * ``"gemm"`` — the scale path: seeds collected once (K x d floats, the
      only driver traffic), assignment as one BLAS GEMM per Arrow batch,
      and per-cluster pair scoring as blocked GEMM inside
      ``applyInPandas`` (each cluster is one group; sims computed in
      row-blocks so peak memory is block x cluster, not cluster^2).
      Same keep-lowest-id semantics; cosine rounds at 6 decimals before
      the threshold, the same contract `exact_dup_pairs` proved
      oracle-safe.  Sized for fixed cluster OCCUPANCY: pick
      ``n_clusters ~ N / 1024`` and total scored pairs stay ~N x 512 —
      LINEAR in the corpus, the SemDeDup economics at 100 TB.
    """
    if backend not in ("expr", "gemm"):
        raise ValueError(f"backend must be 'expr' or 'gemm', got {backend!r}")
    v = df.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("vec")
    )
    if backend == "gemm":
        return _semantic_dedup_gemm(v, id_col, n_clusters, threshold)
    seeds = v.filter(F.col("vid") < n_clusters).select(
        F.col("vid").alias("seed_id"), F.col("vec").alias("seed")
    )
    d2 = v.crossJoin(F.broadcast(seeds)).select(
        "vid",
        "seed_id",
        F.expr(
            "aggregate(zip_with(vec, seed, (a, b) -> (a - b) * (a - b)), "
            "0.0D, (acc, x) -> acc + x)"
        ).alias("d2"),
    )
    # (vid -> cluster) is vector-free and feeds THREE consumers (both pair
    # sides and the final labeling): persist it, or the K-way distance fold
    # + min_by aggregation is re-planned and re-executed once per consumer
    # (measured: three identical fold+SortAggregate subtrees in the
    # unpersisted plan, plans/r13/semantic_dedup_before.txt)
    assign = (
        d2.groupBy("vid")
        .agg(F.min_by("seed_id", F.struct("d2", "seed_id")).alias("cluster"))
        .persist()
    )
    av = v.join(assign, "vid").withColumn("vnorm", norm("vec"))
    # the pair stage is CPU-dense (interpreted HOF dot per pair) on tiny
    # bytes: pin its partition count so AQE's size-based coalescing cannot
    # collapse it to one task (measured: a 2.4s 1-task stage at sf0.1)
    from tsdisagg_spark.operators._par import pin_compute_parallelism

    av = pin_compute_parallelism(av, "cluster")
    a, b = av.alias("a"), av.alias("b")
    dups = (
        a.join(b, "cluster")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .filter(
            F.round(
                dot("a.vec", "b.vec")
                / (F.col("a.vnorm") * F.col("b.vnorm")),
                6,
            )
            >= threshold
        )
        .select(F.col("b.vid").alias("vid"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return assign.join(dups, "vid", "left").select(
        F.col("vid").alias(id_col),
        "cluster",
        F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
    )


def semantic_index(
    df: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "expr",
) -> DataFrame:
    """Cluster index of an embedding corpus: every vector assigned to its
    nearest seed centroid — ``(id, cluster, vec, vnorm)``, the structure a
    continuously-ingested pipeline persists so new batches are
    semantically deduplicated against the corpus WITHOUT re-clustering or
    re-pairing it (the embedding analog of :func:`dedup.minhash_band_index`).

    ``seeds`` is a ``(seed_id, seed)`` frame (any deterministic rule —
    the registry query uses a plain id filter so a SQL engine reproduces
    the exact index).  Assignment is the same broadcast fold argmin as
    :func:`semantic_dedup`'s expr path: bit-identical across engines and
    sessions, which is what makes the index durable rather than
    session-scoped (pinned by a parquet round-trip test).  Production
    swap at many-cluster scale: :func:`kmeans_assign` (GEMM per Arrow
    batch), same output contract.
    """
    v = df.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("vec")
    )
    if backend == "gemm":
        seed_rows = sorted(seeds.collect(), key=lambda r: r.seed_id)
        centroids = [list(r.seed) for r in seed_rows]
        id_to_seed = np.array(
            [int(r.seed_id) for r in seed_rows], dtype=np.int64
        )
        assigned = kmeans_assign(v, centroids, vec_col="vec")
        # map centroid index back to seed id via an expression (literal
        # array lookup — stays in codegen, no UDF)
        lookup = F.array(*[F.lit(int(s)) for s in id_to_seed])
        return assigned.withColumn("vnorm", norm("vec")).select(
            F.col("vid").alias(id_col),
            F.element_at(lookup, F.col("cluster") + 1).alias("cluster"),
            "vec",
            "vnorm",
        )
    d2 = v.crossJoin(F.broadcast(seeds)).select(
        "vid",
        "seed_id",
        F.expr(
            "aggregate(zip_with(vec, seed, (a, b) -> (a - b) * (a - b)), "
            "0.0D, (acc, x) -> acc + x)"
        ).alias("d2"),
    )
    assign = d2.groupBy("vid").agg(
        F.min_by("seed_id", F.struct("d2", "seed_id")).alias("cluster")
    )
    return (
        v.join(assign, "vid")
        .withColumn("vnorm", norm("vec"))
        .select(
            F.col("vid").alias(id_col), "cluster", "vec", "vnorm"
        )
    )


def semantic_probe(
    batch: DataFrame,
    index: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    backend: str = "expr",
) -> DataFrame:
    """Incremental semantic dedup: probe a NEW embedding batch against a
    persisted :func:`semantic_index`, returning ``(batch_id, corpus_id,
    cosine)`` for every batch vector whose rounded cosine against a
    same-cluster indexed vector meets ``threshold``.

    Scale shape — why this beats re-running SemDeDup per ingest: the
    batch is assigned against the SAME seed table (broadcast fold, O(batch
    x K)) and then BROADCAST into a hash join on ``cluster`` — the
    corpus-sized index STREAMS map-side, is never shuffled, and is never
    paired against itself.  Ingest cost is O(batch x occupancy + matches),
    independent of corpus size.  Batch-vs-batch pairs are deliberately not
    emitted (that is a :func:`semantic_dedup` run over the batch alone).

    ``backend="gemm"`` is the many-cluster scale path: the batch assigns
    through :func:`semantic_index`'s GEMM route and scoring runs as one
    BLAS product per cluster via a COGROUPED ``applyInPandas`` (batch
    group x index group) — pair rows are never materialized as a join,
    only the >= threshold survivors leave the kernel.  Same rounded-
    cosine contract, equivalence test-pinned.
    """
    b = semantic_index(batch, seeds, id_col, vec_col, backend=backend)
    if backend == "gemm":
        cut = float(threshold) - 5e-7

        def score(bpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
            if bpdf.empty or cpdf.empty:
                return pd.DataFrame(
                    {"batch_id": [], "corpus_id": [], "cosine": []}
                ).astype(
                    {
                        "batch_id": "int64",
                        "corpus_id": "int64",
                        "cosine": "float64",
                    }
                )
            B = np.stack(bpdf["vec"].to_numpy()).astype(float)
            C = np.stack(cpdf["vec"].to_numpy()).astype(float)
            bn = bpdf["vnorm"].to_numpy().astype(float)
            cn = cpdf["vnorm"].to_numpy().astype(float)
            bn[bn == 0.0] = 1.0
            cn[cn == 0.0] = 1.0
            sims = (B / bn[:, None]) @ (C / cn[:, None]).T
            bi, ci = np.nonzero(sims >= cut)
            return pd.DataFrame(
                {
                    "batch_id": bpdf[id_col].to_numpy()[bi],
                    "corpus_id": cpdf[id_col].to_numpy()[ci],
                    "cosine": np.round(sims[bi, ci], 6),
                }
            )

        return (
            b.groupBy("cluster")
            .cogroup(index.groupBy("cluster"))
            .applyInPandas(
                score, "batch_id long, corpus_id long, cosine double"
            )
        )
    b = b.alias("b")
    c = index.alias("c")
    return (
        c.join(F.broadcast(b), "cluster")
        .select(
            F.col(f"b.{id_col}").alias("batch_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
            F.round(
                dot("b.vec", "c.vec")
                / (F.col("b.vnorm") * F.col("c.vnorm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _semantic_dedup_gemm(
    v: DataFrame, id_col: str, n_clusters: int, threshold: float
) -> DataFrame:
    """GEMM backend of :func:`semantic_dedup` over the normalized
    ``(vid, vec)`` frame — see that docstring for the contract."""
    seed_rows = sorted(
        v.filter(F.col("vid") < n_clusters).collect(), key=lambda r: r.vid
    )
    seed_ids = [int(r.vid) for r in seed_rows]
    centroids = [list(r.vec) for r in seed_rows]
    # centroid index i corresponds to seed vid seed_ids[i]; kmeans_assign
    # breaks exact distance ties toward the LOWEST index = lowest seed vid
    # (seed_rows are vid-sorted), matching the expr path's min_by order.
    assigned = kmeans_assign(v, centroids, vec_col="vec")
    id_to_seed = np.array(seed_ids, dtype=np.int64)

    # ``round(x, 6) >= thr`` restated boundary-inclusively as ``x >= cut``:
    # HALF_UP rounding promotes anything from half-a-grid-step below the
    # threshold, so the comparison cut sits 5e-7 under it (same 1-ulp
    # boundary residue class as the rounded form — the equivalence test
    # pins the two backends on data away from the boundary).
    cut = float(threshold) - 5e-7

    def flag(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid").reset_index(drop=True)
        M = np.stack(pdf["vec"].to_numpy()).astype(float)
        nrm = np.sqrt((M * M).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        M /= nrm[:, None]
        n = M.shape[0]
        dup = np.zeros(n, dtype=bool)
        block = 1024
        for s in range(1, n, block):
            e = min(s + block, n)
            cols = np.arange(s, e)
            undecided = np.ones(e - s, dtype=bool)
            # chunk the earlier rows; dup-dense corpora resolve most
            # columns in the first chunk, so work collapses toward
            # O(n x chunk) instead of the full lower triangle
            for cs_ in range(0, e, block):
                ce = min(cs_ + block, e)
                if not undecided.any():
                    break
                live = np.flatnonzero(undecided)
                sims = M[cs_:ce] @ M[cols[live]].T
                # row index must stay strictly below the column's global
                # index (only lower-vid neighbors count)
                mask = (cs_ + np.arange(ce - cs_))[:, None] < cols[live][None, :]
                hit = ((sims >= cut) & mask).any(axis=0)
                dup[cols[live[hit]]] = True
                undecided[live[hit]] = False
        return pd.DataFrame(
            {
                "vid": pdf["vid"],
                "cluster": id_to_seed[pdf["cluster"].to_numpy()],
                "is_dup": dup,
            }
        )

    out = assigned.groupBy("cluster").applyInPandas(
        flag, "vid long, cluster long, is_dup boolean"
    )
    return out.select(
        F.col("vid").alias(id_col), "cluster", "is_dup"
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qmax: int = 127,
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the storage /
    bandwidth compression step of a large-scale ANN index (4x smaller than
    float32; dot products stay proportional under one per-vector scale).

    Per vector: ``scale = max(|x|) / qmax`` (floored at 1e-12 so zero
    vectors quantize to zeros instead of dividing by zero), ``q_i =
    floor(x_i / scale + 0.5)`` — round-half-toward-+inf spelled as pure
    IEEE arithmetic, because Spark's ``round()`` re-parses the double's
    shortest string form (``BigDecimal.valueOf``) while other engines round
    the raw double, and the two disagree one ULP away from ``.5``.
    Emitted exploded as integer rows ``(id, pos, q, scale_q)`` with
    ``scale_q = floor(scale * 1e9 + 0.5)`` — the same integer-quanta shape
    as the multimodal feature oracle queries, so a SQL oracle can recompute
    every lane without float-at-6-decimals hashing hazards.  Pure codegen
    (transform/array_max/posexplode).
    """
    base = df.select(F.col(id_col), F.col(vec_col)).withColumn(
        "__scale",
        F.greatest(
            F.array_max(F.transform(F.col(vec_col), F.abs)) / F.lit(float(qmax)),
            F.lit(1e-12),
        ),
    )
    return base.select(
        F.col(id_col), F.col("__scale"), F.posexplode(vec_col).alias("pos0", "x")
    ).select(
        F.col(id_col),
        F.col("pos0").cast("long").alias("pos"),
        F.floor(F.col("x") / F.col("__scale") + F.lit(0.5)).alias("q"),
        F.floor(F.col("__scale") * 1e9 + F.lit(0.5)).alias("scale_q"),
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every row to its nearest centroid by squared Euclidean
    distance (lowest index wins exact ties) — one BLAS GEMM per Arrow
    batch via the identity argmin ||x-c||^2 = argmax (x.c - ||c||^2 / 2);
    the ||x||^2 term is constant per row and drops out.  Adds a
    ``cluster int`` column; the corpus never shuffles."""
    Cm = np.array(centroids, dtype=float)
    half_sq = 0.5 * (Cm * Cm).sum(axis=1)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(float)
        score = M @ Cm.T - half_sq
        return pd.Series(np.argmax(score, axis=1).astype(np.int32))

    return df.withColumn("cluster", assign(F.col(vec_col)))


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    tol: float = 1e-6,
) -> dict:
    """Fully distributed Lloyd's k-means over an embedding column.

    The scale contract (vs :func:`train_centroids`, the bounded-sample
    coarse quantizer): here the FULL corpus drives both steps, and only
    k x d floats ever cross the driver boundary per round —

    * E-step: assignment is one GEMM per Arrow batch (``mapInPandas``);
    * M-step: each batch emits k x d partial (cluster, pos, sum, count)
      rows — a few hundred per batch regardless of batch size — which one
      hash aggregation reduces to the k x d centroid table the driver
      collects (tree-aggregate shape: no per-row shuffle, no
      ``collect()`` of data rows).

    Init is deterministic: the k rows with the smallest ``id_col`` values.
    Empty clusters keep their previous centroid.  Stops when the max
    centroid L2 shift drops below ``tol`` or after ``max_iter`` rounds.

    Returns ``{"centroids": list[k][d], "n_iter": int, "inertia": float}``
    (inertia = sum of squared distances to the assigned centroid, from the
    final assignment pass).
    """
    seeds = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if len(seeds) < k:
        raise ValueError(f"kmeans_fit: corpus has fewer than k={k} rows")
    centroids = np.array([[float(x) for x in r[1]] for r in seeds])
    d = centroids.shape[1]
    vecs = df.select(vec_col)

    partial_schema = "cluster int, pos int, s double, n long"

    def partials_for(Cm: np.ndarray):
        half_sq = 0.5 * (Cm * Cm).sum(axis=1)

        def emit(batches):
            for pdf in batches:
                M = np.stack(pdf[vec_col].to_numpy()).astype(float)
                assign = np.argmax(M @ Cm.T - half_sq, axis=1)
                sums = np.zeros((len(Cm), d))
                np.add.at(sums, assign, M)
                counts = np.bincount(assign, minlength=len(Cm))
                nz = np.repeat(np.arange(len(Cm)), d)
                yield pd.DataFrame(
                    {
                        "cluster": nz.astype(np.int32),
                        "pos": np.tile(np.arange(d), len(Cm)).astype(np.int32),
                        "s": sums.ravel(),
                        "n": np.repeat(counts, d).astype(np.int64),
                    }
                )

        return emit

    n_iter = 0
    for _ in range(max_iter):
        rows = (
            vecs.mapInPandas(partials_for(centroids), schema=partial_schema)
            .groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new_c = centroids.copy()
        for r in rows:
            if r["n"] > 0:
                new_c[r["cluster"], r["pos"]] = r["s"] / r["n"]
        n_iter += 1
        shift = float(np.sqrt(((new_c - centroids) ** 2).sum(axis=1)).max())
        centroids = new_c
        if shift < tol:
            break

    # final inertia in one distributed pass (same partial-sum shape)
    Cm = centroids
    half_sq = 0.5 * (Cm * Cm).sum(axis=1)

    def inertia_partials(batches):
        for pdf in batches:
            M = np.stack(pdf[vec_col].to_numpy()).astype(float)
            score = M @ Cm.T - half_sq
            assign = np.argmax(score, axis=1)
            diff = M - Cm[assign]
            yield pd.DataFrame({"i": [float((diff * diff).sum())]})

    inertia = (
        vecs.mapInPandas(inertia_partials, schema="i double")
        .agg(F.sum("i").alias("i"))
        .collect()[0]["i"]
    )
    return {
        "centroids": centroids.tolist(),
        "n_iter": n_iter,
        "inertia": float(inertia or 0.0),
    }


def pq_subvectors(
    df: DataFrame,
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Split each embedding into its ``m`` product-quantization subspaces:
    ``(id, sub, sv)`` with ``sv`` the ``sub_dim``-wide double slice — one
    map-side explode, the shared front end of :func:`pq_encode` and the
    ADC lookup-table build."""
    # one-expr build (same named_struct typing as the F.struct/F.lit form;
    # see the module-head note on HOF lambda construction cost)
    items = ", ".join(
        f"named_struct('sub', CAST({j} AS BIGINT), "
        f"'sv', slice(transform({vec_col}, x -> CAST(x AS DOUBLE)), "
        f"{j * sub_dim + 1}, {sub_dim}))"
        for j in range(m)
    )
    return df.select(
        F.col(id_col), F.expr(f"explode(array({items}))").alias("s")
    ).select(id_col, "s.sub", "s.sv")


def _sub_d2(a: Column | str, b: Column | str) -> Column:
    """Squared L2 between two subvectors as a sequential fold —
    left-to-right like DuckDB's list_sum, so cross-engine bit-identical."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            "0.0D, (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    seeds: DataFrame,
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding (Jegou, Douze & Schmid 2011): every
    vector becomes ``m`` codebook ids — ``(id, sub, code, sub_d2)``, one
    row per subspace, ``sub_d2`` the squared distance to the chosen
    centroid (the reconstruction error lane).  At 64 dims / 8 subspaces /
    byte codes this is a 32x memory compression, which is what lets an
    ANN index over 10^10 embeddings live in RAM on a cluster.

    ``seeds`` is a ``(sub, code, cent)`` codebook (the registry derives
    it from the corpus's first vectors so a SQL engine rebuilds it
    exactly; the production swap trains per-subspace :func:`kmeans_fit`
    codebooks, same contract).  Plan: one explode, one broadcast hash
    join against the m x k codebook, one min_by per (vector, subspace) —
    the corpus never shuffles, and every arithmetic step is a sequential
    fold, so rows are bit-identical across engines (no float-grid
    residual; ties break on code id).
    """
    v = pq_subvectors(df, m, sub_dim, id_col, vec_col)
    d2 = v.join(F.broadcast(seeds), "sub").select(
        F.col(id_col),
        "sub",
        "code",
        _sub_d2("sv", "cent").alias("d2"),
    )
    best = d2.groupBy(id_col, "sub").agg(
        F.min(F.struct("d2", "code")).alias("b")
    )
    return best.select(
        id_col,
        "sub",
        F.col("b.code").alias("code"),
        F.round(F.col("b.d2"), 6).alias("sub_d2"),
    )


def pq_adc_topk(
    codes: DataFrame,
    seeds: DataFrame,
    probe_subs: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the probe builds an
    ``m x |codebook|`` lookup table of exact subspace distances (broadcast
    — it is codebook-sized, never corpus-sized), each encoded vector's
    approximate distance is the sum of its ``m`` table entries, and the
    top-k is a distributed TakeOrdered.  The corpus side touches ONLY the
    8-byte codes — the full vectors never load, which is the entire point
    of PQ at 100 TB.

    ``probe_subs`` is the probe vector through :func:`pq_subvectors`.
    The per-vector sum adds ``m`` doubles (group order is engine-chosen),
    so ``adc_d2`` lands on the 6-decimal grid with a ~1e-9/vector tie
    probability — float-grid safe to ~1e8 corpus vectors, then switch to
    an exact fixed-point lane per the verify recipe.  Ranking compares
    the ROUNDED distance with id tie-breaks."""
    lut = (
        probe_subs.join(F.broadcast(seeds), "sub")
        .select(
            "sub", "code", _sub_d2("sv", "cent").alias("qd2")
        )
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("qd2"), 6).alias("adc_d2"))
    )
    top = scored.orderBy(F.col("adc_d2").asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("adc_d2").asc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        id_col, "adc_d2", "rank"
    )


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Exact fixed-point Gram matrix ``G = Q^T Q`` over the embedding
    corpus, where ``Q`` is the embeddings quantized to integers by
    ``floor(x * scale + 0.5)`` — the covariance/PCA/whitening precursor
    (subtract the mean outer product downstream), computed as a certified
    integer aggregate rather than an order-dependent float sum.

    Returns the upper triangle: ``(i, j, gram_c, gram)`` with ``i <= j``,
    ``gram_c`` the exact integer sum as BIGINT and ``gram`` the DOUBLE
    cast of the SAME exact integer — so ``gram`` stays hash-exact at ANY
    corpus size (both engines round the identical exact integer to the
    nearest double), while ``gram_c``'s int64 projection is safe while
    ``N * (scale * max|x|)^2 < 9.2e18`` (|x| <= 8 at scale=1000 ->
    ~1.4e12 rows; the DECIMAL(38,0) accumulator itself never wraps —
    overflow would surface as NULL, per the headroom rule).

    Determinism: quantization multiplies the float32 lane in DOUBLE
    (exact: 24-bit mantissa x 10-bit scale < 53 bits), adds 0.5 (exact at
    these magnitudes) and floors — no round() tie semantics anywhere;
    numpy applies the identical IEEE ops.

    Scale shape: the classic distributed GEMM — each Arrow batch computes
    its own ``q.T @ q`` partial in one int64 matrix multiply (batch
    bound: 10k rows x 6.4e7/cell-row ~ 6.4e11, far inside int64), and
    only d(d+1)/2 partial cells per batch cross the shuffle.  The corpus
    never shuffles; driver sees nothing."""
    dec = "decimal(38,0)"

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            arr = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(arr * float(scale) + 0.5).astype(np.int64)
            g = q.T @ q
            iu = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu[0].astype(np.int64),
                    "j": iu[1].astype(np.int64),
                    "partial": g[iu],
                }
            )

    partials = df.select(vec_col).mapInPandas(
        gen, schema="i long, j long, partial long"
    )
    total = F.sum(F.col("partial").cast(dec))
    return (
        partials.groupBy("i", "j")
        .agg(
            total.cast("long").alias("gram_c"),
            total.cast("double").alias("gram"),
        )
        .select("i", "j", "gram_c", "gram")
    )


def pca_scores(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int | None = 8,
    scale: int = 1000,
) -> DataFrame:
    """Distributed PCA: fit on the EXACT fixed-point second-moment
    statistics (:func:`gram_matrix` plus an integer lane-sum for the
    mean), eigendecompose the d x d covariance on the driver, and project
    the corpus onto the top-``k`` components in one Arrow-batched GEMM
    pass — the whitening / dimensionality-reduction step ahead of ANN
    indexing and SemDeDup-style clustering.

    Returns ``(id, comp, score)`` rows, ``comp`` in ``[0, k)`` ordered by
    descending eigenvalue.  Sign convention: each component's
    largest-|loading| entry is made positive, so the output is
    deterministic (eigenvectors are otherwise defined only up to sign).

    Exactness class: the SUFFICIENT STATISTICS are certified integers
    (the `embedding_gram` oracle hash-checks the same G), but the
    eigendecomposition is numpy-on-driver — not SQL-derivable, so the
    registry carries this as a rows-only query; the math is pinned by
    tests instead (scores decorrelate, variances match eigenvalues and
    sort descending, and the whole pipeline reproduces a single-node
    numpy PCA on the identical quantized input).

    Scale shape: ONE integer aggregate whose output is d(d+1)/2 + d + 1
    cells (data-size-independent driver collect, per the bounded-collect
    rule), then a map-only projection — the corpus is scanned twice
    total (fit + project) and crosses zero shuffles.  The fit statistics
    (gram upper triangle, per-lane sums, row count) ride ONE mapInPandas
    pass: the earlier shape ran gram and lane-sums as two separate jobs,
    paying the corpus scan and the Python decode boundary twice for
    statistics that the same quantized batch yields together (r13 opt,
    guide section 1.2 "don't compute things twice" — measured plan: two
    full-corpus jobs collapsed to one, identical eigenbasis since the
    collected integers are identical).

    ``k=None`` projects onto ALL ``d`` components, with ``d`` taken from
    the fit statistics themselves — callers that need the full basis
    (:func:`pca_parseval`) then skip the one-row probe job that would
    otherwise run just to size ``k`` (r13 opt, guide section 1)."""
    if k is not None and k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    dec = "decimal(38,0)"

    def fit_stats(batches):
        # one batch pass yields ALL fit statistics: gram partials on the
        # upper triangle (j >= 0), per-lane sums tagged j == -1, and the
        # batch row count tagged (i, j) == (-1, -1).  Integer lanes are
        # exact: per-batch bounds are the gram_matrix ones (see docstring
        # there), the lane sum is <= 10k rows x 8e3 per cell << int64.
        for pdf in batches:
            if pdf.empty:
                continue
            arr = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(arr * float(scale) + 0.5).astype(np.int64)
            g = q.T @ q
            iu = np.triu_indices(g.shape[0])
            dim = g.shape[0]
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu[0], np.arange(dim), [-1]]
                    ).astype(np.int64),
                    "j": np.concatenate(
                        [iu[1], np.full(dim, -1), [-1]]
                    ).astype(np.int64),
                    "partial": np.concatenate(
                        [g[iu], q.sum(axis=0), [len(pdf)]]
                    ).astype(np.int64),
                }
            )

    cells = (
        df.select(vec_col)
        .mapInPandas(fit_stats, schema="i long, j long, partial long")
        .groupBy("i", "j")
        # the decimal total is cast to double HERE (same engine-side
        # decimal -> double cast the split formulation used), so the
        # doubles the driver sees are bit-identical to the old path's
        .agg(F.sum(F.col("partial").cast(dec)).cast("double").alias("tot"))
        .collect()
    )
    if not cells:
        raise ValueError("pca_scores: empty input corpus — nothing to fit")
    n = int(next(r["tot"] for r in cells if r["i"] == -1))
    d = max(r["i"] for r in cells) + 1
    if k is None:
        k = d
    if k > d:
        raise ValueError(f"k={k} exceeds dimension {d}")
    g = np.zeros((d, d))
    m = np.zeros(d)
    for r in cells:
        if r["i"] == -1:
            continue
        if r["j"] == -1:
            m[r["i"]] = r["tot"] / n
        else:
            g[r["i"], r["j"]] = g[r["j"], r["i"]] = r["tot"]
    cov = (g - n * np.outer(m, m)) / max(n - 1, 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order]  # (d, k)
    flips = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(k)])
    comps = comps * np.where(flips == 0, 1.0, flips)

    def project(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            arr = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(arr * float(scale) + 0.5)
            scores = (q - m) @ comps  # (n, k)
            n_rows = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), k),
                    "comp": np.tile(np.arange(k, dtype=np.int64), n_rows),
                    "score": scores.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} long, comp long, score double"
    )


def pca_parseval(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """Parseval certification of :func:`pca_scores` — the SQL-checkable
    half of the PCA math: project onto ALL ``d`` components (``k=d``) and
    return each vector's rounded sum of squared scores in embedding units,
    ``(id, sq_norm)``.

    A full orthonormal projection preserves norms, so mathematically
    ``sq_norm == ||q/scale - m/scale||^2`` — the centered squared norm an
    oracle recomputes directly from the quantized lanes WITHOUT the
    eigendecomposition.  A hash match therefore certifies, through the
    numpy-on-driver step the registry cannot SQL-derive, that the fitted
    basis is genuinely orthonormal and complete and the Arrow GEMM
    projection applies it correctly — complementing the `embedding_gram`
    oracle (which certifies the sufficient statistics feeding ``eigh``).
    The invariant is basis-independent, so it stays exact even under
    degenerate eigenvalues where individual scores are not unique.

    The full basis is requested with ``k=None``, so the embedding
    dimension comes from the fit statistics and no one-row probe job
    runs at construction (r13 opt: the probe was a 0.12s job per call
    whose answer the fit collect already contained).

    Float-grid bound (verify SKILL rule): both engines compute the same
    mathematical value through different float paths (rotated-coordinate
    squares vs centered-lane squares), differing by ~d*ulp + the eigh
    orthonormality defect ~ 1e-13 absolute at unit-norm embeddings; on
    the 1e-6 grid that is ~2e-7 tie probability per row -> safe to
    ~5e5 vectors (expected flips 0.1), far above every test tier; past
    that, :func:`pca_parseval_exact` (n^2-scaled centered integer lanes)
    carries the certification with no residual tie probability.
    """
    inv = 1.0 / (float(scale) * float(scale))
    return (
        pca_scores(df, vec_col=vec_col, id_col=id_col, k=None, scale=scale)
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("score") * F.col("score")) * inv, round_to
            ).alias("sq_norm")
        )
    )


def pca_parseval_exact(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    rel_tol: float = 1e-9,
    abs_tol: float = 1e-6,
) -> DataFrame:
    """Exact-integer twin of :func:`pca_parseval` — the certification
    that stays hash-exact PAST the float-grid bound (~5e5 vectors) where
    the rounded-double variant's residual tie probability accumulates.

    Two outputs per vector:

    * ``sq_norm_n2`` — the n^2-scaled centered squared norm
      ``SUM_i (n*q_i - s_i)^2`` where ``q`` are the quantized integer
      lanes, ``s`` the integer lane sums and ``n`` the corpus count.
      Multiplying the centered lane ``q_i - s_i/n`` by ``n`` clears the
      division, so every term is an EXACT INTEGER; accumulated in
      DECIMAL(38,0) (engine) / HUGEINT (oracle) and cast to DOUBLE only
      in the final projection, both engines round the IDENTICAL exact
      integer to the nearest double — hash-exact at ANY corpus size, no
      grid, no ties (the pricing_summary_exact discipline).
    * ``parseval_ok`` — the PCA certification itself, engine-side: 1 iff
      the ROTATED float norm (sum of squared :func:`pca_scores` scores
      over all ``d`` components) agrees with the exact integer within
      ``rel_tol`` + ``abs_tol``.  The fitted eigh basis being orthonormal
      and complete makes the two equal up to ~d^2 ulp (~1e-12 relative);
      a non-orthonormal or truncated basis moves the rotated norm by
      O(1) relative — six decades past the gate, so the flag is
      tolerance-robust.  The oracle emits the CONSTANT 1: any vector
      whose rotation broke Parseval hash-mismatches.

    Headroom (per the integer-aggregate rule): ``n * q_i`` <= 8e13 at
    n = 1e10 rows and |q| <= 8000, so the int64 term has ~1e5x slack;
    the DECIMAL(38,0) square-sum carries ~6e7x slack at the same tier
    (overflow surfaces as NULL, never a wrapped value).

    Scale shape: one bounded d+1-value driver collect (lane sums), a
    map-only codegen pass for the exact lanes (literal ``s`` array, no
    shuffle), the :func:`pca_scores` projection, and two narrow id-keyed
    exchanges (the score regroup and the cert join)."""
    sums = (
        df.select(
            F.posexplode(
                F.transform(
                    F.col(vec_col),
                    lambda x: F.floor(
                        x.cast("double") * float(scale) + F.lit(0.5)
                    ).cast("long"),
                )
            ).alias("i", "q")
        )
        .groupBy("i")
        .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    if not sums:
        raise ValueError(
            "pca_parseval_exact: empty input — cannot fit a basis or "
            f"infer the dimension from column {vec_col!r}"
        )
    d = max(r["i"] for r in sums) + 1
    n = sums[0]["n"]
    s_arr = [0] * d
    for r in sums:
        s_arr[r["i"]] = r["s"]
    # exact per-row integer: zip the quantized lanes with the literal
    # lane-sum array, term = n*q - s (int64), square-sum in DECIMAL(38,0)
    s_lit = F.array(*[F.lit(int(v)).cast("long") for v in s_arr])
    q_lanes = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * float(scale) + F.lit(0.5)).cast(
            "long"
        ),
    )
    terms = F.zip_with(
        q_lanes, s_lit, lambda q, s: (F.lit(int(n)) * q - s).cast("decimal(18,0)")
    )
    exact = df.select(
        F.col(id_col),
        F.aggregate(
            terms,
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, t: acc + t * t,
        ).alias("__e"),
    )
    rotated = (
        pca_scores(df, vec_col=vec_col, id_col=id_col, k=d, scale=scale)
        .groupBy(id_col)
        .agg(F.sum(F.col("score") * F.col("score")).alias("__r"))
    )
    n2 = float(n) * float(n)
    e_dbl = F.col("__e").cast("double")
    return (
        exact.join(rotated, [id_col])
        .select(
            F.col(id_col),
            e_dbl.alias("sq_norm_n2"),
            (
                F.abs(F.col("__r") - e_dbl / F.lit(n2))
                <= F.lit(rel_tol) * e_dbl / F.lit(n2) + F.lit(abs_tol)
            )
            .cast("long")
            .alias("parseval_ok"),
        )
    )
