"""Distributed probabilistic sketches with deterministic, SQL-mirrorable
hashing.

The point of a sketch at 100 TB is that its STATE is tiny while its input
is not: a Bloom filter over a billion join keys is a few MB — small enough
to broadcast — so it can pre-prune the probe side of a join before any
shuffle moves full rows (the classic "Bloom-pruned join" / semi-join
reduction).  Spark's own runtime row-group filters do this opportunistically;
this module exposes the building blocks as first-class operators whose
behavior is exactly reproducible in any SQL engine, which is what makes
them oracle-checkable: hashing is md5-prefix arithmetic (available and
bit-identical in Spark and DuckDB), not engine-private xxhash.

Bloom filter layout: ``m_bits`` positions packed into 63-bit words
(bit 63 is never used — a portable choice: engines differ on whether
``1 << 63`` overflows a signed 64-bit integer).  Build is a hash-explode +
``bit_or`` group-by: map-side partial aggregation means each executor
contributes one k-word partial, and only filter-sized state crosses the
shuffle — never key rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: bits per packed word; bit 63 stays clear so `1 << bit` is portable
WORD_BITS = 63


def hash_position(key: Column, salt: int, m_bits: int) -> Column:
    """Deterministic position in ``[0, m_bits)``: the first 8 hex chars of
    ``md5(key || ':salt')`` as an integer, mod ``m_bits``.  Bit-identical in Spark
    (``conv(substring(md5(..), 1, 8), 16, 10)``) and DuckDB
    (``('0x' || substr(md5(..), 1, 8))::BIGINT``)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m_bits


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 64512,
    n_hashes: int = 2,
) -> DataFrame:
    """Build a Bloom filter over the distinct values of ``key_col`` as a
    ``(word_idx, word)`` table of ``ceil(m_bits / 63)`` packed rows.

    The result is data-size-independent (filter-sized), so downstream
    probes broadcast it.  Words with no set bits are absent — probes must
    treat a missing word as all-zeros (the inner-join + hit-count pattern
    in :func:`bloom_probe` does this for free)."""
    keys = df.select(F.col(key_col).alias("k")).distinct()
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    hash_position(F.col("k"), i, m_bits)
                    for i in range(1, n_hashes + 1)
                ]
            )
        ).alias("pos")
    )
    return pos.select(
        F.expr(f"pos DIV {WORD_BITS}").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))").alias("bit"),
    ).groupBy("word_idx").agg(F.bit_or("bit").alias("word"))


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch over ``key_col`` occurrences: a ``(row, col, c)``
    table of at most ``depth * width`` cells.

    Each input row increments one counter per hash row; a point query
    reads ``depth`` cells and takes the MIN, so estimates NEVER
    undercount and overcount by at most ``2n/width`` with probability
    ``1 - 2^-depth`` (Cormode & Muthukrishnan 2005).  Like the Bloom
    filter, the state is data-size-independent — build is one group-by
    whose map-side partials are already sketch-sized, and probes
    broadcast the finished sketch.  ``weight_col`` switches from counts
    to weighted sums (e.g. revenue per key)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        hash_position(F.col(key_col), 100 + r, width).alias(
                            "col"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
        w.cast("long").alias("w"),
    )
    return cells.groupBy("cell.row", "cell.col").agg(
        F.sum("w").alias("c")
    )


def cms_estimate(
    df: DataFrame,
    cms: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query estimates: ``df`` plus ``est`` = min over the sketch's
    ``depth`` cells for each key.  Deterministic: same keys + same sketch
    → same estimate, on any engine that can compute the md5 positions.
    Missing cells cannot occur for keys that were counted (every key
    increments all ``depth`` rows); for never-seen keys an absent cell
    means estimate 0, handled by the NULL-lookup coalesce.

    Plan shape (r13): the ``depth x width`` cell table folds into a
    ONE-ROW broadcast MAP keyed on ``row * width + col``, and the
    estimate is ``least()`` over ``depth`` element_at lookups riding the
    probe scan — no explode, no per-key distinct, no join-back (the
    earlier equi-join formulation cost four exchanges on the probe
    side; estimates identical)."""
    cm = cms.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("row") * width + F.col("col")).alias("mk"),
                    F.col("c"),
                )
            )
        ).alias("__cm")
    )
    out = df.crossJoin(F.broadcast(cm))
    lookups = []
    for r in range(depth):
        out = out.withColumn(
            f"__c{r}", hash_position(F.col(key_col), 100 + r, width)
        )
        lookups.append(
            f"coalesce(element_at(__cm, {r * width} + __c{r}), 0L)"
        )
    est = lookups[0] if depth == 1 else f"least({', '.join(lookups)})"
    return out.withColumn("est", F.expr(est)).drop(
        "__cm", *[f"__c{r}" for r in range(depth)]
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count estimate per group (Bar-Yossef et
    al. 2002): hash every key to a uniform fraction in [0, 1), keep each
    group's ``k`` smallest, and estimate ``distinct ~= (k-1) / h_k`` where
    ``h_k`` is the k-th smallest hash.  Groups with fewer than ``k``
    distinct keys are EXACT (the sketch saw every key and reports the
    count).

    Unlike HLL this is deterministic arithmetic over md5 fractions — any
    engine with md5 reproduces the estimate bit-for-bit, which is what
    makes a cross-engine oracle possible at all.  State per group is k
    doubles; the top-k runs as the usual window rank, whose partial
    ordering is map-side combinable.

    Returns ``group_cols + (n_seen, est_distinct)`` where ``n_seen`` is
    the number of sketch slots filled (== distinct count when < k)."""
    gcols = list(group_cols or [])
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":kmv"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    hashed = df.select(*gcols, F.col(key_col)).distinct().select(
        *gcols, frac.alias("h")
    )
    w = Window.partitionBy(*gcols).orderBy("h") if gcols else (
        Window.partitionBy(F.lit(1)).orderBy("h")
    )
    topk = hashed.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    return topk.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(float(k - 1))) / F.max("h")),
            6,
        ).alias("est_distinct"),
    )


def _kmv_kept(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """The (key, h) pairs a k-minimum-values sketch retains: the ``k``
    smallest hash fractions over the distinct keys."""
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("kk").cast("string"), F.lit(":kmv"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    hashed = df.select(F.col(key_col).alias("kk")).distinct().select(
        "kk", frac.alias("h")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("h")
    return hashed.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def kmv_intersect(
    df_a: DataFrame, df_b: DataFrame, key_col: str, k: int = 256
) -> DataFrame:
    """Set-INTERSECTION cardinality from two KMV sketches (the theta-
    sketch estimator): ``theta = min`` of the two k-th-smallest hashes
    (1.0 for a side with fewer than k keys, which makes it exact), and
    ``|A n B| ~ |{key kept by BOTH sketches with h < theta}| / theta``.

    This is the sketch algebra that answers audience-overlap questions at
    100 TB: each side's state is k (key, hash) pairs built independently
    (different days, different clusters, different months), and the
    overlap estimate needs only the two sketches — never the key streams.
    Deterministic md5 arithmetic end to end, so a SQL engine reproduces
    the exact estimate.

    Returns one row: ``(n_kept_a, n_kept_b, theta, est_intersection)``.
    """
    ka = _kmv_kept(df_a, key_col, k)
    kb = _kmv_kept(df_b, key_col, k)

    def _theta(kept: DataFrame) -> DataFrame:
        return kept.agg(
            F.count(F.lit(1)).alias("n"),
            F.when(F.count(F.lit(1)) < k, F.lit(1.0))
            .otherwise(F.max("h"))
            .alias("th"),
        )
    ta = _theta(ka).select(
        F.col("n").alias("n_kept_a"), F.col("th").alias("th_a")
    )
    tb = _theta(kb).select(
        F.col("n").alias("n_kept_b"), F.col("th").alias("th_b")
    )
    both = ka.select("kk", "h").join(kb.select("kk"), "kk")
    # scalars first (one row however the data looks), THEN the count —
    # an empty intersection must yield est 0, not zero output rows
    scalars = ta.crossJoin(tb).withColumn("theta", F.least("th_a", "th_b"))
    cnt = (
        both.crossJoin(F.broadcast(scalars.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return scalars.crossJoin(F.broadcast(cnt)).select(
        "n_kept_a",
        "n_kept_b",
        "theta",
        F.round(F.col("n_inter") / F.col("theta"), 6).alias(
            "est_intersection"
        ),
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 64512,
    n_hashes: int = 2,
) -> DataFrame:
    """Membership claim per input row: ``df`` plus a boolean ``claimed``
    that is true iff every hash position's bit is set (no false negatives;
    false positives at the classic Bloom rate).

    Plan shape (r13): the filter-sized word table folds into a ONE-ROW
    broadcast MAP, and each row's claim is ``n_hashes`` element_at bit
    tests riding the probe scan — no explode, no per-key distinct, no
    join-back, no hit count.  A missing word reads NULL -> coalesce 0 ->
    clear bit, exactly the failed-join case of the earlier equi-join
    formulation (same claims; the earlier shape cost four exchanges on
    the probe side)."""
    wm = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("__wm")
    )
    out = df.crossJoin(F.broadcast(wm))
    tests = []
    for i in range(1, n_hashes + 1):
        out = out.withColumn(
            f"__p{i}", hash_position(F.col(key_col), i, m_bits)
        )
        tests.append(
            f"((coalesce(element_at(__wm, __p{i} DIV {WORD_BITS}), 0L)"
            f" & shiftleft(1L, cast(__p{i} % {WORD_BITS} as int))) != 0)"
        )
    return out.withColumn("claimed", F.expr(" AND ".join(tests))).drop(
        "__wm", *[f"__p{i}" for i in range(1, n_hashes + 1)]
    )


#: HLL bias-correction constants (Flajolet et al. 2007).  m >= 128 uses
#: the closed form 0.7213 / (1 + 1.079 / m).
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(p: int) -> float:
    """The alpha_m bias constant for ``m = 2**p`` registers."""
    m = 1 << p
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_hash_cols(
    key_col: str, p: int = 10, salt: str = "hll"
) -> tuple[Column, Column]:
    """The per-row ``(bucket, rho)`` column pair behind
    :func:`hll_registers`, exposed so callers can feed them into their
    own aggregation shape (e.g. ``groupingSets`` to build per-group AND
    merged-union registers in one pass over the input)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}")))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m).alias(
        "bucket"
    )
    v = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.conv(F.substring(h, 9, 8), 16, 2)))
        .alias("rho")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog register table per group: ``group_cols + (bucket,
    rho)`` with ``m = 2**p`` buckets (Flajolet, Fusy, Gandouet, Meunier
    2007).  Bucket is the first 32 md5 bits mod m; rho is the leading-
    zero count of the NEXT 32 md5 bits plus one — independent bit ranges
    of the same digest, exactly the split the paper prescribes.

    The rho computation is pure integer arithmetic on both engines:
    ``33 - length(conv(hex, 16, 2))`` in Spark mirrors DuckDB's
    ``33 - length(bin(v))`` (both render minimal-length binary), so —
    contrary to HLL folklore (see ``kmv_distinct``'s note) — the whole
    sketch IS cross-engine hash-checkable: registers are integers, and
    the estimator in :func:`hll_estimate` sums ``2^-rho`` terms that are
    dyadic rationals exactly representable in a double, making even the
    float side bit-reproducible up to the single final division.

    State per group is at most m small integers regardless of input
    size, the build is one map-side-combinable ``max`` aggregate, and
    registers merge by ``max`` (:func:`hll_merge`) — the property that
    lets 1000 executors (or 30 days of daily sketches) combine without
    ever re-touching raw keys."""
    gcols = list(group_cols or [])
    bucket, rho = hll_hash_cols(key_col, p, salt)
    return (
        df.select(*gcols, bucket, rho)
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    regs: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge register tables by taking the per-bucket ``max`` — the HLL
    union: estimating the merged table is estimating the DISTINCT UNION
    of every input the constituent sketches saw.  Registers built at
    different times/places combine losslessly; only sketch-sized state
    moves."""
    gcols = list(group_cols or [])
    return regs.groupBy(*gcols, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    regs: DataFrame, p: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from a register table: ``group_cols +
    (n_occupied, est_distinct)``.

    Raw estimator ``alpha_m * m^2 / sum_j 2^-M_j`` with absent buckets
    contributing ``2^0 = 1`` (the ``m - n_occupied`` term); below
    ``2.5 m`` with empty buckets it switches to linear counting
    ``m * ln(m / zeros)`` per the original paper.  Standard error of the
    raw branch is ``~1.04 / sqrt(m)``.

    Determinism across engines: the ``2^-rho`` sum is exact (dyadic
    rationals, total significand well under a double's 53 bits, so even
    summation ORDER cannot change it), the branch predicate compares
    identically-computed doubles, and only the linear-counting ``ln`` is
    subject to last-ulp libm variance — one value per group, rounded at
    6 decimals (tie probability ~1e-10 per group; the float-grid recipe's
    exact-twin switch applies above ~1e9 groups, far past any realistic
    group count for a per-group scalar)."""
    m = 1 << p
    alpha = hll_alpha(p)
    gcols = list(group_cols or [])
    agg = regs.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_occupied"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(1L, cast(rho as int))")
        ).alias("__s"),
    )
    zeros = F.lit(m) - F.col("n_occupied")
    raw = F.lit(alpha * m * m) / (F.col("__s") + zeros.cast("double"))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return agg.select(
        *gcols,
        "n_occupied",
        F.round(
            F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw), 6
        ).alias("est_distinct"),
    )


def grid_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[tuple[int, int]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT quantiles over integer-grid values with NO per-group sort —
    the 100 TB replacement for ``percentile()`` when the domain is
    discrete (cents, token counts, byte sizes, quanta): build a per-group
    value HISTOGRAM (a map-side-combinable hash aggregate whose state is
    the number of DISTINCT grid values, not the row count), running-sum
    it in grid order, and read each quantile as the smallest value whose
    cumulative count reaches the rank.

    ``quantiles`` are RATIONALS ``(num, den)`` (e.g. ``(1, 4)`` for p25)
    and the rank test is pure integer arithmetic ``den * cum >= num *
    n`` — no float rank, no interpolation, no cross-engine tie class at
    any data size.  This is the inverted-CDF (lower order statistic)
    definition.

    Returns ``group_cols + (n_rows, q_<num>_<den> ...)``.  Plan: one
    shuffle for the histogram, one for the per-group cumulative window
    (both keyed on columns that scale with the data), then a conditional
    min — rows never sort globally and never collect.
    """
    gcols = list(group_cols or [])
    hist = df.groupBy(
        *gcols, F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    return grid_quantiles_over_hist(hist, quantiles, group_cols=gcols)


def grid_quantiles_over_hist(
    hist: DataFrame,
    quantiles: list[tuple[int, int]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The quantile READ over a prebuilt ``(group_cols..., __v, __cnt)``
    value histogram — the split that makes :func:`grid_quantiles` a
    continuously-maintained monitor: the histogram is a key-grain
    integer aggregate (exactly the ``streaming.mv.
    merge_partial_aggregates`` contract, like the drift screen's cell
    table and the DSIR raw cells), so a stream merges per-micro-batch
    partial histograms into held state and this read answers live
    percentile queries from ``groups x distinct-grid-values`` rows
    without rescanning history — stream == batch pinned by
    tests/test_operators.py::test_grid_quantiles_stream_equals_batch.
    Same integer rank test and output shape as :func:`grid_quantiles`."""
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for num, den in quantiles:
        if not (0 < num <= den):
            raise ValueError(f"quantile {num}/{den} outside (0, 1]")
    gcols = list(group_cols or [])
    w = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    ).orderBy("__v")
    cum = hist.withColumn(
        "__cum", F.sum("__cnt").over(w)
    ).withColumn(
        "__n",
        F.sum("__cnt").over(
            (
                Window.partitionBy(*gcols)
                if gcols
                else Window.partitionBy(F.lit(1))
            ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    aggs = [F.max("__n").alias("n_rows")]
    for num, den in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.lit(den) * F.col("__cum") >= F.lit(num) * F.col("__n"),
                    F.col("__v"),
                )
            ).alias(f"q_{num}_{den}")
        )
    return cum.groupBy(*gcols).agg(*aggs)


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    k: int,
) -> DataFrame:
    """EXACT phi-heavy-hitters — every key whose count strictly exceeds
    ``n/k`` — without ever shuffling the full key cardinality.

    The naive plan (``groupBy(key).count()`` then filter) shuffles one
    row per DISTINCT key: at 100 TB of tokens that is the vocabulary —
    billions of shuffle rows to find the few hundred frequent ones.  This
    is the classic two-phase mergeable-summary plan instead:

    1. **Candidates** — each partition folds its local stream through a
       Misra–Gries summary with ``k`` counters (``mapInPandas``; dict
       state bounded by ``k`` regardless of partition size).  Arrow
       batches are absorbed via the MG *merge* step: add the batch's
       exact counts, then subtract the (k+1)-th largest count from every
       counter and drop the non-positives — the decrement total is
       bounded, so any key with local count > n_p/(k+1) survives
       (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries",
       PODS'12).
    2. **Pigeonhole union** — a key with GLOBAL count C > n/k must have
       C_p > n_p/k on at least one partition (if C_p <= n_p/k for every
       p, summing gives C <= n/k, contradiction), and n_p/k >
       n_p/(k+1), so it survives phase 1 somewhere.  The candidate union
       is <= k x n_partitions rows — sketch-sized, independent of data.
    3. **Exact recount** — broadcast the candidate set, hash-semi-join
       the stream (a map-side filter: non-candidate rows are dropped
       before the exchange), exact groupBy count, keep
       ``cnt * k > n``.  The only data-sized aggregation left shuffles
       candidate keys only.

    Output ``(key_col, cnt)`` is exact and deterministic — independent
    of partitioning, batch boundaries, and MG eviction order — because
    phase 1 only ever proposes a superset and phase 3 recounts exactly.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd

    out_schema = df.select(key_col).schema

    def mg_partition(batches):
        counts: dict = {}
        for pdf in batches:
            # dropna=False so a NULL key competes for a counter like any
            # other value (a null whose global count exceeds n/k is a
            # heavy hitter too); normalize every NA representation to
            # the single ``None`` object — pandas yields a fresh NaN per
            # batch and NaN != NaN, so raw NaN dict keys would silently
            # split one null key across many counters
            for key, c in pdf[key_col].value_counts(dropna=False).items():
                if pd.isna(key):
                    key = None
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > k:
                kth = sorted(counts.values(), reverse=True)[k]
                counts = {
                    key: c - kth for key, c in counts.items() if c > kth
                }
        yield pd.DataFrame({key_col: list(counts.keys())}, dtype=object)

    candidates = df.select(key_col).mapInPandas(
        mg_partition, schema=out_schema
    ).distinct()
    n_df = df.agg(F.count(F.lit(1)).alias("__n"))
    # null-safe semi join (<=>): plain equality would drop a null
    # candidate on the recount even after phase 1 proposed it
    cand = candidates.withColumnRenamed(key_col, "__cand_key")
    join_cond = F.col(key_col).eqNullSafe(F.col("__cand_key"))
    if isinstance(df.schema[key_col].dataType, (T.FloatType, T.DoubleType)):
        # float keys: the pandas boundary hands BOTH SQL NULL and the NaN
        # value to phase 1 as NaN, so the single ``None`` candidate stands
        # for the NULL-or-NaN class (their conflated phase-1 count only
        # over-proposes — superset property intact).  The recount must
        # therefore let data NaN rows through on a NULL candidate too:
        # NULL <=> NaN is false, so without this clause a NaN heavy
        # hitter was silently dropped.  groupBy then separates the two
        # exactly (Spark groups NaN with NaN, NULL with NULL).
        join_cond = join_cond | (
            F.isnan(F.col(key_col)) & F.col("__cand_key").isNull()
        )
    return (
        df.join(
            F.broadcast(cand),
            join_cond,
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_df))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select(key_col, "cnt")
    )
