"""Corpus- and key-distribution diagnostics — the profiling pass a 100 TB
pipeline runs BEFORE committing to a plan: which join keys are skewed
enough to need salting, what vocabulary covers the token stream (OOV
budget for a tokenizer), and whether a source's length distribution has
drifted from the reference corpus.

Everything here is exact integer arithmetic until a final scalar
division, so every diagnostic is cross-engine hash-checkable: skew
ratios and OOV rates are single divisions of exactly-aggregated counts,
and the drift statistic is the exact Kolmogorov-Smirnov distance
computed on cross-multiplied integer CDF numerators (no float CDFs at
all until the one closing division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsdisagg_spark.operators._par import spread_small_input as _spread

from tsdisagg_spark.operators.sketches import grid_quantiles
from tsdisagg_spark.operators.text import words


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    quantiles: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """One-row skew diagnosis of a prospective join/shuffle key: ``(
    n_rows, n_keys, max_per_key, q_* per-key-count quantiles,
    skew_ratio)`` where ``skew_ratio = max_per_key / mean_per_key`` — the
    multiplier by which the hottest partition-key exceeds the average,
    i.e. the straggler factor a plain hash-shuffle on this key would
    suffer and the number that decides between a vanilla join, AQE skew
    handling, and explicit salting.

    Scale shape: the per-key count is a map-side-combinable aggregate (a
    skewed key burdens this profile far less than it would burden the
    join being profiled — partials combine before the shuffle), the
    quantiles ride :func:`~tsdisagg_spark.operators.sketches.grid_quantiles`
    (per-key counts ARE an integer grid, so no sort and no interpolation),
    and only two one-row frames cross-join at the end.  ``skew_ratio`` is
    float division of exact counts (double multiply keeps 1e10-row x
    1e10-key products out of int64 range), rounded at 6."""
    sizes = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    qs = quantiles or [(1, 2), (9, 10), (99, 100)]
    quants = grid_quantiles(sizes, "__cnt", qs).select(
        F.col("n_rows").alias("n_keys"),
        *[F.col(f"q_{n}_{d}") for n, d in qs],
    )
    totals = sizes.agg(
        F.sum("__cnt").alias("n_rows"),
        F.max("__cnt").alias("max_per_key"),
    )
    return (
        totals.crossJoin(F.broadcast(quants))
        .select(
            "n_rows",
            "n_keys",
            "max_per_key",
            *[f"q_{n}_{d}" for n, d in qs],
            F.round(
                F.col("max_per_key").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    vocab_size: int = 16,
) -> DataFrame:
    """Out-of-vocabulary budget per group: build the top-``vocab_size``
    vocabulary by corpus frequency (ties broken by token ascending — a
    TOTAL order, so the vocabulary is deterministic on any engine) and
    report each group's token count, in-vocabulary count, and OOV rate.

    This is the tokenizer-design question asked of real corpora — "what
    fraction of the token stream does a V-entry vocabulary cover, and
    which sources pay the OOV cost" — as two aggregates and one
    broadcast: global token counts (map-side combinable), a distributed
    top-V (``orderBy + limit`` plans as TakeOrderedAndProject — per-
    partition heaps, never a global sort), and a per-group count join
    against the broadcast vocabulary.  The OOV rate is one division of
    exact counts, rounded at 6 (tie-free: see the jaccard/containment
    exemption in the float-grid recipe)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    docs = _spread(docs)  # tokenize map stage: spread a few-file input (guide 2.5)
    toks = docs.select(
        F.col(group_col).alias("__g"),
        F.explode(words(F.col(text_col))).alias("__tok"),
    ).filter(F.col("__tok") != "")
    vocab = (
        toks.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__tok"))
        .limit(vocab_size)
        .select("__tok")
    )
    per_group = (
        toks.groupBy("__g", "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .join(
            F.broadcast(vocab.withColumn("__in", F.lit(1))), "__tok", "left"
        )
        .groupBy("__g")
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(F.when(F.col("__in") == 1, F.col("__c")).otherwise(0)).alias(
                "n_in_vocab"
            ),
        )
    )
    return per_group.select(
        F.col("__g").alias(group_col),
        "n_tokens",
        "n_in_vocab",
        F.round(
            F.lit(1.0)
            - F.col("n_in_vocab").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("oov_rate"),
    )


def join_cardinality(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str | None = None,
) -> DataFrame:
    """EXACT output cardinality of ``a JOIN b`` on an equi-key — computed
    WITHOUT running the join: the per-key count tables meet in a
    key-sized join and the output size is ``sum_k c_a(k) * c_b(k)``.
    One row: ``(est_rows, n_matching_keys, max_key_contrib,
    top1_share)``.

    This is the pre-flight a 100 TB pipeline runs before a join it
    cannot afford to discover is explosive: the count tables are
    map-side-combined aggregates (key-sized, not row-sized), their join
    shuffles keys-with-counts rather than rows, and a hot key shows up
    as ``max_key_contrib`` BEFORE it becomes a straggler task.  For an
    unfiltered equi-join the number is exact, not an estimate — the
    sum-of-products IS the join cardinality, which is why the carrier
    query's oracle can verify it by brute-force COUNTing the actual
    join on the other engine (a semantically independent witness, not a
    formula mirror).

    Per-key products accumulate in DECIMAL(38,0): two 1e10-row inputs
    concentrated on one key give 1e20 — past int64, trivial for
    decimal.  ``top1_share`` is the one closing float division."""
    ka, kb = key_a, key_b or key_a
    ca = a.groupBy(F.col(ka).alias("__k")).agg(
        F.count(F.lit(1)).alias("__ca")
    )
    cb = b.groupBy(F.col(kb).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cb")
    )
    dec = "decimal(38,0)"
    prod = F.col("__ca").cast(dec) * F.col("__cb").cast(dec)
    return (
        ca.join(cb, "__k")
        .agg(
            F.sum(prod).alias("__est"),
            F.count(F.lit(1)).alias("n_matching_keys"),
            F.max(prod).alias("__max"),
        )
        .select(
            F.coalesce(F.col("__est").cast("long"), F.lit(0)).alias(
                "est_rows"
            ),
            "n_matching_keys",
            F.coalesce(F.col("__max").cast("long"), F.lit(0)).alias(
                "max_key_contrib"
            ),
            F.when(F.col("n_matching_keys") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("__max").cast("double")
                    / F.col("__est").cast("double"),
                    6,
                )
            )
            .alias("top1_share"),
        )
    )


def cdf_distance(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline: str,
) -> DataFrame:
    """EXACT Kolmogorov-Smirnov distance of every group's ``value_col``
    distribution from the ``baseline`` group's — the drift detector that
    answers "has this source's length/score/size profile moved away from
    the reference corpus" without sampling or binning error.

    The statistic is ``max_v |F_g(v) - F_b(v)|`` over the UNION grid of
    observed values; both CDFs are step functions, so evaluating at every
    observed value is exact.  The comparison never touches float CDFs:
    each step holds cumulative COUNTS, and the max runs over the cross-
    multiplied integer numerator ``|cum_g * n_b - cum_b * n_g|``
    accumulated in DECIMAL(38,0) (cum * n reaches ~1e22 at 1e11 rows —
    past int64, nowhere near decimal range).  The single closing division
    by ``n_g * n_b`` happens once per GROUP, on exact integers.

    Plan shape: one count aggregate keyed on (group, value) — the only
    shuffle that scales with data — then windows and joins over the
    grid-sized (distinct-value x group) frame.  Returns ``(group_col,
    n, ks)`` for every non-baseline group."""
    counts = df.groupBy(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__c"))
    groups = counts.select("__g").distinct()
    grid = counts.select("__v").distinct()
    full = (
        grid.crossJoin(F.broadcast(groups))
        .join(counts, ["__g", "__v"], "left")
        .fillna({"__c": 0})
    )
    w = Window.partitionBy("__g").orderBy("__v")
    cum = full.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n",
        F.sum("__c").over(
            Window.partitionBy("__g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    # attach the baseline CDF to every row via a per-value window instead
    # of filter + self-join: a frame consumed by two projections plans its
    # subtree TWICE, and the subtree here contains the only data-sized
    # shuffle (the (group, value) count) — the window costs one extra
    # grid-sized exchange and scans the data once
    wv = Window.partitionBy("__v")
    withbase = cum.withColumn(
        "__cum_b",
        F.max(F.when(F.col("__g") == baseline, F.col("__cum"))).over(wv),
    ).withColumn(
        "__n_b",
        F.max(F.when(F.col("__g") == baseline, F.col("__n"))).over(wv),
    )
    dec = "decimal(38,0)"
    return (
        withbase.filter(F.col("__g") != baseline)
        .filter(F.col("__cum_b").isNotNull())
        .groupBy("__g")
        .agg(
            F.max("__n").alias("n"),
            F.max(
                F.abs(
                    F.col("__cum").cast(dec) * F.col("__n_b").cast(dec)
                    - F.col("__cum_b").cast(dec) * F.col("__n").cast(dec)
                )
            ).alias("__d"),
            F.max(F.col("__n_b")).alias("__nb"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n",
            F.round(
                F.col("__d").cast("double")
                / (
                    F.col("n").cast("double") * F.col("__nb").cast("double")
                ),
                6,
            ).alias("ks"),
        )
    )


def group_drift_jsd(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Per-group Jensen-Shannon divergence between the group's hashed
    unigram distribution and the REST of the corpus — the drift screen
    that flags a source whose token mix has wandered (new boilerplate,
    language shift, scraper breakage) before it pollutes a training mix.

    ``(group, n_tokens, n_rest, n_cells, jsd)`` with
    ``jsd = H(m) - (H(p) + H(q)) / 2`` in nats (0 = identical mix,
    ln 2 = disjoint).  EXACT-INTEGER LANES throughout: tokens hash into
    ``buckets`` md5 cells; writing the equal-weight mixture over the
    common denominator ``D = 2 * n_p * n_q`` makes every mixture cell
    the INTEGER ``N_h = c_ph * n_q + c_qh * n_p`` (sum over cells = D),
    so all three entropies take the token_entropy form
    ``H = ln(n) - S / n / 1e9`` with ``S = sum(c * round(ln(c) * 1e9))``
    an order-free integer accumulated in DECIMAL(38,0) (``N * ln-lane``
    reaches ~7e25 at the 100x tier — int64 wraps, decimal cannot).  The
    only floats are one ln per DISTINCT integer input and the closing
    divisions, performed in the same order by any engine.

    Scale shape: the corpus is touched once (token -> cell explode into
    a map-side-combined (group, cell) count); every later step is
    ``groups x buckets`` sized — the global cell table and group totals
    BROADCAST, and the dense grid (so cells the group never emitted
    still contribute their mixture term) is built from broadcasts, not
    from the corpus."""
    cells = (
        _spread(df)  # tokenize+md5 map stage: spread a few-file input
        .select(
            F.col(group_col),
            F.explode(words(F.col(text_col))).alias("__tok"),
        )
        .select(
            group_col,
            (
                F.conv(
                    F.substring(F.md5(F.col("__tok")), 1, 15), 16, 10
                ).cast("long")
                % buckets
            ).alias("__h"),
        )
        .groupBy(group_col, "__h")
        .agg(F.count(F.lit(1)).alias("__cp"))
        # persisted: the (group, cell) count feeds the global cell table,
        # the group totals, AND the dense-grid join — without it the
        # corpus explode + first exchange run once per consumer (verified:
        # 4 FileScans in the unpersisted plan; same caller-managed
        # discipline as dsir_importance_weights).  At sf0.1 the persist
        # measures ~0.8s SLOWER (1.0 -> 1.9s: cache materialization vs a
        # cheap 5k-doc recompute — the winnowing recompute-vs-persist
        # trade again), but the operator's contract is the 100 TB corpus,
        # where one scan vs four dominates; the cached table is only
        # groups x buckets rows.
        .persist()
    )
    return drift_jsd_over_cells(cells, group_col)


def drift_jsd_over_cells(cells: DataFrame, group_col: str) -> DataFrame:
    """The JSD-vs-rest lane pipeline over a prebuilt ``(group, __h,
    __cp)`` cell-count table — the shared core of :func:`group_drift_jsd`
    (hashed unigram cells) and :func:`group_value_drift_jsd` (categorical
    cells).  ``cells`` is also exactly the key-grain aggregate a stream
    keeps fresh with ``streaming.mv.merge_partial_aggregates`` (counts
    merge exactly), so this is the READ side of a continuously-maintained
    drift monitor: merge partials per micro-batch, run the screen on
    demand — stream == batch pinned by
    tests/test_operators.py::test_event_mix_drift_stream_equals_batch.
    The caller manages the persist lifetime of ``cells`` (it feeds the
    global cell table, the group totals, and the dense-grid join).  See
    :func:`group_drift_jsd` for the exact-integer-lane contract."""
    gtot = cells.groupBy("__h").agg(F.sum("__cp").alias("__g"))
    ptot = cells.groupBy(group_col).agg(F.sum("__cp").alias("__np"))
    ttot = gtot.agg(F.sum("__g").alias("__T"))
    # dense (group, cell) grid from broadcasts: groups x buckets rows.
    # NULL is a legal cell (a NULL category is exactly the logging
    # regression a mix monitor must catch) and a legal group, so the
    # grid join is NULL-SAFE on both keys: an equality join would count
    # a NULL cell in ptot/gtot/ttot but never match it back, silently
    # moving the emitting group's own count into the rest lane (ADVICE
    # r11; pinned by test_group_value_drift_jsd_null_category).
    dense = ptot.crossJoin(F.broadcast(ttot)).crossJoin(F.broadcast(gtot))
    own = cells.select(
        F.col(group_col).alias("__jg"),
        F.col("__h").alias("__jh"),
        "__cp",
    )
    grid = (
        dense.join(
            own,
            dense[group_col].eqNullSafe(own["__jg"])
            & dense["__h"].eqNullSafe(own["__jh"]),
            "left",
        )
        .select(
            dense[group_col],
            "__np",
            (F.col("__T") - F.col("__np")).alias("__nq"),
            F.coalesce(F.col("__cp"), F.lit(0)).alias("__c"),
            (F.col("__g") - F.coalesce(F.col("__cp"), F.lit(0))).alias(
                "__cq"
            ),
        )
    )
    lnq = lambda c: F.round(F.log(c.cast("double")) * 1e9).cast("long")
    term = lambda c: (
        F.when(c > 0, c.cast("decimal(38,0)") * lnq(c)).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )
    )
    mix = (
        F.col("__c").cast("decimal(38,0)") * F.col("__nq")
        + F.col("__cq").cast("decimal(38,0)") * F.col("__np")
    )
    lanes = grid.select(
        group_col,
        "__np",
        "__nq",
        F.when(F.col("__c") > 0, 1).otherwise(0).alias("__has"),
        term(F.col("__c")).alias("__tp"),
        term(F.col("__cq")).alias("__tq"),
        F.when(
            mix > 0,
            mix * F.round(F.log(mix.cast("double")) * 1e9).cast("long"),
        )
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("__tm"),
    )
    agg = lanes.groupBy(group_col).agg(
        F.first("__np").alias("__np"),
        F.first("__nq").alias("__nq"),
        F.sum("__has").cast("long").alias("n_cells"),
        F.sum("__tp").alias("__sp"),
        F.sum("__tq").alias("__sq"),
        F.sum("__tm").alias("__sm"),
    )
    h = lambda s, n: (
        F.log(n.cast("double")) - s.cast("double") / n.cast("double") / 1e9
    )
    d = (2 * F.col("__np").cast("decimal(38,0)") * F.col("__nq")).cast(
        "double"
    )
    # Single-group corpus guard: with one group the rest is empty
    # (n_rest = 0) and H(q) is ln(0)/division-by-zero — Spark would
    # return NULL implicitly while an oracle engine errors or yields
    # -inf.  Make the degenerate case DEFINED and identical on both
    # sides: jsd is explicitly NULL when there is nothing to drift
    # against (ADVICE r10; the oracle carries the matching CASE WHEN).
    return agg.select(
        F.col(group_col),
        F.col("__np").cast("long").alias("n_tokens"),
        F.col("__nq").cast("long").alias("n_rest"),
        "n_cells",
        F.when(
            F.col("__nq") > 0,
            F.round(
                F.log(d)
                - F.col("__sm").cast("double") / d / 1e9
                - (
                    h(F.col("__sp"), F.col("__np"))
                    + h(F.col("__sq"), F.col("__nq"))
                )
                / 2,
                6,
            ),
        ).alias("jsd"),
    )


def group_value_drift_jsd(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Categorical drift: per-group Jensen-Shannon divergence between the
    group's mix over a CATEGORICAL column (event types, status codes,
    labels) and the rest of the corpus — :func:`group_drift_jsd` without
    the tokenizer/hash step, because the cell domain is the category set
    itself (already small; bucketing would only blur it).  Same
    exact-integer lane contract, same output shape ``(group, n_tokens,
    n_rest, n_cells, jsd)`` with n_tokens counting the group's ROWS.

    The canonical use is time-windowed monitoring (group = day/hour):
    the ``(group, value)`` count is a key-grain aggregate a stream keeps
    fresh with ``streaming.mv.merge_partial_aggregates``, and this
    screen reads that state on demand — drift alarms over live ingest
    without ever rescanning history.

    Scale shape: the corpus is touched once (one map-side-combined
    (group, value) count); every later step is groups x categories
    sized."""
    cells = (
        df.select(F.col(group_col), F.col(value_col).alias("__h"))
        .groupBy(group_col, "__h")
        .agg(F.count(F.lit(1)).alias("__cp"))
        # persisted for the same three-consumer reason as
        # group_drift_jsd's cell table (groups x categories rows)
        .persist()
    )
    return drift_jsd_over_cells(cells, group_col)


def group_value_psi(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ref: DataFrame | None = None,
    n_bins: int = 10,
    scale: int = 1_000_000,
    ref_hist: DataFrame | None = None,
) -> DataFrame:
    """NUMERIC drift per group: Population Stability Index of
    ``value_col``'s distribution in each group against a REFERENCE
    population, over the reference's own quantile bins — the standard
    feature-drift monitor of ML scoring/ingest pipelines, completing the
    drift family next to the categorical JSD screens (above) and the
    two-sample KS distance (``doc_length_drift``).  Output: ``(group,
    n_values, psi)``; the conventional read is psi < 0.1 stable,
    0.1-0.25 shifting, > 0.25 drifted.

    Method: values quantize to an integer grid (``floor(value *
    scale)`` — floor, not round: both engines floor the IDENTICAL
    product double, so there is no half-way tie class), the reference's
    ``n_bins - 1`` inner bin edges are EXACT integer-rank order
    statistics read from a value histogram
    (:func:`~tsdisagg_spark.operators.sketches.grid_quantiles_over_hist`
    — the ceil(n*k/B)-th smallest; sort-free, and the same
    MV-maintainable histogram state the live-percentile monitor reads),
    every row bins by ``count(edges < v)``, and

        psi = sum_bins (p'_b - q'_b) * ln(p'_b / q'_b)

    with add-one smoothing ``p' = (c + 1) / (n + n_bins)`` (industry
    convention — keeps empty bins finite instead of dropping them).
    Shares p'/q' are divisions of identical exact integers on both
    engines, so the only cross-engine float is ln's last ulp: ~n_bins
    terms/group against a 1e-6 output grid puts the per-group tie
    probability near 2e-9 — float-grid-safe to ~5e7 groups, far past
    any calendar-grain monitoring horizon (rounding rule per the
    float-grid corpus-bound policy).

    The reference enters EITHER as raw rows (``ref``) or as a prebuilt
    ``(__v, __cnt)`` value histogram (``ref_hist``) — the latter is the
    MV form: the histogram is a key-grain integer aggregate a stream
    keeps fresh with ``streaming.mv.merge_partial_aggregates`` (the
    grid-quantile monitor's own state), so a live pipeline maintains
    the reference once and every PSI read derives edges, bin masses and
    n_ref from those ``distinct-grid-values`` rows without rescanning
    the reference — stream-merged == direct is test-pinned.

    Scale shape: ONE pass over ``df`` (map-side-combined (group, bin)
    counts after a broadcast of the n_bins-1 edge scalars) and one
    histogram pass over ``ref`` (skipped entirely in the ``ref_hist``
    form — reference bin masses aggregate FROM the histogram, never
    from re-binned rows); everything after is groups x n_bins sized.
    The dense (group x bin) grid is built explicitly and counts
    COALESCE to zero — smoothing needs absent bins as rows, and a bare
    join would silently drop them (the r12 JSD null-grid lesson)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if (ref is None) == (ref_hist is None):
        raise ValueError(
            "pass exactly one of ref (raw reference rows) or ref_hist "
            "(a prebuilt (__v, __cnt) value histogram)"
        )
    from tsdisagg_spark.operators.sketches import grid_quantiles_over_hist

    qv = F.floor(F.col(value_col) * F.lit(int(scale))).cast("long")
    if ref_hist is None:
        ref_hist = (
            ref.select(qv.alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
    # ref_hist feeds BOTH the edge read and the reference bin masses, and
    # edges_row feeds BOTH the group binning and the reference binning:
    # without persists each consumer re-derives the whole reference chain
    # (raw scan -> quantize -> histogram) from scratch.  Both frames are
    # small — distinct grid values and ONE row respectively — and the
    # cache lifetime is caller-managed (cacheutil.release_all).
    ref_hist = ref_hist.persist()
    edges_row = grid_quantiles_over_hist(
        ref_hist, [(k, n_bins) for k in range(1, n_bins)]
    ).select(
        F.array(
            *[F.col(f"q_{k}_{n_bins}") for k in range(1, n_bins)]
        ).alias("__edges"),
        F.col("n_rows").alias("__n_ref"),
    ).persist()
    binned = (
        df.select(F.col(group_col), qv.alias("__qv"))
        .crossJoin(F.broadcast(edges_row))
        .select(
            group_col,
            "__n_ref",
            F.size(
                F.filter("__edges", lambda e: F.col("__qv") > e)
            ).alias("__bin"),
        )
    )
    # groups x n_bins rows consumed twice (the per-group totals and the
    # dense grid's left join) — persist so the one real pass over ``df``
    # runs once, not once per consumer
    day_bins = binned.groupBy(group_col, "__bin", "__n_ref").agg(
        F.count(F.lit(1)).alias("__c")
    ).persist()
    # reference bin masses aggregate FROM the histogram (n_bins-row
    # output from distinct-grid-value rows — no second pass over the
    # reference, and identical in both input forms since binning is a
    # per-value function)
    ref_bins = (
        ref_hist.crossJoin(F.broadcast(edges_row.select("__edges")))
        .select(
            F.size(
                F.filter("__edges", lambda e: F.col("__v") > e)
            ).alias("__bin"),
            "__cnt",
        )
        .groupBy("__bin")
        .agg(F.sum("__cnt").alias("__cr"))
    )
    n_d = day_bins.groupBy(group_col, "__n_ref").agg(
        F.sum("__c").alias("__n_d")
    )
    grid = (
        n_d.select(group_col, "__n_ref", "__n_d")
        .withColumn(
            "__bin", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1)))
        )
        .join(day_bins, [group_col, "__bin", "__n_ref"], "left")
        .join(F.broadcast(ref_bins), "__bin", "left")
        .select(
            group_col,
            "__n_d",
            "__n_ref",
            F.coalesce(F.col("__c"), F.lit(0)).alias("__c"),
            F.coalesce(F.col("__cr"), F.lit(0)).alias("__cr"),
        )
    )
    p = (F.col("__c") + F.lit(1)).cast("double") / (
        F.col("__n_d") + F.lit(n_bins)
    ).cast("double")
    q = (F.col("__cr") + F.lit(1)).cast("double") / (
        F.col("__n_ref") + F.lit(n_bins)
    ).cast("double")
    return grid.groupBy(group_col).agg(
        F.max("__n_d").cast("long").alias("n_values"),
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
    )
