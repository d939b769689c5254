"""Time-series relational operators beyond the reference's surface: as-of
join, rolling-window statistics, gap-filling with linear interpolation, and
indicator-correlation ranking.

These are the queries a user of a temporal-disaggregation library runs
*around* the disaggregation itself — aligning two event streams (as-of),
smoothing an indicator (rolling stats), completing a sparse indicator
timeline before using it as a regressor (gap-fill), and choosing which
indicator to regress on (correlation ranking).  The reference stays inside
pandas where ``merge_asof`` / ``rolling`` / ``interpolate`` do these on one
machine (see pandas-adjacent usage around ts_disagg.py:298 where alignment
is an outer merge); here each is a shuffle-lean distributed plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_seconds: float | None = None,
    how: str = "left",
) -> DataFrame:
    """As-of join: attach to every left row the single right row with the
    largest ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward' is
    the mirror) sharing the equi-key ``on``.

    Implemented as a UNION + ordered window, not a range join: both sides
    are tagged and unioned, partitioned by the key, sorted once by
    (timestamp, tag), and the right row's payload is propagated with
    ``last(..., ignorenulls=True)``.  One shuffle, one sort, zero join
    nodes — the row count through the exchange is |L| + |R|, never the
    |L| x |R| blow-up a naive range-condition join risks, which is the
    difference between viable and not at 100 TB.  Skew note: one key's
    rows land in one task (any ordered-window operator does); keys here are
    user/series grains, far finer than the task count at scale.

    Ties (equal timestamps): with ``strict=False`` the right row at the
    same instant is visible to the left row; ``strict=True`` requires
    strictly earlier (later, for 'forward').  If several right rows share
    one (key, timestamp), which payload propagates is ARBITRARY (scan
    order within the sorted partition) — pre-aggregate duplicate
    (key, timestamp) rows away if determinism matters (the registry
    queries do).

    ``right_cols`` are emitted with a ``matched_`` prefix on the timestamp
    (``matched_ts``) and verbatim names for payload columns, so callers
    control collisions by renaming up front.

    NULL keys never match (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics): NULL-keyed right rows are filtered before the union, so a
    NULL-keyed left row flows through unmatched (dropped under
    ``how='inner'``) instead of pairing with NULL-keyed right rows that
    happen to co-partition with it.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]

    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    # tag ordering encodes the tie rule: the side that must be visible at an
    # equal timestamp sorts first in scan order
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    # NULL-keyed right rows can never legitimately match anything — drop
    # them map-side so they can't propagate to NULL-keyed left rows that
    # land in the same window partition
    for k in on:
        right = right.filter(F.col(k).isNotNull())

    rpay = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c) for c in right_cols]
    )
    r_side = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        rpay.alias("__rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.lit(None).cast(left.schema[left_ts].dataType).alias("__lts"),
        F.lit(False).alias("__is_left"),
    )
    l_side = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.lit(None).cast(r_side.schema["__rpay"].dataType).alias("__rpay"),
        *[F.col(c) for c in left_payload],
        F.col(left_ts).alias("__lts"),
        F.lit(True).alias("__is_left"),
    )
    unioned = r_side.unionByName(l_side)

    asc = direction == "backward"
    order = [F.col("__ts").asc() if asc else F.col("__ts").desc(), F.col("__tag").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rpay", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("__m", matched)
        .filter(F.col("__is_left"))
        .select(
            *on,
            F.col("__lts").alias(left_ts),
            *left_payload,
            F.col("__m.__mts").alias("matched_ts"),
            *[F.col(f"__m.{c}").alias(c) for c in right_cols],
        )
    )
    if tolerance_seconds is not None:
        # one select, gap computed ONCE from the pre-mask matched_ts — a
        # withColumn chain would re-derive gap from the already-nulled
        # column and only work by accident of null propagation
        gap_ok = (
            F.abs(
                F.col(left_ts).cast("double") - F.col("matched_ts").cast("double")
            )
            <= tolerance_seconds
        )
        out = out.select(
            *on,
            left_ts,
            *left_payload,
            F.when(gap_ok, F.col("matched_ts")).alias("matched_ts"),
            *[F.when(gap_ok, F.col(c)).alias(c) for c in right_cols],
        )
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    return out


def rolling_stats(
    df: DataFrame,
    partition_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    n: int = 3,
    round_to: int | None = 2,
) -> DataFrame:
    """Trailing ``n``-row window statistics per series: avg / sample-std /
    min / max over the current row and the ``n-1`` preceding, plus
    ``n_window`` (how many rows the frame actually held, < n at the head).

    One hash exchange on the series key, one sort, four aggregates sharing
    the same window frame — Catalyst evaluates them in a single Window
    physical node, so the cost is the sort, not the stat count.
    ``round_to`` defaults to cents for currency series; pass a higher
    precision (or ``None`` for no rounding) for rate/ratio-scale values.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    rnd = (lambda c: c) if round_to is None else (lambda c: F.round(c, round_to))
    return df.select(
        *partition_cols,
        ts_col,
        value_col,
        rnd(F.avg(value_col).over(w)).alias(f"avg_{n}"),
        rnd(F.stddev_samp(value_col).over(w)).alias(f"std_{n}"),
        rnd(F.min(value_col).over(w)).alias(f"min_{n}"),
        rnd(F.max(value_col).over(w)).alias(f"max_{n}"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )


def gap_fill(
    df: DataFrame,
    series_col: str = "series_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_months: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Complete each series' timeline at a fixed month step between its own
    first and last observation, linearly interpolating missing values —
    the standard repair for a gappy indicator before it can drive a
    regression-based disaggregation (the reference outright *requires*
    gap-free inputs, ts_disagg.py:221-231; this operator manufactures
    them).

    Plan shape: one tiny per-series min/max aggregate expands to the dense
    timeline via ``sequence`` + ``explode`` (rows = series x months, never
    wider), a left join pulls in the observed points, and ONE exchange +
    ONE sort feeds two Window nodes (trailing last-observation and leading
    next-observation, same partitioning/ordering — Catalyst reuses the
    sort).  Output: ``(series, ts, value, interpolated)`` where boundary
    rows are observed by construction.
    """
    span = df.groupBy(series_col).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    grid = span.select(
        series_col,
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.col("__hi"),
                F.expr(f"INTERVAL {step_months} MONTH"),
            )
        ).alias(ts_col),
    )
    # the timeline is the month grid UNION the observed stamps: an
    # observation off the lo + k*step grid (unaligned day-of-month, uneven
    # spacing) would otherwise miss the left join and silently vanish; the
    # union keeps every observation as an anchor the gaps interpolate toward
    # (months_between handles fractional months), and is a no-op for inputs
    # already on the grid
    timeline = grid.unionByName(df.select(series_col, ts_col)).distinct()
    joined = timeline.join(
        df.select(series_col, ts_col, value_col), [series_col, ts_col], "left"
    )

    w_back = (
        Window.partitionBy(series_col)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(series_col)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col(ts_col))
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(obs_ts, ignorenulls=True).over(w_fwd)

    frac = F.months_between(F.col(ts_col), prev_t) / F.months_between(
        next_t, prev_t
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    # 6-decimal default, NOT 2: interpolated values frequently land exactly
    # on half-cent boundaries (a cents difference divided by a small gap
    # length), where engines disagree on tie direction; at 6 decimals the
    # tie class is empty for currency-scale magnitudes
    return joined.select(
        series_col,
        ts_col,
        F.round(filled, round_to).alias(value_col),
        v.isNull().alias("interpolated"),
    )


def clip_outliers(
    df: DataFrame,
    partition_cols: list[str],
    value_col: str = "value",
    lower_q: float = 0.01,
    upper_q: float = 0.99,
) -> DataFrame:
    """Winsorize ``value_col`` at per-group exact quantiles — the robust
    preprocessing step before an outlier-sensitive fit (a single fat-finger
    observation otherwise dominates a GLS indicator regression).

    Adds ``<value>_clipped`` plus a ``clipped`` flag; group bounds come
    from ONE aggregate (both quantiles in a single ``percentile`` pass)
    broadcast-joined back, so the fact rows shuffle zero times.  Exact
    percentile gathers each group's values executor-side; at 100 TB swap
    ``approx_percentile`` into the same shape for a t-digest sketch with
    bounded error.

    The bounds join is NULL-SAFE (``<=>``): ``groupBy`` puts NULL-keyed
    rows in their own group, and a plain equi-join would then silently drop
    exactly those rows on the way back.  With ``<=>`` they rejoin their own
    group's bounds — no row of ``df`` ever vanishes (SQL mirror:
    ``IS NOT DISTINCT FROM``).
    """
    bounds = df.groupBy(*partition_cols).agg(
        F.expr(
            f"percentile({value_col}, array({lower_q}, {upper_q}))"
        ).alias("__b")
    ).select(
        *[F.col(c).alias(f"__k_{c}") for c in partition_cols],
        F.col("__b")[0].alias("__lo"),
        F.col("__b")[1].alias("__hi"),
    )
    cond = F.lit(True)
    for c in partition_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__k_{c}"))
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return (
        df.join(F.broadcast(bounds), cond)
        .withColumn(f"{value_col}_clipped", F.round(clipped, 6))
        .withColumn("clipped", (v < F.col("__lo")) | (v > F.col("__hi")))
        .drop("__lo", "__hi", *[f"__k_{c}" for c in partition_cols])
    )


def indicator_corr(
    df: DataFrame,
    series_col: str,
    y_col: str,
    x_cols: list[str],
) -> DataFrame:
    """Pearson correlation of the target against each candidate indicator,
    per series — the indicator-selection step before a Chow-Lin /
    Litterman fit (the reference leaves choosing ``high_freq_df``'s
    columns entirely to the user; this ranks them).

    ``corr`` is an algebraic aggregate (sum, sum-of-squares, cross-sum):
    map-side partial aggregation applies, so the shuffle carries one
    partial state per (series, partition), not the rows.

    FLOAT-GRID BOUND (the verify-skill rule): the 6-decimal rounded
    CORR is computed over order-dependent double partial sums (both the
    month-level input sums and corr's own moment accumulation), so each
    output value carries a residual cross-engine tie probability of
    roughly ``2 x eps_corr / 1e-6 ~ 2e-5`` (eps_corr ~ 1e-11 from
    ~1e4-term cents-magnitude sums).  SAFE CORPUS BOUND: ~10^3 series
    (expected hash flips ~0.1 at a few output values per series).  Past
    that, use the exact-sufficient-statistic formulation —
    ``queries.indicator_lead_lag`` carries it: cents-scaled integer
    sums in DECIMAL(38,0) with one final double division, tie-free at
    any scale — as the scale-certification twin.
    """
    aggs = [
        F.round(F.corr(y_col, x), 6).alias(f"corr_{x}") for x in x_cols
    ]
    return df.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("n_obs"), *aggs
    )


def ewma_series(
    df: DataFrame,
    partition_cols: list[str],
    ord_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    round_to: int | None = None,
) -> DataFrame:
    """Per-series exponentially weighted moving average, computed as a
    SEQUENTIAL left fold: ``s_0 = x_0``, ``s_t = alpha*x_t +
    (1-alpha)*s_{t-1}`` — the classic smoother a disaggregation user
    applies to an indicator before regressing on it (the reference
    delegates smoothing to pandas ``ewm``; see the pandas-alignment
    surface around ts_disagg.py:298).

    Determinism contract: the fold is a left-to-right reduction over the
    list sorted by ``ord_col`` — there is NO summation-order freedom, so
    two engines that fold the identically-ordered doubles with the same
    IEEE ops produce bit-identical results (DuckDB's ``list_reduce`` over
    a window-accumulated list is the oracle twin).  Sequential folds are
    exempt from the float-grid corpus-size bound for that reason: ties in
    the ``round_to`` grid can only arise if the *inputs* differ, never
    from reassociation.  CAVEAT for dyadic ``alpha``: the fold values lie
    exactly on a (10^-d / 2^t)-grid that intersects the decimal rounding
    grid's half-points SYSTEMATICALLY, where Spark's HALF_UP (exact
    binary expansion) and DuckDB's multiply-then-round disagree — which
    is why the DEFAULT is ``round_to=None`` (raw bit-identical doubles);
    opt into decimal rounding explicitly only for display surfaces
    (measured: 1 flip in 1975 rows at sf0.01 with round_to=6; zero
    unrounded at every tier).

    Scale shape: one exchange on the series key, then each group folds
    its own collected array (bounded by the series' timeline length — a
    few hundred periods, never data-sized) inside a single projection.
    No O(n^2) self-join, no Python UDF; the fold runs in the JVM's
    higher-order-function evaluator.
    """
    a = float(alpha)
    packed = df.groupBy(*partition_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ord_col).alias("o"),
                    F.col(value_col).cast("double").alias("x"),
                )
            )
        ).alias("seq")
    )
    # init = [first element as its own EWMA]; fold the rest, each step
    # reading the running state from the tail of the accumulator array.
    folded = packed.select(
        *partition_cols,
        F.aggregate(
            F.slice("seq", F.lit(2), F.greatest(F.size("seq") - 1, F.lit(0))),
            F.array(
                F.struct(
                    F.col("seq")[0]["o"].alias("o"),
                    F.col("seq")[0]["x"].alias("e"),
                )
            ),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.struct(
                        x["o"].alias("o"),
                        (
                            F.lit(a) * x["x"]
                            + F.lit(1.0 - a) * F.element_at(acc, -1)["e"]
                        ).alias("e"),
                    )
                ),
            ),
        ).alias("out"),
    )
    e = F.col("p.e")
    if round_to is not None:
        e = F.round(e, round_to)
    return folded.select(*partition_cols, F.explode("out").alias("p")).select(
        *partition_cols,
        F.col("p.o").alias(ord_col),
        e.alias("ewma"),
    )


def group_ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group simple OLS trend line from EXACT integer sufficient
    statistics — the distributed "fit a slope per series" a disaggregation
    user runs to rank indicator series before the full GLS regression
    (the reference's single GLS fit is kernels.py's K6; this is its
    embarrassingly-parallel per-group screening twin).

    Contract: ``x_col`` and ``y_col`` must be INTEGER-valued (period index
    and cents, say).  The five sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) accumulate in DECIMAL(38,0), so the closed forms

        slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    have EXACT integer numerators and denominators; overflow surfaces as
    NULL, never a wrapped value (headroom: cents×index ~1e10/row leaves
    1e28 of the 1e38 ceiling at 10^10 rows).  Both engines then perform
    the identical scalar IEEE ops on identical integers, so the returned
    doubles are bit-identical with no rounding grid and no float-tie
    corpus bound.  Groups with a degenerate design (all x equal, or a
    single point) return NULL slope/intercept rather than dividing by
    zero.

    Returns ``(group_cols..., n_points, slope, intercept)``.

    Scale shape: one map-side-combinable aggregate — five algebraic sums
    per group cross the shuffle, never the rows; the closed forms are a
    scalar projection on the group-sized result.
    """
    dec = "decimal(38,0)"
    x = F.col(x_col).cast(dec)
    y = F.col(y_col).cast(dec)
    agg = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n = F.col("n_points").cast(dec)
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    den = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = (
        F.col("__sy").cast("double") - slope * F.col("__sx").cast("double")
    ) / F.col("n_points").cast("double")
    return agg.select(
        *group_cols,
        F.col("n_points"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def naive_backtest(
    df: DataFrame,
    group_cols: list[str],
    ord_col: str = "month",
    value_col: str = "y",
    seasons: int = 12,
) -> DataFrame:
    """Per-series backtest of the two classical forecasting baselines —
    naive (``yhat_t = y_{t-1}``) and seasonal-naive (``yhat_t =
    y_{t-seasons}``) — the screening a disaggregation user runs to decide
    whether an indicator series even carries seasonal structure worth a
    Litterman/Chow-Lin fit.  Both models are scored on the IDENTICAL
    evaluation set (rows where the seasonal lag exists), so the MAEs are
    directly comparable.

    Contract: ``value_col`` must be INTEGER-valued (cents); lags are ROW
    lags within the ``ord_col``-sorted series (gaps are the caller's
    concern — fill first with :func:`gap_fill` if the timeline is
    sparse).  Absolute errors are integer-summed (DECIMAL(38,0)), each
    MAE is ONE integer/integer division: bit-identical doubles, no
    float-grid bound.

    Returns ``(group_cols..., n_evals, mae_naive, mae_seasonal,
    better_model)`` — ``better_model`` prefers the seasonal baseline on
    ties (the richer model wins only by strict improvement).  Series too
    short to evaluate (< seasons+1 points) drop out.

    Scale shape: one window pass per series (the two lags share the same
    sort) followed by a map-side-combinable aggregate; only per-series
    sums cross the final shuffle."""
    w = Window.partitionBy(*group_cols).orderBy(ord_col)
    dec = "decimal(38,0)"
    y = F.col(value_col).cast("long")
    scored = df.select(
        *group_cols,
        y.alias("__y"),
        F.lag(y, 1).over(w).alias("__l1"),
        F.lag(y, seasons).over(w).alias("__ls"),
    ).filter(F.col("__ls").isNotNull())
    agg = scored.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_evals"),
        F.sum(F.abs(F.col("__y") - F.col("__l1")).cast(dec)).alias("__en"),
        F.sum(F.abs(F.col("__y") - F.col("__ls")).cast(dec)).alias("__es"),
    )
    mae_n = F.col("__en").cast("double") / F.col("n_evals").cast("double")
    mae_s = F.col("__es").cast("double") / F.col("n_evals").cast("double")
    return agg.select(
        *group_cols,
        F.col("n_evals"),
        mae_n.alias("mae_naive"),
        mae_s.alias("mae_seasonal"),
        F.when(mae_n < mae_s, F.lit("naive"))
        .otherwise(F.lit("seasonal"))
        .alias("better_model"),
    )


def cusum_series(
    df: DataFrame,
    partition_cols: list[str],
    ord_col: str = "ts",
    value_col: str = "value",
    k: float = 0.0,
    target: float | None = None,
) -> DataFrame:
    """Two-sided CUSUM drift detector per series: against the series'
    own mean ``m`` (or a FIXED reference ``target`` when given — the
    known-process-level mode, and the batch twin of the streaming
    operator, streaming/windows.py:stream_cusum), the recurrences

        s+_t = max(0, s+_{t-1} + (x_t - m - k))
        s-_t = max(0, s-_{t-1} - (x_t - m) - k)

    with ``s+ = s- = 0`` at the FIRST observation (the accumulators
    start empty; the recurrence applies from the second point on).  A
    sustained level shift grows one side linearly while noise is
    absorbed by the ``max(0, .)`` reset — the classic mean-shift /
    changepoint screen a disaggregation user runs on an indicator before
    trusting a single AR(1) rho across the whole sample.

    Determinism contract (same as :func:`ewma_series`): the fold is a
    left-to-right reduction over the ``ord_col``-sorted list — no
    summation-order freedom — so engines folding identically-ordered
    identical doubles produce bit-identical raw outputs (DuckDB
    ``list_reduce`` over struct accumulators is the oracle twin; no
    rounding grid, no corpus bound).  The caller supplies ``value_col``
    doubles born from exact-integer divisions so the fold INPUTS are
    also bit-identical.

    Returns one row per input observation:
    ``(partition_cols..., ord_col, cusum_pos, cusum_neg)``.

    Scale shape: one exchange on the series key; each group folds its
    own collected array (timeline-length-bounded) inside a single
    projection — JVM higher-order functions, no Python."""
    kf = float(k)
    packed = df.groupBy(*partition_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ord_col).alias("o"),
                    F.col(value_col).cast("double").alias("x"),
                )
            )
        ).alias("seq"),
    )
    # per-series mean: avg of doubles is order-dependent — recompute it
    # as an exact pair (sum over the SORTED list, fold order pinned) so
    # the target entering the recurrence is bit-identical cross-engine.
    # A fixed `target` skips the mean entirely (streaming-twin mode).
    if target is None:
        m = F.aggregate(
            "seq", F.lit(0.0), lambda acc, e: acc + e["x"]
        ) / F.size("seq").cast("double")
    else:
        m = F.lit(float(target))
    packed = packed.select(*partition_cols, "seq", m.alias("__target"))
    folded = packed.select(
        *partition_cols,
        F.aggregate(
            F.slice("seq", F.lit(2), F.greatest(F.size("seq") - 1, F.lit(0))),
            F.array(
                F.struct(
                    F.col("seq")[0]["o"].alias("o"),
                    F.lit(0.0).alias("sp"),
                    F.lit(0.0).alias("sn"),
                )
            ),
            lambda acc, e: F.concat(
                acc,
                F.array(
                    F.struct(
                        e["o"].alias("o"),
                        F.greatest(
                            F.lit(0.0),
                            F.element_at(acc, -1)["sp"]
                            + (e["x"] - F.col("__target") - F.lit(kf)),
                        ).alias("sp"),
                        F.greatest(
                            F.lit(0.0),
                            F.element_at(acc, -1)["sn"]
                            - (e["x"] - F.col("__target"))
                            - F.lit(kf),
                        ).alias("sn"),
                    )
                ),
            ),
        ).alias("out"),
    )
    return folded.select(*partition_cols, F.explode("out").alias("p")).select(
        *partition_cols,
        F.col("p.o").alias(ord_col),
        F.col("p.sp").alias("cusum_pos"),
        F.col("p.sn").alias("cusum_neg"),
    )


def theil_sen_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group Theil-Sen robust slope: the MEDIAN of all pairwise
    slopes ``(y_j - y_i) / (x_j - x_i)`` over ``x_i < x_j`` — the
    outlier-proof twin of :func:`group_ols_trend` (one wild month moves
    OLS arbitrarily; Theil-Sen tolerates ~29% contamination), the robust
    screen to run when an indicator series has level shifts a
    disaggregation fit should not chase.

    Contract: integer-valued ``x_col``/``y_col`` with ``x`` UNIQUE within
    each group (a period grid).  Every pairwise slope is one
    integer/integer division — both engines divide identical integers,
    so each slope double is bit-identical; sorting identical doubles and
    picking the middle (or averaging the two middles, one more identical
    IEEE op) keeps the median bit-identical with no rounding grid and no
    corpus-size bound.

    Returns ``(group_cols..., n_slopes, theil_sen_slope)``; groups with
    fewer than 2 points drop out (no pairs).

    Scale shape: the O(grid^2) pair generation runs INSIDE one array
    expression per group — a few thousand slopes for a monthly grid —
    after a single exchange on the group key.  Fact rows are assumed
    pre-aggregated to the grid (as with :func:`group_ols_trend`); the
    quadratic blowup is bounded by the timeline, never the corpus."""
    packed = df.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y"),
                )
            )
        ).alias("__pts")
    )
    slopes = F.expr(
        """
        array_sort(flatten(transform(__pts, (p, i) ->
            transform(filter(slice(__pts, i + 2, size(__pts)),
                             q -> q.x > p.x),
                      q -> (q.y - p.y) / (q.x - p.x)))))
        """
    )
    out = packed.select(*group_cols, slopes.alias("__s")).filter(
        F.size("__s") > 0
    )
    med = F.expr(
        """
        CASE WHEN size(__s) % 2 = 1
             THEN element_at(__s, CAST((size(__s) + 1) div 2 AS INT))
             ELSE (element_at(__s, CAST(size(__s) div 2 AS INT))
                   + element_at(__s, CAST(size(__s) div 2 + 1 AS INT))) / 2.0
        END
        """
    )
    return out.select(
        *group_cols,
        F.size("__s").cast("long").alias("n_slopes"),
        med.alias("theil_sen_slope"),
    )
