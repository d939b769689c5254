"""Stream-stream interval join — correlating two event streams within a
time window (click -> purchase attribution, request -> error correlation,
sensor -> alarm pairing).

The same call serves batch and streaming frames.  On streaming inputs the
time-range condition is what makes an unbounded stream-stream join viable:
Spark derives each side's state retention from the watermark plus the
interval bounds, so join state is O(events inside the watermark horizon),
not O(stream length).  Without the range condition a stream-stream inner
join would have to keep every row forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to each
    event as it flows (user profile on a clickstream, part metadata on an
    order stream).

    This is the STATELESS streaming join — unlike stream-stream, no join
    state accumulates and no watermark is required: every micro-batch
    joins against the static side as of that batch's execution (Spark
    re-resolves the static relation per micro-batch, so a dim refreshed
    in place is picked up on the next trigger — the cheap slowly-changing-
    dimension pattern).  The same call serves batch frames, which is what
    makes the stream-equals-batch contract testable.

    Scale shape: with ``broadcast_dim`` the static side ships to executors
    once per batch and the stream NEVER shuffles — enrichment rides the
    source partitioning end-to-end.  Leave it off only when the dim is too
    large to broadcast; the join then shuffles both sides on the key.
    ``how`` defaults to ``left`` so events without a dim row survive with
    nulls (an inner join silently dropping unmatched events is the classic
    enrichment data-loss bug).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Pairs ``(l, r)`` sharing the equi-key ``on`` with
    ``l.left_ts + lower <= r.right_ts <= l.left_ts + upper``.

    Right-side columns are emitted under ``right_prefix`` (the key keeps
    its name).  ``watermark`` (e.g. ``"2 hours"``) is applied to BOTH
    sides when the inputs are streaming — it bounds how late a row may
    arrive and therefore how much join state each side retains; batch
    inputs ignore it.

    Scale shape (batch): an equi-join on the key with the range as a join
    predicate — one shuffle per side on a key whose cardinality grows with
    the data, range fan-out bounded by events-per-key within the interval.
    Scale shape (streaming): symmetric hash join with watermark-pruned
    per-key state.
    """
    if watermark is not None and left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if watermark is not None and right.isStreaming:
        right = right.withWatermark(right_ts, watermark)

    renamed = right.select(
        F.col(on),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != on
        ],
    )
    r_ts = f"{right_prefix}{right_ts}"
    cond = (
        (left[on] == renamed[on])
        & (
            F.col(r_ts)
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(r_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
        )
    )
    return left.join(renamed, cond).drop(renamed[on])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    max_left_span: str,
    max_right_span: str,
    bucket_seconds: int = 3600,
    max_span_buckets: int = 100_000,
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream twin of the batch interval x interval overlap join
    (operators/joins.py:interval_overlap_join) — every (left, right) pair
    whose CLOSED intervals intersect, emitted EXACTLY ONCE — for live
    blast-radius pipelines where both sides flow (closed sessions from a
    sessionizer, alert windows from a monitor).

    Same plan pieces as the batch twin, via the SHARED bucketizer
    (`_overlap_bucketize` — the two paths cannot drift on bucket
    arithmetic): both sides explode to the fixed-width buckets they
    cover, meet in an equi-join on bucket id, and the overlap predicate
    plus the exactly-once overlap-start-bucket rule run as residuals
    INSIDE the join condition (a post-join filter would not inform the
    streaming state manager).

    What makes the unbounded form viable is the extra pair of
    EVENT-TIME RANGE bounds the batch twin does not need.  A streaming
    symmetric hash join can only evict state if each side's event time
    is bounded relative to the other's, and raw interval overlap gives
    no such bound (an arbitrarily long interval overlaps arbitrarily old
    ones).  So callers declare ``max_left_span`` / ``max_right_span``
    (e.g. ``"6 hours"`` for gap-closed sessions, ``"10 minutes"`` for
    alert windows); overlap then implies

        left_lo - max_right_span <= right_lo <= left_lo + max_left_span

    which is exactly the ``BETWEEN`` range Spark derives state watermarks
    from.  The declared spans are ENFORCED loudly (``raise_error`` on any
    interval longer than its declared span — a silent violation would
    silently drop true pairs), mirroring the ``max_span_buckets`` guard.
    State per side is O(intervals starting within watermark + span), not
    O(stream length).

    ``watermark`` (e.g. ``"2 hours"``) is applied to each STREAMING
    side's ``lo`` column; batch inputs ignore it, and the same call with
    batch frames returns exactly the batch twin's pairs — that equality
    is test-pinned (tests/test_timeseries.py) and gated at the events
    x10 tier against the session_incident_overlap oracle (SCALING.md
    "Round 13")."""
    from tsdisagg_spark.operators.joins import _iv_us, _overlap_bucketize

    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(
            f"left/right share column names {sorted(clash)}; "
            "rename or prefix one side before interval_overlap_join"
        )
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    w_us = int(bucket_seconds) * 1_000_000

    def _span_guard(df, lo, hi, span, side):
        ok = F.when(
            F.col(hi) <= F.col(lo) + F.expr(f"INTERVAL {span}"), F.lit(True)
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "interval_overlap_join (streaming): a %s interval "
                    + f"exceeds its declared max span of {span} "
                    + "([%s, %s]); widen the declared span — state "
                    + "eviction derived from it would drop true pairs",
                    F.lit(side),
                    F.col(lo).cast("string"),
                    F.col(hi).cast("string"),
                )
            )
        )
        return df.filter(ok)

    def _tz(df, *cols):
        # watermarks reject TIMESTAMP_NTZ; the cast is deterministic
        # because the engine pins the session time zone to UTC (the batch
        # twin makes the same cast inside its bucket arithmetic)
        for c in cols:
            if df.schema[c].dataType.typeName() == "timestamp_ntz":
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df

    left = _tz(left, left_lo, left_hi)
    right = _tz(right, right_lo, right_hi)
    if watermark is not None and left.isStreaming:
        left = left.withWatermark(left_lo, watermark)
    if watermark is not None and right.isStreaming:
        right = right.withWatermark(right_lo, watermark)
    left = _span_guard(left, left_lo, left_hi, max_left_span, "left")
    right = _span_guard(right, right_lo, right_hi, max_right_span, "right")

    lb = _overlap_bucketize(left, left_lo, left_hi, w_us, max_span_buckets)
    rb = _overlap_bucketize(
        right, right_lo, right_hi, w_us, max_span_buckets
    ).withColumnRenamed("__bucket", "__rbucket")
    start_bucket = F.floor(
        F.greatest(_iv_us(left_lo), _iv_us(right_lo)) / w_us
    )
    cond = (
        (lb["__bucket"] == rb["__rbucket"])
        # exact overlap + exactly-once start-bucket rule, in-condition
        & (F.col(left_lo) <= F.col(right_hi))
        & (F.col(right_lo) <= F.col(left_hi))
        & (lb["__bucket"] == start_bucket)
        # the state-eviction range: overlap + declared spans imply it,
        # so it filters nothing — it exists for the state manager
        & (
            F.col(right_lo)
            >= F.col(left_lo) - F.expr(f"INTERVAL {max_right_span}")
        )
        & (
            F.col(right_lo)
            <= F.col(left_lo) + F.expr(f"INTERVAL {max_left_span}")
        )
    )
    return lb.join(rb, cond).drop("__bucket", "__rbucket")
