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
