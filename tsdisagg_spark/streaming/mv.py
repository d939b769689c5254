"""Materialized-view delta maintenance for streaming refresh.

``incremental_monthly_revenue`` (queries.py) proves the batch form of the
MV contract: a key-grain aggregate refreshed by merging a batch's partial
aggregate into the held base equals the full recompute, because the
merged measures are integers/decimals (exactly associative — a float
measure would drift between the two paths).  This module is the streaming
side of the same contract: ``merge_partial_aggregates`` is the per-batch
``foreachBatch`` step, applied to the persisted month-grain base exactly
like the chunk-index admission pattern in :mod:`streaming.dedup` — the
state the stream carries is the AGGREGATE (bounded by the key domain,
e.g. the calendar), never the fact history.

stream == batch is test-pinned
(tests/test_operators.py::test_monthly_revenue_merge_stream_equals_batch):
micro-batched foreachBatch merges over an order stream reproduce the
one-shot ``incremental_monthly_revenue`` output bit-identically.

Scale shape: each merge is a full-outer join of two key-grain tables —
the base is calendar-bounded and the batch partial map-side combines
before it ever meets the base, so a refresh touches O(batch + affected
keys), never the fact table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_partial_aggregates(
    base: DataFrame,
    delta: DataFrame,
    keys: tuple[str, ...],
    sum_cols: tuple[str, ...],
) -> DataFrame:
    """Merge two key-grain PARTIAL aggregates: full-outer join on
    ``keys``, every ``sum_cols`` measure the coalesced sum of both
    sides.  Both inputs must already be at key grain (one row per key)
    with identically-named columns.

    Exactly associative — and therefore safe to fold over any
    micro-batch cut — when the measures are integer or decimal partial
    SUMS/COUNTS (the MV queries accumulate cents in DECIMAL(38,0) for
    exactly this reason).  Keys compare null-safely, so a NULL key
    bucket merges instead of duplicating.
    """
    if not keys:
        raise ValueError(
            "merge_partial_aggregates: keys must be non-empty — a "
            "key-grain merge needs at least one grouping column"
        )
    missing = [
        c
        for c in (*keys, *sum_cols)
        if c not in base.columns or c not in delta.columns
    ]
    if missing:
        raise ValueError(
            f"merge_partial_aggregates: columns {missing} absent from one "
            "side; both inputs must be key-grain partials with identical "
            "column names"
        )
    # Backtick-quoted column refs so dotted column names resolve as
    # names, never as nested-field paths.
    b, d = base.alias("__b"), delta.alias("__d")
    bc = lambda k: F.col(f"__b.`{k}`")
    dc = lambda k: F.col(f"__d.`{k}`")
    cond = reduce(
        lambda acc, k: acc & bc(k).eqNullSafe(dc(k)),
        keys[1:],
        bc(keys[0]).eqNullSafe(dc(keys[0])),
    )
    return b.join(d, cond, "full_outer").select(
        *[F.coalesce(bc(k), dc(k)).alias(k) for k in keys],
        *[
            (
                F.coalesce(bc(c), F.lit(0)) + F.coalesce(dc(c), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
    )
