"""Streaming period aggregation — the reference's A1/A2 aggregation family
lifted onto Structured Streaming (an extension; the reference is batch-only,
SURVEY.md section 2.10).

The same logical plan serves both modes: ``tumbling_counts`` declares the
windowed aggregation, and ``stream_tumbling_counts`` adds the watermark so
state for closed windows is reclaimed.  At scale the watermark bound is the
knob that caps state-store size: state ~ (#keys x #open windows).

Out-of-order arrival semantics (test-pinned, tests/test_operators.py):

* **Watermarked aggregations** (``stream_tumbling_counts``,
  ``stream_windowed_distinct_registers``) follow Structured Streaming's
  contract: rows later than the watermark but inside a still-open window
  are absorbed; rows older than the watermark are dropped; append mode
  emits each window exactly once after the watermark passes its end.
* **``stateful_sessions``** enforces the watermark ITSELF (arbitrary
  stateful operators receive late rows unfiltered): events older than
  the current watermark are dropped before the session fold, so a late
  echo of an already-closed session can neither reopen it nor spawn a
  phantom session — the test pins the dropped-event divergence from the
  batch twin explicitly.
* **``stream_cusum`` / ``stream_ewma``** carry NO watermark (a fold's
  value depends on every observation, so there is no principled
  late-cutoff): rows are folded in (ts) order WITHIN a micro-batch and
  in ARRIVAL order across micro-batches.  In-order sources reproduce
  the batch fold bit-for-bit; an out-of-order source yields the fold of
  the arrival-order sequence — deterministic and test-pinned, but
  intentionally different from the batch twin (the alarm/smoothing
  sequence is the product, not a reorder buffer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window aggregation ``(key, window_start, window_end,
    n_events, total_value)`` — works on batch and streaming frames alike."""
    return (
        events.groupBy(
            F.col(key_col), F.window(F.col(ts_col), window_size).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Sliding (hopping) window aggregation: each event lands in
    ``window_size / slide`` overlapping windows.  Same shape as
    :func:`tumbling_counts`; batch and streaming frames alike.  Spark
    expands the overlap internally before the hash aggregate, so the
    shuffle carries one partial aggregate per (key, window), not one row
    per (event, window)."""
    return (
        events.groupBy(
            F.col(key_col),
            F.window(F.col(ts_col), window_size, slide).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def stream_sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of :func:`sliding_counts` with a watermark so closed
    hop windows age out of the state store (state ~ keys x open hops; the
    watermark bounds open hops at watermark/slide + window/slide)."""
    return sliding_counts(
        events.withWatermark(ts_col, watermark),
        window_size,
        slide,
        ts_col,
        key_col,
        value_col,
    )


def stream_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication — the incremental twin of the batch
    ``dedup.exact_groups`` keep-one step: the first document per content
    digest passes, replays within the watermark horizon are dropped, and
    digest state older than the watermark is reclaimed
    (``dropDuplicatesWithinWatermark``: state ~ distinct digests per
    horizon, not corpus size — the knob that makes streaming dedup viable
    at ingest rates where unbounded ``dropDuplicates`` state would grow
    forever).  Keys on the md5 digest, not the text, so the state store
    holds 16 bytes per entry instead of whole documents."""
    digested = docs.withColumn("__digest", F.md5(F.col(text_col)))
    if docs.isStreaming:
        return (
            digested.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__digest"])
            .drop("__digest")
        )
    # batch twin: plain first-wins dedup on the digest
    return digested.dropDuplicates(["__digest"]).drop("__digest")


def _session_output_schema(events: DataFrame, key_col: str) -> T.StructType:
    """Session output schema derived from the INPUT frame's key column type
    (same contract as :func:`_keyed_series_output_schema`): a string or
    struct-typed session key must round-trip through the Arrow state
    boundary unchanged, not be coerced to a hardcoded ``user_id:bigint``.
    Session bounds are always timestamps (the operator's own event-time
    arithmetic), counts/sums are fixed."""
    fields = {f.name: f for f in events.schema.fields}
    if key_col not in fields:
        raise ValueError(
            f"column {key_col!r} not in input (have {sorted(fields)})"
        )
    return T.StructType(
        [
            T.StructField(key_col, fields[key_col].dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )


_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def stateful_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user session aggregation with an inactivity gap, state timed out by
    event time against the watermark.

    This is the pattern for operators Structured Streaming lacks natively —
    arbitrary per-key state (here: the open session's running aggregate)
    updated batch-by-batch, emitted when the event-time timeout fires.
    State per key is O(1) (four scalars), so state-store size is bounded by
    the number of *concurrently active* keys, not event volume.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdf_iter, state: GroupState):
        (key_val,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key_val],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )
            return

        import numpy as np

        cur = state.get if state.exists else None
        # A micro-batch arrives as multiple Arrow chunks; one key's events can
        # span chunks, so concatenate FIRST and sort once — per-chunk sorting
        # would process them out of time order and mis-split sessions.
        frames = list(pdf_iter)
        if not frames:
            ts_us = np.empty(0, dtype="int64")
            vals = np.empty(0, dtype=np.float64)
        else:
            pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            pdf = pdf.sort_values(ts_col, kind="mergesort", ignore_index=True)
            ts_us = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
            vals = pdf[value_col].to_numpy(dtype=np.float64)

        # Late-data discipline: Structured Streaming does NOT pre-filter rows
        # older than the watermark for arbitrary stateful operators (only for
        # aggregations/joins) — dropping them is this operator's job.  Without
        # this, a late event can merge into an already-watermark-passed
        # session and try to arm a timeout earlier than the watermark, which
        # the state store rejects.
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if wm_us > 0 and len(ts_us):
            live = ts_us >= wm_us
            ts_us, vals = ts_us[live], vals[live]

        sessions: list[tuple[int, int, int, float]] = []
        if len(ts_us):
            # vectorized session fold: a row opens a new session when its gap
            # from the previous event is >= gap_us; cumsum of those flags is
            # the session id, and min/max/size/sum per id are the aggregates.
            new = np.ones(len(ts_us), dtype=bool)
            new[1:] = (ts_us[1:] - ts_us[:-1]) >= gap_us
            merge_state = cur is not None and ts_us[0] - cur[1] < gap_us
            grp = np.cumsum(new) - 1
            agg = (
                pd.DataFrame({"g": grp, "ts": ts_us, "v": vals})
                .groupby("g", sort=True)
                .agg(s=("ts", "min"), l=("ts", "max"), n=("ts", "size"), t=("v", "sum"))
            )
            sessions = [
                (int(s), int(l), int(n), float(t))
                for s, l, n, t in agg.itertuples(index=False)
            ]
            if cur is not None:
                if merge_state:
                    s0 = sessions[0]
                    sessions[0] = (
                        min(cur[0], s0[0]),
                        max(cur[1], s0[1]),
                        cur[2] + s0[2],
                        cur[3] + s0[3],
                    )
                else:
                    sessions.insert(0, cur)
        elif cur is not None:
            sessions = [cur]

        closed = sessions[:-1]
        cur = sessions[-1] if sessions else None
        if cur is not None and wm_us >= cur[1] + gap_us:
            # the watermark already passed this session's gap deadline (its
            # only events this batch were late-adjacent); close it now — the
            # timeout cannot be armed in the past
            closed = closed + [cur]
            cur = None
            if state.exists:
                state.remove()
        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(
                max(cur[1] // 1_000 + gap_minutes * 60 * 1_000,
                    wm_us // 1_000 + 1)
            )
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key_val] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [
                        pd.Timestamp(last + gap_us, unit="us")
                        for _, last, _, _ in closed
                    ],
                    "n_events": [n for *_, n, _ in closed],
                    "total_value": [round(t, 6) for *_, t in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=_session_output_schema(events, key_col),
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_distinct_registers(
    events: DataFrame,
    window_size: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    p: int = 5,
) -> DataFrame:
    """Per-window HyperLogLog register table ``(key, window_start,
    window_end, bucket, rho)`` — batch and streaming frames alike (one
    built-in windowed max aggregate, so Structured Streaming runs it
    with ordinary watermark state reclaim; no custom state operator).

    This is the streaming answer to "distinct users per hour/day":
    exact streaming COUNT DISTINCT needs state proportional to the
    distinct-key count per open window, while register state is capped
    at ``keys x open windows x 2^p`` small integers whatever the event
    rate.  Registers from different windows/days/streams merge by max
    (``operators.sketches.hll_merge``) — the union algebra that rolls
    hourly sketches into daily ones without re-reading events."""
    from tsdisagg_spark.operators.sketches import hll_hash_cols

    bucket, rho = hll_hash_cols(user_col, p)
    # Group by the window STRUCT itself, not pre-extracted start/end
    # fields: extracting before the aggregation strips the event-time
    # watermark metadata from the grouping column, so a watermarked
    # stream would reject append mode ("streaming aggregations without
    # watermark") and never evict closed-window state in update mode.
    # Projecting start/end AFTER the aggregation keeps the same output
    # schema while letting the state store bind the watermark.
    return (
        events.select(F.col(key_col), F.col(ts_col), bucket, rho)
        .groupBy(
            key_col,
            F.window(F.col(ts_col), window_size).alias("w"),
            "bucket",
        )
        .agg(F.max("rho").alias("rho"))
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "rho",
        )
    )


def windowed_distinct_counts(
    events: DataFrame,
    window_size: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    p: int = 5,
) -> DataFrame:
    """Batch twin: registers -> estimate per ``(key, window)``.  On a
    STREAM, run :func:`stream_windowed_distinct_registers` and apply
    ``hll_estimate`` per micro-batch in ``foreachBatch`` (the input is
    sketch-sized, so the estimate step is trivially cheap) — chaining
    the second aggregation inside one streaming query would require
    multiple stateful operators where one suffices."""
    from tsdisagg_spark.operators.sketches import hll_estimate

    regs = windowed_distinct_registers(
        events, window_size, ts_col, key_col, user_col, p
    )
    return hll_estimate(
        regs, p, group_cols=[key_col, "window_start", "window_end"]
    )


def stream_windowed_distinct_registers(
    events: DataFrame,
    window_size: str = "1 day",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
    p: int = 5,
) -> DataFrame:
    """Streaming variant of :func:`windowed_distinct_registers`:
    watermarked so closed windows leave the state store.  State is
    ``keys x open windows x 2^p`` integers — the fixed-size-sketch
    property is exactly what makes per-window cardinality viable on an
    unbounded stream."""
    return windowed_distinct_registers(
        events.withWatermark(ts_col, watermark),
        window_size,
        ts_col,
        key_col,
        user_col,
        p,
    )


def stream_tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming variant: watermarked so late data beyond ``watermark`` is
    dropped and closed-window state is freed.  Append output mode emits each
    window exactly once after the watermark passes its end."""
    return tumbling_counts(
        events.withWatermark(ts_col, watermark),
        window_size,
        ts_col,
        key_col,
        value_col,
    )


def _keyed_series_output_schema(
    events: DataFrame, key_col: str, ts_col: str, value_names: list[str]
) -> T.StructType:
    """Output schema for a per-key stateful series operator, derived from
    the INPUT frame's actual key/ts column types and names — a string key
    or a date timeline must round-trip through the Arrow state boundary
    unchanged, not be coerced to a hardcoded ``user_id:bigint``/
    ``ts:timestamp`` contract."""
    schema = {f.name: f for f in events.schema.fields}
    for col in (key_col, ts_col):
        if col not in schema:
            raise ValueError(
                f"column {col!r} not in input (have {sorted(schema)})"
            )
    return T.StructType(
        [
            T.StructField(key_col, schema[key_col].dataType),
            T.StructField(ts_col, schema[ts_col].dataType),
            *[T.StructField(n, T.DoubleType()) for n in value_names],
        ]
    )


_CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sp", T.DoubleType()),
        T.StructField("sn", T.DoubleType()),
        T.StructField("started", T.BooleanType()),
    ]
)


def stream_cusum(
    events: DataFrame,
    target: float,
    k: float = 0.0,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming two-sided CUSUM against a FIXED reference level
    ``target`` — the continuous drift monitor whose batch twin is
    ``operators/timeseries.py:cusum_series(..., target=...)``; the
    stream==batch equality (including state carry-over across
    micro-batches) is test-pinned.

    Convention matches the batch operator: ``s+ = s- = 0`` at a key's
    FIRST observation ever (tracked in state via ``started``), the
    recurrence applies from the second observation on — across
    micro-batch boundaries, which is exactly what the persistent
    per-key state buys.

    State per key is O(1) (two doubles + a flag), so the state store is
    bounded by the number of distinct keys, not event volume.  Rows
    inside a micro-batch are folded in (ts) order (stable sort, so
    equal-timestamp rows keep arrival order); ordering ACROSS
    micro-batches is the source's contract — replayable file/Kafka
    sources deliver per-key in-order streams, and a late row after its
    key's state has advanced is folded when it arrives (CUSUM is a
    monitoring diagnostic: the alarm sequence, not a reorder buffer,
    is the product)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tgt, kf = float(target), float(k)

    def update(key, pdf_iter, state: GroupState):
        (kid,) = key
        frames = list(pdf_iter)
        if not frames:
            return
        pdf = (
            pd.concat(frames, ignore_index=True)
            if len(frames) > 1
            else frames[0]
        )
        pdf = pdf.sort_values(ts_col, kind="mergesort", ignore_index=True)
        xs = pdf[value_col].to_numpy(dtype=np.float64)
        sp, sn, started = state.get if state.exists else (0.0, 0.0, False)
        sps, sns = [], []
        for x in xs:
            if started:
                sp = max(0.0, sp + (x - tgt - kf))
                sn = max(0.0, sn - (x - tgt) - kf)
            else:
                started = True
            sps.append(sp)
            sns.append(sn)
        state.update((sp, sn, started))
        yield pd.DataFrame(
            {
                key_col: [kid] * len(xs),
                ts_col: pdf[ts_col],
                "cusum_pos": sps,
                "cusum_neg": sns,
            }
        )

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=_keyed_series_output_schema(
            events, key_col, ts_col, ["cusum_pos", "cusum_neg"]
        ),
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EWMA_STATE_SCHEMA = T.StructType([T.StructField("s", T.DoubleType())])


def stream_ewma(
    events: DataFrame,
    alpha: float = 0.5,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-key EWMA — the continuous twin of
    ``operators/timeseries.py:ewma_series`` with the identical fold
    convention (``s_0 = x_0``; ``s_t = alpha*x_t + (1-alpha)*s_{t-1}``),
    carried across micro-batches in O(1) state per key (one double).
    The stream==batch bit-for-bit equality is test-pinned, same contract
    as :func:`stream_cusum`: identical IEEE ops over identically-ordered
    inputs; cross-batch ordering is the replayable source's contract."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)

    def update(key, pdf_iter, state: GroupState):
        (kid,) = key
        frames = list(pdf_iter)
        if not frames:
            return
        pdf = (
            pd.concat(frames, ignore_index=True)
            if len(frames) > 1
            else frames[0]
        )
        pdf = pdf.sort_values(ts_col, kind="mergesort", ignore_index=True)
        xs = pdf[value_col].astype(float).tolist()
        s = state.get[0] if state.exists else None
        out = []
        for x in xs:
            s = x if s is None else a * x + (1.0 - a) * s
            out.append(s)
        state.update((s,))
        yield pd.DataFrame(
            {key_col: [kid] * len(xs), ts_col: pdf[ts_col], "ewma": out}
        )

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=_keyed_series_output_schema(
            events, key_col, ts_col, ["ewma"]
        ),
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
