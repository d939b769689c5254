"""Streaming period aggregation — the reference's A1/A2 aggregation family
lifted onto Structured Streaming (an extension; the reference is batch-only,
SURVEY.md section 2.10).

The same logical plan serves both modes: ``tumbling_counts`` declares the
windowed aggregation, and ``stream_tumbling_counts`` adds the watermark so
state for closed windows is reclaimed.  At scale the watermark bound is the
knob that caps state-store size: state ~ (#keys x #open windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
