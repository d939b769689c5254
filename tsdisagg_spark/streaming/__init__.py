"""Structured Streaming operators: watermarked tumbling windows and
stateful-style aggregations over event streams."""

from tsdisagg_spark.streaming.windows import (
    stream_tumbling_counts,
    tumbling_counts,
)

__all__ = ["stream_tumbling_counts", "tumbling_counts"]
