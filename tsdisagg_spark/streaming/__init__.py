"""Structured Streaming operators: watermarked tumbling windows, stateful
session aggregation, streaming ingest dedup against a static MinHash band
index, and incremental streaming disaggregation."""

from tsdisagg_spark.streaming.dedup import (
    rowwise_minhash_signatures,
    stream_probe_candidates,
    verify_probe_candidates,
)
from tsdisagg_spark.streaming.disagg import (
    latest_solutions,
    streaming_disaggregate,
)
from tsdisagg_spark.streaming.joins import interval_join
from tsdisagg_spark.streaming.mv import merge_partial_aggregates
from tsdisagg_spark.streaming.sketches import (
    mg_merge,
    stream_heavy_hitter_candidates,
)
from tsdisagg_spark.streaming.windows import (
    sliding_counts,
    stream_exact_dedup,
    stateful_sessions,
    stream_cusum,
    stream_ewma,
    stream_sliding_counts,
    stream_tumbling_counts,
    stream_windowed_distinct_registers,
    tumbling_counts,
    windowed_distinct_counts,
    windowed_distinct_registers,
)

__all__ = [
    "interval_join",
    "latest_solutions",
    "merge_partial_aggregates",
    "mg_merge",
    "rowwise_minhash_signatures",
    "stream_heavy_hitter_candidates",
    "sliding_counts",
    "stateful_sessions",
    "stream_cusum",
    "stream_ewma",
    "stream_exact_dedup",
    "stream_probe_candidates",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "stream_windowed_distinct_registers",
    "streaming_disaggregate",
    "tumbling_counts",
    "verify_probe_candidates",
    "windowed_distinct_counts",
    "windowed_distinct_registers",
]
