"""Run the interval OVERLAP join as a REAL watermarked stream-stream join
at a scaled events tier (VERDICT r12 #3): closed sessions and incident
windows each arrive as a time-ordered file stream, the bucketized overlap
join (streaming/joins.py:interval_overlap_join — the same shared
bucketizer and exactly-once start-bucket rule as the batch twin) runs
with a REAL eviction watermark, pairs land in a parquet sink, and the
aggregated result is compared bit-for-bit against the oracle-certified
``session_incident_overlap`` batch query over the same files.

The stream==batch equality is already test-pinned at test scale
(tests/test_timeseries.py::test_interval_overlap_join_stream_equals_batch,
which uses a corpus-spanning watermark so nothing can evict); this run
pins the production story: time-ordered arrival + a 2-day watermark means
join state is the intervals inside the horizon, NOT the stream — the
recorded state-rows peak must sit far below the exploded interval count.

Usage::

    python tools/stream_overlap_stress.py [sf_dir]
    # default sf_dir: /root/repo/.scale_stress/x10even_sparse

Prints one JSON line: stream/batch walls, micro-batch count, peak state
rows/bytes, pair count, and whether stream == batch (exit 1 on mismatch).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(ROOT, ".scale_stress", "x10even_sparse")
)
WORK = os.path.join(ROOT, ".scale_stress", "_overlap_stream_work")


def main() -> None:
    from pyspark.sql import functions as F

    from tsdisagg_spark.queries import QUERIES, sessionization
    from tsdisagg_spark.spark.session import get_spark
    from tsdisagg_spark.streaming.joins import interval_overlap_join

    spark = get_spark(
        app_name="stream-overlap-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)

    # source prep: the two interval streams, range-partitioned on their
    # start times so files arrive in event-time order (production shape:
    # a sessionizer emits sessions as they close, a monitor emits alert
    # windows as they fire) — that ordering is what lets a short
    # watermark evict instead of holding the whole tier in state
    sess = sessionization(spark, SF_DIR).select(
        F.col("user_id").alias("s_user"),
        F.col("session_start").cast("timestamp").alias("s_lo"),
        F.col("session_end").cast("timestamp").alias("s_hi"),
    )
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    inc = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 18.0)
    ).select(
        F.col("event_id").alias("incident_id"),
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES"))
        .cast("timestamp")
        .alias("win_lo"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
        .cast("timestamp")
        .alias("win_hi"),
    )
    sess_src = os.path.join(WORK, "sessions")
    inc_src = os.path.join(WORK, "incidents")
    sess.repartitionByRange(16, "s_lo").write.parquet(sess_src)
    inc.repartitionByRange(16, "win_lo").write.parquet(inc_src)

    # FileStreamSource drains the initial listing in MODIFICATION-TIME
    # order, and a parallel parquet write stamps every part with the same
    # mtime — leaving arrival order arbitrary, which defeats the range
    # partitioning (a late-range file arriving first advances the
    # watermark past entire early-range files and they are dropped
    # wholesale; measured exactly that way on the first run of this
    # script).  Stamp ascending mtimes in part order (repartitionByRange
    # assigns ascending ranges to ascending partition ids) so arrival ==
    # event-time order, the production shape the watermark assumes.
    def _order_mtimes(d):
        parts = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )
        base = time.time() - 3600
        for k, f in enumerate(parts):
            os.utime(os.path.join(d, f), (base + k, base + k))

    _order_mtimes(sess_src)
    _order_mtimes(inc_src)
    n_sessions, n_incidents = (
        spark.read.parquet(sess_src).count(),
        spark.read.parquet(inc_src).count(),
    )

    # one-shot batch reference: the oracle-certified registry query
    t0 = time.perf_counter()
    want = sorted(
        tuple(r)
        for r in QUERIES["session_incident_overlap"](spark, SF_DIR).collect()
    )
    batch_wall = round(time.perf_counter() - t0, 2)

    s_stream = (
        spark.readStream.schema(spark.read.parquet(sess_src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sess_src)
    )
    i_stream = (
        spark.readStream.schema(spark.read.parquet(inc_src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inc_src)
    )
    pairs_out = os.path.join(WORK, "pairs")
    t0 = time.perf_counter()
    q = (
        interval_overlap_join(
            s_stream,
            i_stream,
            "s_lo",
            "s_hi",
            "win_lo",
            "win_hi",
            # declared spans are ENFORCED by raise_error — a session
            # longer than 7 days would fail the run loudly, not drop
            max_left_span="7 days",
            max_right_span="10 minutes",
            bucket_seconds=600,
            watermark="2 days",
        )
        .writeStream.format("parquet")
        .option("path", pairs_out)
        .option("checkpointLocation", os.path.join(WORK, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_wall = round(time.perf_counter() - t0, 2)
    state_rows_peak = 0
    state_bytes_peak = 0
    n_batches = 0
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        rows = sum(op.get("numRowsTotal", 0) for op in ops)
        mem = sum(op.get("memoryUsedBytes", 0) for op in ops)
        state_rows_peak = max(state_rows_peak, rows)
        state_bytes_peak = max(state_bytes_peak, mem)
        n_batches += 1

    pairs = spark.read.parquet(pairs_out)
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    got = sorted(
        tuple(r)
        for r in pairs.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("s_user").cast("long").alias("n_users"),
            F.sum(
                (
                    us(F.least(F.col("s_hi"), F.col("win_hi")))
                    - us(F.greatest(F.col("s_lo"), F.col("win_lo")))
                ).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("overlap_us"),
        )
        .collect()
    )

    result = {
        "tier": SF_DIR,
        "n_events": ev.count(),
        "n_sessions": n_sessions,
        "n_incidents": n_incidents,
        "n_pairs": pairs.count(),
        "stream_equals_batch": got == want,
        "out_rows": len(got),
        "batch_query_wall_s": batch_wall,
        "stream_total_wall_s": stream_wall,
        "n_microbatches": n_batches,
        "state_rows_peak": state_rows_peak,
        "state_bytes_peak": state_bytes_peak,
        "load": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))
    shutil.rmtree(WORK, ignore_errors=True)
    if not result["stream_equals_batch"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
