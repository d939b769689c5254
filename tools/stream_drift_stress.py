"""Run the daily_event_mix_drift STREAM twin end-to-end at a scaled tier
(VERDICT r11 #5): a real readStream -> foreachBatch run over the x1000
events tier, maintaining the (day, event_type) cell-count state with
``streaming.mv.merge_partial_aggregates``, then reading the state with
``drift_jsd_over_cells`` and comparing bit-for-bit against the one-shot
batch query over the same files.

The stream==batch equality is already test-pinned at test scale
(tests/test_operators.py::test_event_mix_drift_stream_equals_batch);
this run pins the 100 TB story's remaining unknowns — state size and
per-batch wall at 100M events — and records them for SCALING.md.

Usage::

    python tools/stream_drift_stress.py [sf_dir]
    # default sf_dir: /root/repo/.scale_stress/x1000even (100M events)

Prints one JSON line: total wall, per-batch walls, state rows/bytes,
and whether stream == batch (exit 1 on mismatch).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(ROOT, ".scale_stress", "x1000even")
)


def main() -> None:
    from pyspark.sql import functions as F

    from tsdisagg_spark.operators.profiling import drift_jsd_over_cells
    from tsdisagg_spark.queries import QUERIES
    from tsdisagg_spark.spark.session import get_spark
    from tsdisagg_spark.streaming import merge_partial_aggregates

    spark = get_spark(
        app_name="stream-drift-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(SF_DIR, "events.parquet")
    schema = spark.read.parquet(src).schema
    n_files = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    ) if os.path.isdir(src) else 1

    # one-shot batch reference over the same files
    t0 = time.perf_counter()
    want = sorted(
        tuple(r) for r in QUERIES["daily_event_mix_drift"](spark, SF_DIR).collect()
    )
    batch_wall = round(time.perf_counter() - t0, 2)

    # the stream: ~8 micro-batches over the tier's part files, each batch
    # map-side combining to (day, event_type) grain BEFORE touching state
    agg = lambda df: df.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.col("event_type").alias("__h"),
    ).agg(F.count(F.lit(1)).alias("__cp"))
    state: dict = {"cells": None}
    batch_walls: list[float] = []

    from tsdisagg_spark.cacheutil import persistent_rdd_ids

    def _unpersist(ids):
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in ids:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)

    def sink(bdf, _bid):
        bt = time.perf_counter()
        if bdf.isEmpty():
            return
        part = agg(bdf)
        merged = (
            part
            if state["cells"] is None
            else merge_partial_aggregates(
                state["cells"], part, keys=("day", "__h"), sum_cols=("__cp",)
            )
        )
        # the persisted key-grain state: day x event_type bounded.
        # localCheckpoint is eager, so once the new checkpoint exists the
        # superseded one's blocks are dead weight — unpersist them, both
        # for honest state_bytes accounting (ADVICE r12: the recorded
        # footprint previously summed every superseded checkpoint) and
        # because a real long-running MV stream must hold O(state), not
        # O(state x triggers).
        stale = set(persistent_rdd_ids(spark))
        state["cells"] = merged.localCheckpoint()
        _unpersist(stale)
        batch_walls.append(round(time.perf_counter() - bt, 2))

    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(1, n_files // 8))
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    stream_wall = round(time.perf_counter() - t0, 2)

    cells = state["cells"]
    state_rows = cells.count()
    # state footprint: the localCheckpoint's RDD storage size
    jsc = spark.sparkContext._jsc.sc()
    state_bytes = sum(
        info.memSize() + info.diskSize()
        for info in jsc.getRDDStorageInfo()
    )
    t0 = time.perf_counter()
    got = sorted(
        tuple(r)
        for r in drift_jsd_over_cells(cells, "day")
        .select(
            "day",
            F.col("n_tokens").alias("n_events"),
            "n_rest",
            "n_cells",
            "jsd",
        )
        .collect()
    )
    read_wall = round(time.perf_counter() - t0, 2)

    result = {
        "tier": SF_DIR,
        "n_events": spark.read.parquet(src).count(),
        "stream_equals_batch": got == want,
        "out_rows": len(got),
        "batch_query_wall_s": batch_wall,
        "stream_total_wall_s": stream_wall,
        "n_microbatches": len(batch_walls),
        "per_batch_wall_s": batch_walls,
        "state_rows": state_rows,
        "state_bytes": state_bytes,
        "drift_read_wall_s": read_wall,
        "load": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))
    if not result["stream_equals_batch"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
