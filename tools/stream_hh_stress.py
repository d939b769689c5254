"""Run the streaming Misra-Gries heavy-hitter store at a scaled tier:
a real readStream -> applyInPandasWithState run over the x1000
DOCUMENTS tier, streaming the Zipfian TOKEN stream (5M docs exploded
to ~320M tokens — the live-vocabulary top-talker monitor) and checking
the survival guarantee against the exact batch recount at the
heavy_hitter_tokens threshold (count * K_TARGET > n).

The Zipf corpus is the right shape for this test: the events tier
replicates users with OFFSET ids, so no key is ever heavy there by
construction; token frequencies replicate Zipf mass instead.

Pins the 100 TB unknowns the unit test cannot: state size and
per-trigger wall at a vocabulary where the naive groupBy's shuffle is
data-sized but the summary state is ``n_shards x k`` counters.

Usage::

    python tools/stream_hh_stress.py [sf_dir] [K_TARGET]
    # defaults: /root/repo/.scale_stress/x1000docu, K_TARGET=400

Prints one JSON line; exit 1 if any exact hitter is missing from the
final state or a count bound is violated.
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
    else os.path.join(ROOT, ".scale_stress", "x1000docu")
)
K_TARGET = int(sys.argv[2]) if len(sys.argv) > 2 else 400
N_SHARDS = 32
#: per-shard counters: the pigeonhole needs k+1 > K_TARGET * n_s / n,
#: i.e. ~K_TARGET/N_SHARDS on balanced shards; 4x headroom for skew
K_PER_SHARD = max(1, (K_TARGET // N_SHARDS) * 4)


def main() -> None:
    from pyspark.sql import functions as F

    from tsdisagg_spark.spark.session import get_spark
    from tsdisagg_spark.streaming import stream_heavy_hitter_candidates

    spark = get_spark(
        app_name="stream-hh-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(SF_DIR, "documents.parquet")
    toks = lambda df: df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term")
    )
    ev = toks(spark.read.parquet(src))
    schema = spark.read.parquet(src).schema

    # exact truth, batch side
    t0 = time.perf_counter()
    n = ev.count()
    exact = {
        r["term"]: r["cnt"]
        for r in ev.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * K_TARGET > F.lit(n))
        .collect()
    }
    batch_wall = round(time.perf_counter() - t0, 2)

    n_files = (
        len([f for f in os.listdir(src) if f.endswith(".parquet")])
        if os.path.isdir(src)
        else 1
    )
    emissions: list = []
    walls: list[float] = []

    def sink(bdf, bid):
        bt = time.perf_counter()
        emissions.extend(
            (bid,) + tuple(r) for r in bdf.collect()
        )
        walls.append(round(time.perf_counter() - bt, 2))

    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(1, n_files // 8))
        .parquet(src)
    )
    out = stream_heavy_hitter_candidates(
        toks(stream), "term", k=K_PER_SHARD, n_shards=N_SHARDS
    )
    q = out.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    stream_wall = round(time.perf_counter() - t0, 2)

    last_bid: dict = {}
    for bid, shard, *_ in emissions:
        last_bid[shard] = max(last_bid.get(shard, -1), bid)
    final = [
        (shard, key, lower, n_seen, dec)
        for bid, shard, key, lower, n_seen, dec in emissions
        if bid == last_bid[shard]
    ]
    candidates = {key: (lower, dec) for _, key, lower, _, dec in final}
    missing = [k for k in exact if k not in candidates]
    bound_violations = [
        k
        for k, c in exact.items()
        if k in candidates
        and not (candidates[k][0] <= c <= candidates[k][0] + candidates[k][1])
    ]
    result = {
        "tier": SF_DIR,
        "n_events": n,
        "k_target": K_TARGET,
        "n_shards": N_SHARDS,
        "k_per_shard": K_PER_SHARD,
        "n_exact_hitters": len(exact),
        "n_candidates": len(candidates),
        "state_counters": len(final),
        "missing_hitters": len(missing),
        "bound_violations": len(bound_violations),
        "batch_recount_wall_s": batch_wall,
        "stream_total_wall_s": stream_wall,
        "n_microbatches": len(walls),
        "per_batch_sink_wall_s": walls,
        "load": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))
    if missing or bound_violations:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
