"""Interleaved A/B: serial (1 peel/checkpoint/count) vs batched
(2 peels per count job, r14) k-core loops on copurchase_kcore's pair
stream, same session, alternating reps.

Usage: python tools/ab_kcore.py [--reps 4]
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPS = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 4
SF = "/root/testdata/sf0.1"


def kcore_serial(pairs, k):
    """The pre-r14 loop verbatim: one peel + one count per round."""
    from pyspark.sql import functions as F

    from tsdisagg_spark.operators.graph import (
        _persistent_rdd_ids,
        _release_checkpoint_blocks,
    )

    sc = pairs.sparkSession.sparkContext
    ua, ub = F.col("id_a").cast("long"), F.col("id_b").cast("long")
    before = _persistent_rdd_ids(sc)
    edges = (
        pairs.select(F.least(ua, ub).alias("u"), F.greatest(ua, ub).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    live = edges
    live_ids: set = set()
    prev = -1
    for _ in range(100):
        deg = (
            live.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("n"))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = deg.where(F.col("d") >= k)
        b4 = _persistent_rdd_ids(sc)
        live_next = (
            live.join(alive.select(F.col("n").alias("u")), "u")
            .join(alive.select(F.col("n").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        new_ids = _persistent_rdd_ids(sc) - b4
        n = live_next.count()
        _release_checkpoint_blocks(sc, live_ids)
        live_ids = new_ids
        live = live_next
        if n == prev:
            break
        prev = n
    return (
        live.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def main() -> None:
    from pyspark.sql import functions as F

    from tsdisagg_spark import queries as registry
    from tsdisagg_spark.cacheutil import release_all
    from tsdisagg_spark.operators import graph
    from tsdisagg_spark.operators._par import pin_compute_parallelism
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-kcore",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    def pairs():
        li = registry.t(spark, SF, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        return (
            pin_compute_parallelism(
                li.groupBy("l_orderkey").agg(
                    F.array_sort(F.collect_set("l_partkey")).alias("__ps")
                )
            )
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(__ps, (x, i) -> "
                        "transform(slice(__ps, i + 2, size(__ps)), "
                        "y -> struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("__p")
            )
            .select(F.col("__p.id_a"), F.col("__p.id_b"))
        )

    variants = {
        "serial": lambda: kcore_serial(pairs(), 80),
        "batched": lambda: graph.kcore(pairs(), k=80, rounds_budget=8),
    }
    best = {k: float("inf") for k in variants}
    times = {k: [] for k in variants}
    for k, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()
        release_all(spark)
    for _ in range(REPS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[k].append(round(dt, 3))
            best[k] = min(best[k], dt)
            release_all(spark)
    for k in variants:
        print(f"{k}: min {best[k]:.3f}s  reps {times[k]}")
    print("load", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
