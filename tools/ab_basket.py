"""Interleaved A/B: part_basket_lift old (persist + 4 consumers) vs new
(single-pass sentinel explode + windows) shapes, same session, alternating
reps — the only measurement this host's co-tenant bursts cannot fake.

Usage: python tools/ab_basket.py [--reps 5]
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPS = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 5
SF = "/root/testdata/sf0.1"


def old_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from tsdisagg_spark.queries import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
        .persist()
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    nb = (
        baskets.select(F.explode("bs").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> "
                "transform(slice(bs, i + 2, size(bs)), "
                "y -> struct(x AS brand_a, y AS brand_b))))"
            )
        ).alias("pr")
    ).select("pr.*")
    co = pairs.groupBy("brand_a", "brand_b").agg(
        F.count(F.lit(1)).alias("co_orders")
    )
    na = nb.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("na"))
    nb2 = nb.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("nb"))
    return (
        co.crossJoin(F.broadcast(tot))
        .join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb2), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "co_orders",
            F.round(F.col("co_orders") * 1.0 / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(
                F.col("co_orders") * 1.0 * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


def main() -> None:
    from tsdisagg_spark import queries as registry
    from tsdisagg_spark.cacheutil import release_all
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-basket",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    variants = {
        "old": lambda: old_shape(spark, SF),
        "new": lambda: registry.QUERIES["part_basket_lift"](spark, SF),
    }
    best: dict[str, float] = {k: float("inf") for k in variants}
    times: dict[str, list[float]] = {k: [] for k in variants}
    # warm both plan shapes once (JIT/codegen), then interleave
    for k, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()
        release_all(spark)
    for rep in range(REPS):
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
