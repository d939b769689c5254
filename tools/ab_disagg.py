"""Interleaved A/B: disagg_chow_lin_suppliers / disagg_litterman_nation
old shapes (persist + broadcast-semi eligibility + internal union = 2-4
racing consumers of the cold cache) vs the round-14 single-consumer
restructures (grouping sets / post-union window eligibility).

Usage: python tools/ab_disagg.py [--reps 5]
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPS = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 5
SF = "/root/testdata/sf0.1"


def old_suppliers(spark, sf_dir):
    from pyspark.sql import functions as F

    from tsdisagg_spark.queries import t
    from tsdisagg_spark.spark.disagg import disaggregate

    li = t(spark, sf_dir, "lineitem")
    monthly = (
        li.groupBy(
            F.col("l_suppkey").alias("series_id"),
            F.date_trunc("month", "l_shipdate").alias("ts"),
        )
        .agg(
            F.sum("l_extendedprice").alias("rev"),
            F.sum("l_quantity").alias("x1"),
        )
        .persist()
    )
    elig = (
        monthly.groupBy("series_id")
        .agg(
            F.min("ts").alias("first_m"),
            F.max("ts").alias("last_m"),
            F.count(F.lit(1)).alias("n_months"),
            F.countDistinct(F.date_trunc("year", "ts")).alias("n_years"),
        )
        .filter(
            (F.month("first_m") == 1)
            & (F.col("n_months")
               == F.months_between("last_m", "first_m").cast("long") + 1)
            & (F.col("n_years") >= 3)
        )
        .select("series_id")
    )
    monthly = monthly.join(F.broadcast(elig), "series_id", "left_semi")
    low = monthly.groupBy(
        "series_id", F.date_trunc("year", "ts").alias("ts")
    ).agg(F.sum("rev").alias("y"))
    ind = monthly.select(
        "series_id", "ts", "x1", F.lit(1.0).alias("intercept")
    )
    out = disaggregate(
        low, ind, method="chow-lin", agg_func="sum", errors="skip"
    )
    return (
        out.groupBy("series_id", F.date_trunc("year", "ts").alias("ts"))
        .agg(
            F.round(F.sum("y_hat"), 2).alias("y"),
            F.count(F.lit(1)).alias("n_months"),
        )
        .filter(F.col("n_months") == 12)
        .drop("n_months")
    )


def old_litterman(spark, sf_dir):
    from pyspark.sql import functions as F

    from tsdisagg_spark.queries import t
    from tsdisagg_spark.spark.disagg import disaggregate

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    li = t(spark, sf_dir, "lineitem")
    ordn = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .select("o_orderkey", "o_orderdate", "o_totalprice", "n_name")
    )
    low = ordn.groupBy(
        F.col("n_name").alias("series_id"),
        F.date_trunc("year", "o_orderdate").alias("ts"),
    ).agg(F.sum("o_totalprice").alias("y")).persist()
    ind = (
        li.join(
            ordn.select("o_orderkey", "n_name"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("series_id"),
            F.date_trunc("month", "l_shipdate").alias("ts"),
        )
        .agg(F.sum("l_extendedprice").alias("x1"))
        .withColumn("intercept", F.lit(1.0))
        .persist()
    )
    ind_span = ind.groupBy("series_id").agg(
        F.min("ts").alias("hi"),
        F.max("ts").alias("last_m"),
        F.count(F.lit(1)).alias("n_months"),
    )
    low_span = low.groupBy("series_id").agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("last_y"),
        F.count(F.lit(1)).alias("n_years"),
    )
    elig = (
        ind_span.join(low_span, "series_id")
        .filter(
            (F.col("hi") <= F.col("lo"))
            & (F.col("n_months")
               == F.months_between("last_m", "hi").cast("long") + 1)
            & (F.col("n_years")
               == (F.months_between("last_y", "lo") / 12).cast("long") + 1)
            & (F.col("n_years") >= 3)
        )
        .select("series_id")
    )
    low = low.join(F.broadcast(elig), "series_id", "left_semi")
    ind = ind.join(F.broadcast(elig), "series_id", "left_semi")
    out = disaggregate(
        low, ind, method="litterman", agg_func="sum", errors="skip"
    )
    return (
        out.groupBy("series_id", F.date_trunc("year", "ts").alias("ts"))
        .agg(
            F.round(F.sum("y_hat"), 2).alias("y"),
            F.count(F.lit(1)).alias("n_months"),
        )
        .filter(F.col("n_months") == 12)
        .drop("n_months")
    )


def main() -> None:
    from tsdisagg_spark import queries as registry
    from tsdisagg_spark.cacheutil import release_all
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-disagg",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    # spawn the Arrow worker pool (kernel stages need it warm)
    from pyspark.sql import functions as _F

    (
        spark.range(int(cpus) * 4)
        .withColumn("g", _F.col("id") % int(cpus))
        .repartition(int(cpus), "g")
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, schema="id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    variants = {
        "suppliers_old": lambda: old_suppliers(spark, SF),
        "suppliers_new": lambda: registry.QUERIES["disagg_chow_lin_suppliers"](
            spark, SF
        ),
        "litterman_old": lambda: old_litterman(spark, SF),
        "litterman_new": lambda: registry.QUERIES["disagg_litterman_nation"](
            spark, SF
        ),
    }
    best: dict[str, float] = {k: float("inf") for k in variants}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, fn in variants.items():  # warm each plan shape once
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
