"""Interleaved in-session A/B for the spread-guard (and similar toggles).

Host noise on this box swings isolated min-of-N runs by up to 3x
(PLANS.md rounds 11-13), so cross-process A/B comparisons are not
trustworthy.  This tool times both variants INSIDE one Spark session,
alternating A and B per rep, so both sides see the same host weather,
page cache and JIT state; the per-variant MIN over reps is then a fair
comparison.

Variant toggle: ``--patch spread_guard`` flips
``operators._par._lineage_has_exchange`` between the real implementation
(variant "guard") and ``lambda df: False`` (variant "noguard" — the
pre-r13 behavior where the spread probes ``.rdd`` on every frame).

Usage::

    python tools/ab_interleave.py q1 q2 ... [--reps 3] [--sf DIR]
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.1"
REPS = 3
names = []
args = sys.argv[1:]
while args:
    a = args.pop(0)
    if a == "--sf":
        SF = args.pop(0)
    elif a == "--reps":
        REPS = int(args.pop(0))
    else:
        names.append(a)


def main() -> None:
    from tsdisagg_spark import queries as registry
    from tsdisagg_spark.cacheutil import release_all
    from tsdisagg_spark.operators import _par
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-interleave",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    (
        spark.range(int(cpus) * 4)
        .selectExpr("id", f"id % {cpus} as g")
        .repartition(int(cpus), "g")
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, schema="id long, g long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    real_guard = _par._lineage_has_exchange
    variants = {
        "guard": real_guard,
        "noguard": lambda df: False,
    }

    results: dict[str, dict[str, float]] = {
        n: {v: float("inf") for v in variants} for n in names
    }
    for rep in range(REPS):
        for vname, impl in variants.items():
            _par._lineage_has_exchange = impl
            for n in names:
                fn = registry.QUERIES[n]
                t0 = time.perf_counter()
                fn(spark, SF).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                results[n][vname] = min(results[n][vname], dt)
                release_all(spark)
                print(
                    f"  rep{rep} {vname:8s} {n}: {dt:.3f}s", file=sys.stderr
                )
    _par._lineage_has_exchange = real_guard

    print(f"{'query':35s} {'noguard':>8s} {'guard':>8s}  ratio")
    for n in names:
        a = results[n]["noguard"]
        b = results[n]["guard"]
        print(f"{n:35s} {a:8.3f} {b:8.3f}  {b / a:5.2f}x")
    print(
        "total "
        + f"{sum(r['noguard'] for r in results.values()):.3f} -> "
        + f"{sum(r['guard'] for r in results.values()):.3f}"
    )


if __name__ == "__main__":
    main()
