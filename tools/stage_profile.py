"""Per-stage wall/task profile for one or more bench queries.

Runs each named query end-to-end with the noop sink and prints, per stage:
task count, total task time, max task time, shuffle read/write bytes —
the guide-section-1 attribution step ("is the wall in a single-task scan
stage, a shuffle, or the Python boundary?").

Usage::

    python tools/stage_profile.py exact_substring_overlap [more...] [--sf DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = "/root/testdata/sf0.1"
names = []
args = sys.argv[1:]
while args:
    a = args.pop(0)
    if a == "--sf":
        SF = args.pop(0)
    else:
        names.append(a)


def main() -> None:
    from tsdisagg_spark import queries as registry
    from tsdisagg_spark.cacheutil import release_all
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="stage-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up mirrors bench.py
    registry.QUERIES["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    (
        spark.range(int(cpus) * 4)
        .selectExpr("id", f"id % {cpus} as g")
        .repartition(int(cpus), "g")
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, schema="id long, g long")
        .write.format("noop").mode("overwrite").save()
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # run once warm (page cache/JIT), then the measured rep
        for rep in range(2):
            release_all(spark)
            before = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
            seen = {s["stageId"] for s in before}
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
        stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
        new = [s for s in stages if s["stageId"] not in seen]
        new.sort(key=lambda s: s["stageId"])
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages (measured rep)")
        print(f"{'stage':>5} {'tasks':>5} {'taskTime_s':>10} {'in_MB':>7} "
              f"{'shRead_MB':>9} {'shWrite_MB':>9}  name")
        for s in new:
            print(
                f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
                f"{s['executorRunTime']/1e3:>10.2f} "
                f"{s['inputBytes']/1e6:>7.1f} "
                f"{s['shuffleReadBytes']/1e6:>9.1f} "
                f"{s['shuffleWriteBytes']/1e6:>9.1f}  {s['name'][:60]}"
            )
        release_all(spark)


if __name__ == "__main__":
    main()
