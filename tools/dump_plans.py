"""Dump .explain('formatted') for every bench headline query to
plans/r13/<name>_<tag>.txt (tag = before/after, argv[1]).

Plan capture is driver-only (no job runs): used to document the plan
shape each optimization claim rests on (guide section 1 / 7.2).
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def main() -> None:
    from bench import HEADLINE
    from tsdisagg_spark import queries as registry
    from tsdisagg_spark.spark.session import get_spark

    spark = get_spark(
        app_name="dump-plans",
        master="local[4]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in HEADLINE:
        if ONLY is not None and name not in ONLY:
            continue
        try:
            df = registry.QUERIES[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)
    from tsdisagg_spark.cacheutil import release_all
    release_all(spark)


if __name__ == "__main__":
    main()
