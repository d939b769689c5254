"""Execute EVERY registry query against a (scaled) data dir — no oracle,
just completion, wall time, and row count.

Usage::

    python tools/scale_smoke.py [dir]    # default .scale_stress/x10

The oracle gate proves correctness at sf0.001-0.1; the bench headline
proves throughput for its 69 queries; this closes the remaining gap — the
~58 non-headline registry queries never run at stress scale anywhere else,
and the 10x bench caught a real failure class (broadcast build OOM) that
only shows up when the data grows.  Exit 1 on any query error.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    from tsdisagg_spark.spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else None
    if sf is None:
        import os

        sf = os.path.join(
            __file__.rsplit("/", 2)[0], ".scale_stress", "x10"
        )
    spark = get_spark(
        app_name="scale-smoke",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    from tsdisagg_spark.cacheutil import release_all

    failures = 0
    slow: list[tuple[str, float]] = []
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            n = fn(spark, sf).count()
            el = round(time.time() - t0, 1)
            slow.append((name, el))
            print(f"{name}\tOK\t{n}\t{el}s")
        except Exception:
            failures += 1
            print(f"{name}\tFAIL\t{traceback.format_exc().splitlines()[-1][:200]}")
        # managed lifetime: catalog cache AND checkpoint blocks — at 10x
        # the registry's iterative queries would otherwise stack
        # edge-list-sized storage across 133 queries
        release_all(spark)
    slow.sort(key=lambda kv: -kv[1])
    print("slowest:", [(n, s) for n, s in slow[:8]])
    print(f"== {len(slow) + failures} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
