"""Measure kcore() on synthetic large graphs — the third iterative-graph
stress alongside tools/pagerank_stress.py and tools/cc_stress.py: peel
rounds vs density, wall time, and the O(1)-storage contract at >=10^6
nodes.

Usage::

    python tools/kcore_stress.py [n_nodes] [avg_degree] [k]

Graph: ``n_nodes`` ids, each contributing a ring edge plus
``avg_degree - 1`` md5-derived edges (same deterministic generator as
cc_stress).  The xxhash64 endpoints make degrees ~Poisson(2*avg_deg)
around the mean, so with k near the mean the peel cascades for several
rounds — the interesting regime; k far below keeps everything (1 round),
k far above empties the graph quickly.

Prints wall time, core size, PEEL ROUNDS USED (the quantity
``rounds_budget`` certifies in copurchase_kcore), and the persistent
RDDs held afterwards (must be O(1), not O(rounds)).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    from pyspark.sql import functions as F

    from tsdisagg_spark.cacheutil import persistent_rdd_ids, release_all
    from tsdisagg_spark.operators import graph
    from tsdisagg_spark.spark.session import get_spark

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 2 * avg_deg

    spark = get_spark(
        app_name="kcore-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = spark.range(n_nodes).select(
        F.col("id").alias("id_a"),
        F.explode(
            F.array(
                F.pmod(F.col("id") + 1, F.lit(n_nodes)),
                *[
                    F.pmod(F.abs(F.xxhash64(F.col("id"), F.lit(j))), F.lit(n_nodes))
                    for j in range(avg_deg - 1)
                ],
            )
        ).alias("id_b"),
    ).persist()
    n_edges = edges.count()

    t0 = time.time()
    stats: dict = {}
    core = graph.kcore(edges, k=k, stats=stats)
    n_core, max_deg = core.agg(
        F.count(F.lit(1)), F.max("core_degree")
    ).collect()[0]
    wall = time.time() - t0
    release_all(spark)
    held = len(persistent_rdd_ids(spark))
    print(json.dumps({
        "n_nodes": n_nodes, "avg_degree": avg_deg, "k": k,
        "n_input_edges": n_edges, "core_nodes": n_core,
        "core_max_degree": max_deg,
        "peel_rounds": stats.get("rounds_used"),
        "wall_sec": round(wall, 1),
        "persistent_rdds_held": held,
    }))
    assert held <= 2, f"storage leak: {held} persistent RDDs held"
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
