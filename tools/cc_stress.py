"""Measure connected_components() on synthetic large graphs — the
iterative-operator evidence complementing tools/pagerank_stress.py:
convergence rounds, wall time, and the O(1)-storage contract (per-round
checkpoint blocks released) at >=10^6 nodes.

Usage::

    python tools/cc_stress.py [n_nodes] [avg_degree]

Two graph shapes per run, both deterministic:

* ``random`` — ``n_nodes`` ids with md5-derived endpoints (plus a ring
  edge per node): one giant component, converges in few large/small-star
  rounds — the throughput case.
* ``chains`` — 1000 disjoint chains of ``n_nodes / 1000`` links: maximal
  diameter per component, the worst case that makes naive min-label
  propagation O(n) rounds and exercises the O(log^2 n) star algorithm —
  the convergence case.

Prints wall time, component count, and the number of persistent RDDs the
session holds afterwards (must be O(1), not O(rounds)).
"""

from __future__ import annotations

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

    spark = get_spark(
        app_name="cc-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(label: str, edges) -> None:
        edges = edges.persist()
        n_edges = edges.count()
        t0 = time.time()
        comps = graph.connected_components(edges, "id_a", "id_b")
        n_comp, n_lab = comps.agg(
            F.countDistinct("component"), F.count(F.lit(1))
        ).collect()[0]
        el = time.time() - t0
        held = len(persistent_rdd_ids(spark))
        print(
            f"{label}: {el:.1f}s  edges={n_edges} labeled={n_lab} "
            f"components={n_comp} persistent-rdds-held={held}"
        )
        release_all(spark)

    # random: md5-derived endpoints + a ring edge -> one giant component
    rnd = spark.range(n_nodes).select(
        F.col("id").alias("id_a"),
        F.explode(
            F.array(
                F.pmod(F.col("id") + 1, F.lit(n_nodes)),
                *[
                    F.pmod(F.abs(F.xxhash64(F.col("id"), F.lit(k))), F.lit(n_nodes))
                    for k in range(avg_deg - 1)
                ],
            )
        ).alias("id_b"),
    )
    run(f"random {n_nodes}n x{avg_deg}", rnd)

    # chains: 1000 disjoint maximal-diameter components
    links = n_nodes // 1000
    ch = spark.range(n_nodes).filter(F.pmod("id", F.lit(links)) != links - 1)
    ch = ch.select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    run(f"chains 1000 x {links}", ch)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
