"""Measure pagerank() on a synthetic large graph — the >=10^6-node
evidence that the size-gated contribution vector (graph.py) removes the
single-partition bottleneck the registry-scale coalesce(1) would impose.

Usage::

    python tools/pagerank_stress.py [n_nodes] [avg_degree] [iterations]
                                    [--skip-forced]

``--skip-forced`` runs only the gated (large-graph) branch — the 10M-node
tier exists to probe the gated branch's next knee (checkpoint I/O, the
40M-edge join's shuffle partitioning); re-measuring the known-pathological
forced-coalesce(1) branch there would add tens of minutes for no new
information (its single-task funnel is already demonstrated at 1M).

Generates ``n_nodes * avg_degree`` edges with deterministic md5-derived
endpoints (every node also gets one self-anchoring out-edge so the node
universe is exactly 0..n-1), runs 5 weighted power iterations under (a)
the default gate (large-graph branch: hash-partitioned contributions) and
(b) the forced coalesce(1) branch, and prints wall times plus the
invariant checks (rank count == n_nodes, total rank == 1).  Record the
ratio in SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    from pyspark.sql import functions as F

    from tsdisagg_spark.operators import graph
    from tsdisagg_spark.spark.session import get_spark

    argv = sys.argv[1:]
    skip_forced = "--skip-forced" in argv
    if skip_forced:
        argv.remove("--skip-forced")
    n_nodes = int(argv[0]) if len(argv) > 0 else 1_000_000
    avg_deg = int(argv[1]) if len(argv) > 1 else 4
    iters = int(argv[2]) if len(argv) > 2 else 5

    spark = get_spark(
        app_name="pagerank-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic pseudo-random graph: node i -> md5-derived targets;
    # one ring edge per node keeps every id in the node universe
    edges = (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.array(
                    F.pmod(F.col("id") + 1, F.lit(n_nodes)),
                    *[
                        F.pmod(
                            F.abs(
                                F.xxhash64(F.col("id"), F.lit(k))
                            ),
                            F.lit(n_nodes),
                        )
                        for k in range(avg_deg - 1)
                    ],
                )
            ).alias("dst"),
        )
        .withColumn(
            "w",
            (F.pmod(F.abs(F.xxhash64("src", "dst")), F.lit(9)) + 1).cast(
                "double"
            ),
        )
        .persist()
    )
    n_edges = edges.count()
    print(f"graph: {n_nodes} nodes, {n_edges} edges")

    def run(label: str, threshold: int) -> float:
        t0 = time.time()
        ranks = graph.pagerank(
            edges,
            "src",
            "dst",
            "w",
            iterations=iters,
            broadcast_threshold=threshold,
        )
        total, cnt = ranks.agg(
            F.sum("rank"), F.count(F.lit(1))
        ).collect()[0]
        el = time.time() - t0
        nparts = ranks.rdd.getNumPartitions()
        print(
            f"{label}: {el:.1f}s  sum(rank)={total:.9f} nodes={cnt} "
            f"rank-partitions={nparts}"
        )
        assert cnt == n_nodes, (cnt, n_nodes)
        assert abs(total - 1.0) < 1e-6, total
        return el

    t_large = run("large-branch (hash-partitioned contrib)", 100_000)
    if not skip_forced:
        t_coalesce = run("forced coalesce(1) contrib", 2**62)
        print(
            f"ratio coalesce1/large = {t_coalesce / t_large:.2f}x "
            f"on {n_nodes} nodes x {iters} iterations"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
