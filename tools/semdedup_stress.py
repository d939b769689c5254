"""Measure semantic_dedup's GEMM backend across the stress tiers.

Usage::

    python tools/semdedup_stress.py [occupancy]   # default 1024
    python tools/semdedup_stress.py --probe [occupancy]

The registry query (`semantic_dedup`, K=8 seeds, Catalyst-fold pair
stage) is the oracle twin; its pair space is N^2/K — quadratic when K is
pinned.  The production configuration holds cluster OCCUPANCY fixed
instead (K = max(8, N // occupancy)), so total scored pairs stay
~N x occupancy/2 — LINEAR in the corpus.  This tool measures that claim:
wall time at sf0.1 / x10 / x100 / x1000 with occupancy-scaled K, gemm
backend, reporting the ratio ladder (a scale-correct run ratios at ~N
between adjacent tiers, not N^2).

``--probe`` measures the INCREMENTAL path instead (the
`incremental_semantic_dedup` family): build a `semantic_index` over the
corpus (vec_id % 5 != 0) with occupancy-scaled K, then probe the batch
(vec_id % 5 == 0) against it, both on the gemm backend.  Ingest cost
should ratio ~N (batch and occupancy both grow with the tier), never
N^2 — the registry query's pinned K=8 is the quadratic oracle twin, the
same adjudication class as `embedding_dup_exact`.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TIERS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("x10", "/root/repo/.scale_stress/x10"),
    ("x100", "/root/repo/.scale_stress/x100"),
    ("x1000", "/root/repo/.scale_stress/x1000"),
]


def main() -> int:
    probe_mode = "--probe" in sys.argv
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    occupancy = int(pos[0]) if pos else 1024
    tiers = [t for t in TIERS if "--skip-x1000" not in sys.argv or t[0] != "x1000"]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tsdisagg_spark.operators import similarity

    def fresh_session():
        return (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "48g")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    prev = None
    for name, d in tiers:
        # one JVM per tier: executor heap/GC state from a previous tier
        # inflated the x1000 measurement 156s -> 264s in a shared session
        spark = fresh_session()
        spark.sparkContext.setLogLevel("ERROR")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        k = max(8, n // occupancy)
        t0 = time.time()
        if probe_mode:
            corpus = emb.filter(F.col("vec_id") % 5 != 0)
            batch = emb.filter(F.col("vec_id") % 5 == 0)
            # deterministic seed table: the first K corpus vectors (a
            # throughput stand-in for kmeans centroids — same K, same
            # assignment cost shape)
            seeds = corpus.orderBy("vec_id").limit(k).select(
                F.col("vec_id").alias("seed_id"),
                F.transform(
                    "embedding", lambda x: x.cast("double")
                ).alias("seed"),
            )
            index = similarity.semantic_index(
                corpus, seeds, backend="gemm"
            )
            out = similarity.semantic_probe(
                batch, index, seeds, threshold=0.4, backend="gemm"
            )
            n_out = out.count()
            n_dup = out.select("batch_id").distinct().count()
            wall = time.time() - t0
            ratio = f"{wall / prev:.2f}x" if prev else "-"
            print(
                f"{name}\tN={n}\tK={k}\twall={wall:.1f}s\tratio={ratio}"
                f"\tpairs={n_out}\tdup_batch={n_dup}"
            )
            prev = wall
            spark.stop()
            continue
        out = similarity.semantic_dedup(
            emb, n_clusters=k, threshold=0.4, backend="gemm"
        )
        n_out, n_dup = out.agg(
            F.count(F.lit(1)), F.sum(F.col("is_dup").cast("long"))
        ).first()
        wall = time.time() - t0
        ratio = f"{wall / prev:.2f}x" if prev else "-"
        print(
            f"{name}\tN={n}\tK={k}\twall={wall:.1f}s\tratio={ratio}"
            f"\trows={n_out}\tdups={n_dup}"
        )
        prev = wall
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
