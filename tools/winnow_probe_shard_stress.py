"""Extend the winnowing shard-build contract to the PROBE path
(VERDICT r12 #6): the round-12 x100 gate proved
``finalize(union(raw(shard_i))) == winnowing_posting_index(corpus)``
content-hash-identical, but the x1000 probe gate ran against a
MONOLITHICALLY-finalized index.  This run closes the remaining seam:
probe the ingest batch against a 4-SHARD-BUILT finalized index and
assert pair-set equality with the probe against the direct build —
``probe(finalize(shards)) == probe(direct)`` — at the x100 documents
tier, using the registry's own split (held = doc_id % 5 != 0 builds
the index, doc_id % 5 == 0 is the ingest batch, k=4 window=5 df_cap=50
min_shared=3 — the incremental_winnowing_dedup operating point).

Usage::

    python tools/winnow_probe_shard_stress.py [sf_dir]
    # default sf_dir: /root/repo/.scale_stress/x100

Prints one JSON line: postings/pair counts, build/probe walls, and the
pair-set equality (exit 1 on mismatch).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(ROOT, ".scale_stress", "x100")
)
N_SHARDS = 4


def main() -> None:
    from pyspark.sql import functions as F

    from tsdisagg_spark.operators import text
    from tsdisagg_spark.spark.session import get_spark

    spark = get_spark(
        app_name="winnow-probe-shard-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    held = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    # direct build (the monolithic path the x1000 probe gate used)
    t0 = time.perf_counter()
    direct = text.winnowing_posting_index(
        held, k=4, window=5, df_cap=50
    ).localCheckpoint()
    direct_rows = direct.count()
    direct_wall = round(time.perf_counter() - t0, 2)

    # fleet build: 4 disjoint corpus shards -> map-only raw postings each
    # -> plain union -> ONE finalize cap exchange
    t0 = time.perf_counter()
    shards = [
        text.winnowing_raw_postings(
            held.filter(F.col("doc_id") % N_SHARDS == i), k=4, window=5
        )
        for i in range(N_SHARDS)
    ]
    union = shards[0]
    for s in shards[1:]:
        union = union.unionByName(s)
    sharded = text.winnowing_finalize_index(
        union, df_cap=50
    ).localCheckpoint()
    sharded_rows = sharded.count()
    sharded_wall = round(time.perf_counter() - t0, 2)

    def probe(index):
        t0 = time.perf_counter()
        pairs = sorted(
            tuple(r)
            for r in text.winnowing_probe_pairs(
                batch, index, min_shared=3
            ).collect()
        )
        return pairs, round(time.perf_counter() - t0, 2)

    pairs_direct, probe_direct_wall = probe(direct)
    pairs_sharded, probe_sharded_wall = probe(sharded)

    result = {
        "tier": SF_DIR,
        "n_docs": docs.count(),
        "n_index_docs": held.count(),
        "n_batch_docs": batch.count(),
        "index_postings_direct": direct_rows,
        "index_postings_sharded": sharded_rows,
        "pairs_direct": len(pairs_direct),
        "pairs_sharded": len(pairs_sharded),
        "probe_pairs_equal": pairs_direct == pairs_sharded,
        "build_direct_wall_s": direct_wall,
        "build_sharded_wall_s": sharded_wall,
        "probe_direct_wall_s": probe_direct_wall,
        "probe_sharded_wall_s": probe_sharded_wall,
        "load": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))
    if not (
        result["probe_pairs_equal"]
        and direct_rows == sharded_rows
    ):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
