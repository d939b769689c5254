"""Scale-adaptive input parallelization for CPU-heavy map-side operators.

The bench corpus arrives as ONE parquet file per table with ONE row group,
so a scan is a single task — and any operator whose cost is per-row CPU
(tokenize / shingle / hash / decode / edit-distance) runs its entire map
stage on one core of 32 (measured: the exact-substring census spent 10.4s
of its 12.4s wall in a 1-task stage; winnowing 1.7s of 2.2s;
guide section 2.5 "input skew: one huge unsplittable file").

:func:`spread_small_input` repartitions ONLY when the input has fewer
partitions than the cluster has slots, so at real scale (thousands of
input splits) it is a structural no-op and no extra shuffle is paid.  The
repartition target is ``defaultParallelism`` — cluster-adaptive, not a
constant tuned for local mode.

Shared by the dedup / text / sampling / linkage operator families; it
grew out of ``operators.dedup._spread`` (round 8) and was promoted here in
the round-13 optimization pass when stage profiling showed the same
single-task wall in seven more operator families.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: logical-plan nodes that compile to an Exchange (or a Python group
#: shuffle).  Probing ``.rdd`` on a plan containing one of these is NOT a
#: metadata read: AQE finalizes the adaptive plan by EXECUTING every
#: upstream query stage, so the probe silently runs the query's joins and
#: aggregations once before the real action runs them again (measured:
#: incremental_minhash_dedup spent 13.2s / 13 Spark jobs inside mere query
#: CONSTRUCTION at sf0.1 — the probes on the semi-joined verification
#: frames re-ran the whole candidate chain).  Matched at line starts of
#: the ANALYZED logical plan string, which is driver-only and never
#: executes anything.
_WIDE_NODE_RE = re.compile(
    r"^[\s:+-]*'?(Join|Aggregate|Window|Deduplicate|Distinct|Repartition"
    r"|Sort|GlobalLimit|Intersect|Except|FlatMapGroupsInPandas"
    r"|FlatMapCoGroupsInPandas|CoGroup)\b",
    re.M,
)


def _lineage_has_exchange(df: DataFrame) -> bool:
    """True when the frame's lineage already contains a shuffle-inducing
    node.  Such a frame's partitioning is governed by
    ``spark.sql.shuffle.partitions`` (cluster-sized by the driver
    contract), so it does not need the small-input spread — and probing it
    would double-execute under AQE (see ``_WIDE_NODE_RE``)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return _WIDE_NODE_RE.search(plan) is not None


def spread_small_input(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row work (tokenize/shingle/hash/decode) runs on
    every core: a corpus that arrives as a handful of parquet files would
    otherwise pin the whole map stage on one task.  Only repartitions when
    the input has fewer partitions than the cluster has slots — at real
    scale (thousands of input splits) this is a no-op, so no extra shuffle
    is paid.  Streaming frames pass through untouched: ``.rdd`` is illegal
    on them, and a stream's parallelism is governed by its source options
    (maxFilesPerTrigger / partition count), not a one-shot repartition.

    Frames whose lineage already contains a shuffle pass through untouched
    too, WITHOUT the partition probe: their width comes from the shuffle
    partition count, and the ``.rdd`` probe on an exchange-bearing plan
    executes the upstream stages under AQE (a full hidden pre-run of the
    query — r13 opt, guide section 1.2 "know what your action runs").
    Callers whose shuffle-derived frame is compute-dense and provably
    small should pin width explicitly with
    :func:`pin_compute_parallelism`."""
    if df.isStreaming:
        return df
    if _lineage_has_exchange(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def pin_compute_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition a COMPUTE-DENSE frame by ``cols`` with an explicit
    partition count so AQE's byte-based coalescing cannot serialize it.

    AQE coalesces post-shuffle partitions by SIZE
    (``advisoryPartitionSizeInBytes`` / ``minPartitionSize``), which is the
    right proxy for shuffle-bound stages but misjudges stages whose cost is
    CPU per row with tiny rows — a cluster-blocked cosine verification
    stage carrying 0.8 MB collapsed to ONE task of 2.4s at sf0.1 while 31
    cores idled.  A user-specified repartition count is exempt from AQE
    coalescing by contract, so the stage keeps its parallelism.

    The count is ``max(defaultParallelism, spark.sql.shuffle.partitions)``
    — both cluster-sized knobs, so the pin scales with the deployment
    rather than hard-coding local-mode constants."""
    spark = df.sparkSession
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return df.repartition(n, *cols)
