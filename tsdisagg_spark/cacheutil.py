"""Session-scope cache lifetime management.

Several operator families ``persist()`` an intermediate that feeds both
sides of a self-join (dedup posting lists, MinHash/SimHash signatures,
tf-idf weight tables) and return a LAZY DataFrame — the cache cannot be
dropped inside the operator without forcing an extra job, so its lifetime
is caller-managed (see the ``operators/dedup.py`` module docstring).  The
iterative graph operators additionally leave their FINAL
``localCheckpoint`` storage blocks behind, and those are invisible to
``DataFrame.unpersist()`` / ``spark.catalog.clearCache()`` — the
checkpointed Dataset wraps a LogicalRDD whose backing RDD was persisted
internally, bypassing the catalog's cache manager.

:func:`release_all` is the one-call cleanup a long-lived session (the
oracle sweep, a notebook, a multi-stage pipeline driver) runs between
stages: catalog cache AND every persisted RDD, checkpoint blocks
included.  Only call it AFTER materializing everything you still need —
a localCheckpoint's lineage is truncated, so its released blocks are
unrecoverable and any job still referencing them fails with a missing
checkpoint block.  One-shot jobs can skip all of this and rely on
session teardown.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> list[int]:
    """Ids of every RDD currently holding storage blocks in this session —
    catalog-cached DataFrames AND internally-persisted checkpoint RDDs.
    The sweep's zero-leak assertion reads this after :func:`release_all`."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return sorted(int(i) for i in jmap.keySet().toArray())
    except Exception:  # noqa: BLE001 — introspection must never fail a caller
        return []


def release_all(spark: SparkSession) -> int:
    """Release every cached DataFrame and every persisted RDD (including
    ``localCheckpoint`` blocks).  Returns the number of RDDs released.
    Best-effort: storage cleanup failure costs memory, never correctness —
    but a successful call leaves :func:`persistent_rdd_ids` empty."""
    try:
        spark.catalog.clearCache()
    except Exception:  # noqa: BLE001
        pass
    released = 0
    try:
        sc = spark.sparkContext
        jmap = sc._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)
                released += 1
    except Exception:  # noqa: BLE001
        pass
    return released
