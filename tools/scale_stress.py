"""Generate a key-offset-scaled copy of a testdata dir and measure how the
bench headline scales with it.

Usage::

    python tools/scale_stress.py gen   [--mult 10] [--src /root/testdata/sf0.1]
    # then:  SPARK_GRAFT_SF_DIR=/root/repo/.scale_stress/x10 python bench.py

The point is the 100 TB question made measurable: every plan claim in
PLANS.md is structural; this produces the RATIO evidence — per-query wall
time at N x the fact rows over the sf0.1 baseline.  A scale-correct query
family ratios at ~N (fact-bound), ~1 (dimension/output-bound), or in
between (partially amortized); anything well above N is a superlinear
red flag (see SCALING.md for the recorded run).

Scaling rules (facts scale, dimensions don't — the TPC-H-ish dims here are
domain tables whose cardinality a real fleet also holds fixed):

* ``orders``/``lineitem``: replica i offsets every orderkey by
  ``i * 10^9``; custkeys/partkeys/suppkeys are untouched so foreign keys
  into the fixed dims stay valid (each customer simply has N x orders —
  deeper per-key windows, the realistic direction).
* ``events``: event_id and user_id offset per replica (user base grows,
  per-user session shape preserved).
* ``documents``: doc_id offset; each replica's word list is ROTATED by
  ``7 * i`` positions, so replicas of one document share almost no
  3-shingles (Jaccard ~ 0 across replicas).  Without this, every document
  gains N - 1 exact near-dups and all pair-output families explode
  QUADRATICALLY in N — a different (adversarial-corpus) experiment, not a
  throughput one.  ``n_chars`` is recomputed from the rotated text.
* ``embeddings``: vec_id offset; dimensions cyclically shifted by replica
  index (cosine between a vector and its shifted replica ~ random), same
  rationale as the rotation.
* dims (``region nation customer supplier part``): byte-copied.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DIMS = ["region", "nation", "customer", "supplier", "part"]
OFF = 10**9


def gen(
    src: str,
    mult: int,
    out: str,
    tables: set[str] | None = None,
    hold_incidents: bool = False,
) -> None:
    """``tables`` restricts which FACT tables are replicated (e.g.
    ``{"documents"}`` for the x1000 documents-only tier — replicating
    60M-row lineitem 1000x is neither needed nor disk-sane for a
    document-family gate); unscaled facts and the dims are byte-copied
    from ``src`` so `t()`/oracle view registration still resolve every
    table.

    ``hold_incidents`` pins the INCIDENT population at the ``src`` level
    while the event stream still scales: events replicas ``i > 0`` keep
    every row (timestamps, users, session shapes untouched) but clamp
    ``value`` below the incident threshold for ``event_type = 'error'``
    rows, so only replica 0 fires incidents.  This is the
    realistic-sparsity regime for interval-overlap queries — a fleet's
    event RATE grows with scale while its ALERT count does not — and
    turns the "at real scale incidents are rare and the stream is
    linear" argument (queries.py session_incident_overlap docstring)
    into a measurable tier instead of density-scaling both interval
    sets quadratically."""
    from pyspark.sql import functions as F

    from tsdisagg_spark.spark.session import get_spark

    spark = get_spark(
        app_name="scale-stress-gen",
        master="local[16]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    facts = ["orders", "lineitem", "events", "documents", "embeddings"]
    scaled = set(facts) if tables is None else set(tables)
    unknown = scaled - set(facts)
    if unknown:
        raise SystemExit(f"unknown fact tables: {sorted(unknown)}")
    for d in DIMS + [f for f in facts if f not in scaled]:
        if os.path.isdir(f"{src}/{d}.parquet"):
            shutil.copytree(
                f"{src}/{d}.parquet", f"{out}/{d}.parquet",
                dirs_exist_ok=True,
            )
        else:
            shutil.copyfile(f"{src}/{d}.parquet", f"{out}/{d}.parquet")

    def replicas(df, build):
        parts = [build(df, i) for i in range(mult)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    if "orders" in scaled:
        orders = spark.read.parquet(f"{src}/orders.parquet")
        replicas(
            orders,
            lambda df, i: df.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * OFF)
            ),
        ).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    if "lineitem" in scaled:
        li = spark.read.parquet(f"{src}/lineitem.parquet")
        replicas(
            li,
            lambda df, i: df.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * OFF)
            ),
        ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    if "events" in scaled:
        ev = spark.read.parquet(f"{src}/events.parquet")

        def ev_replica(df, i):
            rep = df.withColumn(
                "event_id", F.col("event_id") + F.lit(i * OFF)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * OFF))
            if hold_incidents and i > 0:
                # incident predicate mirror of session_incident_overlap /
                # events_in_incident_windows: event_type='error' AND
                # value >= 18.0.  Clamp just under the threshold — rows,
                # timestamps and users survive so sessionization is
                # byte-identical to the plain tier; only the incident
                # flag is confined to replica 0.
                rep = rep.withColumn(
                    "value",
                    F.when(
                        (F.col("event_type") == "error")
                        & (F.col("value") >= 18.0),
                        F.lit(17.999),
                    ).otherwise(F.col("value")),
                )
            return rep

        replicas(ev, ev_replica).write.mode("overwrite").parquet(
            f"{out}/events.parquet"
        )

    docs = spark.read.parquet(f"{src}/documents.parquet")

    def doc_replica(df, i):
        # Replicas must differ at EVERY granularity dedup operators look
        # at, or the stress measures duplicate explosion instead of
        # throughput.  Two earlier attempts each missed one: a cyclic
        # ROTATION preserves all consecutive triples (replicas were
        # shingle-level near-dups), and a stride PERMUTATION preserves the
        # word MULTISET (SimHash is bag-of-words, so replicas had
        # IDENTICAL codes — the x100 run surfaced 25M "true" pairs).  So:
        # permute with stride 2i+3 (kills shingles) AND salt half the
        # positions with a replica-unique suffix (kills the bag — ~50%
        # token overlap puts replicas far outside both the Jaccard and
        # Hamming near-dup radii, while a base corpus's planted dup PAIRS
        # stay dups within each replica because both docs get the same
        # transform).
        if i == 0:
            return df
        stride = 2 * i + 3
        perm = F.expr(
            "array_join(transform(sequence(0, size(split(text, ' ')) - 1), "
            f"j -> element_at(split(text, ' '), "
            f"cast((j * {stride}) % size(split(text, ' ')) as int) + 1) || "
            f"(CASE WHEN (j + {i}) % 2 = 0 THEN '' ELSE '~{i}' END)), "
            "' ')"
        )
        return (
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFF))
            .withColumn("text", perm)
            .withColumn("n_chars", F.length("text").cast("long"))
        )

    if "documents" in scaled:
        replicas(docs, doc_replica).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")

    def emb_replica(df, i):
        # modular shift: replica index can exceed the dimension count (a
        # x100 run with 32-dim vectors), so shift by i mod d — replicas a
        # full cycle apart repeat vectors under new ids, which is harmless
        # for throughput runs (the all-pairs dup family is BENCH_SKIPped at
        # those multipliers precisely because it is the labeled quadratic
        # baseline)
        if i == 0:
            return df
        shift = F.expr(
            f"concat(slice(embedding, ({i} % size(embedding)) + 1, "
            f"size(embedding) - ({i} % size(embedding))), "
            f"slice(embedding, 1, {i} % size(embedding)))"
        )
        return df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * OFF)
        ).withColumn("embedding", shift)

    if "embeddings" in scaled:
        replicas(emb, emb_replica).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )
    for tn in sorted(scaled):
        n = spark.read.parquet(f"{out}/{tn}.parquet").count()
        print(f"{tn}: {n} rows")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen"])
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated fact tables to replicate (default: all); "
        "the out dir is suffixed with the first 4 chars of each table "
        "(e.g. --tables documents -> x1000docu) when restricted",
    )
    ap.add_argument(
        "--hold-incidents",
        action="store_true",
        help="scale the event stream but pin the incident population at "
        "the src level (replicas i>0 clamp error-event values below the "
        "18.0 incident threshold); out dir gains a _sparse suffix",
    )
    args = ap.parse_args()
    tables = (
        {t.strip() for t in args.tables.split(",") if t.strip()}
        if args.tables
        else None
    )
    suffix = "" if tables is None else "".join(sorted(t[:4] for t in tables))
    if args.hold_incidents:
        suffix += "_sparse"
    out = os.path.join(ROOT, ".scale_stress", f"x{args.mult}{suffix}")
    gen(args.src, args.mult, out, tables=tables,
        hold_incidents=args.hold_incidents)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
