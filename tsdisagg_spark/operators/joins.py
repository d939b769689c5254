"""Skew-resistant join utilities.

AQE's skew-join splitting handles most hot keys at runtime, but it only
fires for sort-merge joins with statistics, and not for every shape
(stream-static joins, aggregation-feeding joins under a required
distribution, deliberately-hinted strategies).  Salting is the explicit
fallback: spread each hot key's rows over ``n_salts`` sub-keys and
replicate the other side per salt, so no single task owns a whole hot key.

Cost model: the non-salted side is replicated ``n_salts`` times through the
shuffle — use for a *medium* dimension (too big to broadcast, small enough
that n_salts copies are cheaper than one straggler task owning the hot
key's entire partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted.

    ``left`` (the skewed, large side) gets a deterministic salt in
    ``[0, n_salts)`` hashed from the full row — deterministic so results are
    reproducible run-to-run (no ``rand()``), row-dependent so a hot key's
    rows spread evenly.  ``right`` is replicated once per salt value and the
    join key becomes ``on + [salt]``.  The right side is hinted
    ``shuffle_hash``: if the right side were broadcastable, broadcasting
    would already neutralize skew and salting would be pure overhead — this
    utility exists precisely for the shuffle path.

    Only ``inner`` and ``left`` joins are supported: replicating the right
    side breaks right/full-outer semantics (unmatched right rows would
    appear ``n_salts`` times).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(right/full outer would duplicate unmatched right rows)"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
    ).cast("int")
    left_s = left.withColumn("__salt", salt)
    right_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).hint("shuffle_hash")
    return left_s.join(right_s, [*on, "__salt"], how).drop("__salt")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Change-data capture between two snapshots of the same entity table:
    one row per key present in either snapshot, classified ``added`` /
    ``removed`` / ``changed`` (/ ``unchanged``), with the compared columns
    emitted as ``old_<col>`` / ``new_<col>`` so downstream sinks can apply
    the delta — the reconciliation step of every incremental-refresh /
    SCD pipeline (detect what an upstream refeed actually touched instead
    of rewriting 100 TB).

    Comparison is NULL-SAFE per column (a NULL -> value transition is
    ``changed``, not invisible).  Plan shape: ONE full-outer sort-merge
    join on the key — both snapshots shuffle once on the same key, no
    driver state, no second pass; with both inputs bucketed on the key
    the exchange disappears entirely.  ``added``/``removed`` fall out of
    the outer join's NULL sides, so no anti-joins are planned.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.withColumn("change", change).drop("__in_old", "__in_new")
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out.select(
        *keys,
        "change",
        *[c for p in compare_cols for c in (f"old_{p}", f"new_{p}")],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_seconds: int = 600,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Range join WITHOUT an equi-key — match every point event to every
    interval with ``lo <= ts < hi`` — via fixed-width time bucketization:
    each interval explodes to the buckets it covers, points compute their
    bucket with one expression, both sides meet in an ordinary shuffled
    equi-join on the bucket id, and the exact inequality runs as a
    residual filter.  This is the join Spark's optimizer would otherwise
    plan as a cartesian BroadcastNestedLoopJoin — the classic 100 TB
    scale-killer for telemetry-vs-incident-window correlation.

    Scale levers: candidate pairs are ``sum_b points(b) x intervals(b)``
    — bounded by bucket width, never by |points| x |intervals| — and the
    interval side's replication factor is ``len/width + 1`` per row.
    Width trades those against each other; pick it near the typical
    interval length.  Degenerate (``lo >= hi``) intervals are dropped
    (Spark's ``sequence`` would otherwise count DOWN and fabricate
    buckets).  An interval spanning more than ``max_span_buckets``
    buckets fails the job with a clear message (``raise_error``) instead
    of silently materializing a multi-million-element sequence array per
    row — that shape means the width is wrong for the data, and the
    guard costs one comparison per interval.  Column names must not
    collide across the two inputs (raises ``ValueError``; prefix one
    side first).
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(
            f"points/intervals share column names {sorted(clash)}; "
            "rename or prefix one side before interval_join"
        )
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    w_us = int(bucket_seconds) * 1_000_000

    def _us(c):
        # unix_micros rejects TIMESTAMP_NTZ; the cast is deterministic
        # because the engine pins the session time zone to UTC
        return F.unix_micros(F.col(c).cast("timestamp"))

    pb = points.withColumn("__bucket", F.floor(_us(ts_col) / w_us))
    b_lo = F.floor(_us(lo_col) / w_us)
    b_hi = F.floor((_us(hi_col) - 1) / w_us)
    span_ok = F.when(
        b_hi - b_lo < F.lit(int(max_span_buckets)),
        F.lit(True),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join: an interval spans %s buckets "
                + f"(max_span_buckets={int(max_span_buckets)}); "
                + "widen bucket_seconds to fit the interval lengths",
                (b_hi - b_lo).cast("string"),
            )
        )
    )
    ib = (
        intervals.filter(F.col(lo_col) < F.col(hi_col))
        .filter(span_ok)
        .withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi)))
    )
    return (
        pb.join(ib, "__bucket")
        .filter(
            (F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_seconds: int = 3600,
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Interval x interval OVERLAP join — every (left, right) pair whose
    CLOSED time intervals intersect (``l_lo <= r_hi AND r_lo <= l_hi``)
    — the second member of the range-join family next to
    :func:`interval_join` (point-in-interval, half-open).  Closed
    semantics so zero-length intervals (a single-event session) still
    meet the windows that contain them.

    Same bucketization idea as :func:`interval_join` — both sides
    explode to the fixed-width buckets they cover and meet in an
    ordinary shuffled equi-join on bucket id with the exact overlap
    predicate as a residual filter — plus the exactly-once trick that
    replaces the DISTINCT a naive bucket join needs: a pair whose
    intervals share N buckets would match N times, so the join keeps
    the pair only in the bucket CONTAINING THE OVERLAP START
    ``greatest(l_lo, r_lo)``.  That bucket is unique per pair and is
    covered by both sides' explosions (the overlap start lies inside
    both intervals), so every overlapping pair is emitted exactly once
    and no dedup shuffle ever runs — the distinct would be a second
    full exchange of the pair stream, which at telemetry scale is the
    difference between one shuffle and two.

    Scale levers as in :func:`interval_join`: candidate pairs are
    bounded per bucket, replication is ``span/width + 1`` per row, the
    ``max_span_buckets`` guard fails loudly on a width mismatch, and
    degenerate ``lo > hi`` rows are dropped.  Column names must not
    collide across the two inputs (raises ``ValueError``)."""
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(
            f"left/right share column names {sorted(clash)}; "
            "rename or prefix one side before interval_overlap_join"
        )
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    w_us = int(bucket_seconds) * 1_000_000

    lb = _overlap_bucketize(left, left_lo, left_hi, w_us, max_span_buckets)
    rb = _overlap_bucketize(
        right, right_lo, right_hi, w_us, max_span_buckets
    ).withColumnRenamed("__bucket", "__rbucket")
    start_bucket = F.floor(
        F.greatest(_iv_us(left_lo), _iv_us(right_lo)) / w_us
    )
    return (
        lb.join(rb, lb["__bucket"] == rb["__rbucket"])
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            # exactly-once: only the bucket holding the overlap start emits
            & (F.col("__bucket") == start_bucket)
        )
        .drop("__bucket", "__rbucket")
    )


def _iv_us(c):
    """Event-time column -> integer microseconds.  unix_micros rejects
    TIMESTAMP_NTZ; the cast is deterministic because the engine pins the
    session time zone to UTC."""
    return F.unix_micros(F.col(c).cast("timestamp"))


def _overlap_bucketize(df, lo, hi, w_us, max_span_buckets):
    """Explode CLOSED intervals ``[lo, hi]`` to every fixed-width bucket
    they cover (``__bucket``), dropping degenerate ``lo > hi`` rows and
    failing loudly past ``max_span_buckets`` — the shared build step of
    the batch overlap join above and its watermarked stream-stream twin
    (streaming/joins.py:interval_overlap_join), kept in one place so the
    two plans can never drift on bucket arithmetic."""
    b_lo = F.floor(_iv_us(lo) / w_us)
    b_hi = F.floor(_iv_us(hi) / w_us)  # closed: hi's own bucket included
    span_ok = F.when(
        b_hi - b_lo < F.lit(int(max_span_buckets)), F.lit(True)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_overlap_join: an interval spans %s buckets "
                + f"(max_span_buckets={int(max_span_buckets)}); "
                + "widen bucket_seconds to fit the interval lengths",
                (b_hi - b_lo).cast("string"),
            )
        )
    )
    return (
        df.filter(F.col(lo) <= F.col(hi))
        .filter(span_ok)
        .withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi)))
    )
