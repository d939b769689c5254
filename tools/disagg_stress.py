"""Many-series disaggregation stress — the CORE capability's scale
evidence: the grouped kernel (spark/disagg.py:disaggregate) is
embarrassingly parallel across series, so wall time should scale with
(series x per-series solve) / cores and the driver should hold nothing.

One-shot mode (generate + solve + verify in one process)::

    python tools/disagg_stress.py [n_series] [n_years] [method]

Staged mode — resumable, for problem sizes whose end-to-end run exceeds
a single command budget (the 1M-series tier).  Each stage is its own
process and persists its result, so the measurement is a sum of
independently-replayable commands::

    python tools/disagg_stress.py gen    WORKDIR N_SERIES N_YEARS
    python tools/disagg_stress.py solve  WORKDIR SHARD/OF [method]
    python tools/disagg_stress.py verify WORKDIR

``solve`` processes the series with ``series_id % OF == SHARD`` and
appends its wall time to ``WORKDIR/solve_log.jsonl``; running the OF
shards sequentially yields the single-node-equivalent solve wall (their
sum), while on a real cluster the shards are pure width — disjoint
series, no cross-shard communication — so the max shard wall is the
cluster-mode estimate.  ``verify`` checks the re-aggregation invariant
(yearly sums reproduced) over EVERY series-year of the union of shard
outputs with one distributed aggregate, and prints the summary JSON.

Both modes generate ``n_series`` synthetic yearly series (``n_years``
each, so 12x as many monthly indicator rows).  Deterministic: values
are md5-derived, no RNG state.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get_spark(app_name: str):
    from tsdisagg_spark.spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=app_name,
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _gen_frames(spark, n_series: int, n_years: int):
    """Deterministic synthetic (low, ind): yearly targets 1200 + md5
    jitter; monthly indicator = smooth trend + md5 noise."""
    from pyspark.sql import functions as F

    low = (
        spark.range(n_series * n_years)
        .select(
            (F.col("id") % n_series).alias("series_id"),
            (F.col("id") / n_series).cast("int").alias("__yr"),
        )
        .select(
            "series_id",
            F.make_date(F.lit(2000) + F.col("__yr"), F.lit(1), F.lit(1)).alias("ts"),
            (
                1200.0
                + (F.conv(F.substring(F.md5(F.concat_ws("_", "series_id", "__yr")), 1, 6), 16, 10).cast("double") % 600)
            ).alias("y"),
        )
    )
    ind = (
        spark.range(n_series * n_years * 12)
        .select(
            (F.col("id") % n_series).alias("series_id"),
            (F.col("id") / n_series).cast("long").alias("__m"),
        )
        .select(
            "series_id",
            F.make_date(
                F.lit(2000) + (F.col("__m") / 12).cast("int"),
                (F.col("__m") % 12 + 1).cast("int"),
                F.lit(1),
            ).alias("ts"),
            (
                100.0
                + F.col("__m") * 0.5
                + (F.conv(F.substring(F.md5(F.concat_ws("m", "series_id", "__m")), 1, 6), 16, 10).cast("double") % 40)
            ).alias("x1"),
        )
    )
    return low, ind


def _reagg_max_err(out, low):
    """Distributed re-aggregation invariant: max |yearly sum of y_hat -
    target| over EVERY series-year; only a scalar reaches the driver."""
    from pyspark.sql import functions as F

    return (
        out.groupBy("series_id", F.year("ts").alias("yr"))
        .agg(F.sum("y_hat").alias("s"))
        .join(
            low.select(
                "series_id", F.year("ts").alias("yr"), F.col("y").alias("t")
            ),
            ["series_id", "yr"],
        )
        .agg(F.max(F.abs(F.col("s") - F.col("t"))).alias("max_err"))
        .collect()[0]["max_err"]
    )


def _oneshot(n_series: int, n_years: int, method: str) -> None:
    from tsdisagg_spark.spark.disagg import disaggregate

    spark = _get_spark("disagg-stress")
    low, ind = _gen_frames(spark, n_series, n_years)

    t0 = time.time()
    out = disaggregate(
        low, ind, method=method, agg_func="sum",
        series_col="series_id", ts_col="ts", value_col="y",
    )
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    t1 = time.time()
    max_err = _reagg_max_err(out, low)
    verify_wall = time.time() - t1

    print(
        json.dumps(
            {
                "n_series": n_series,
                "n_years": n_years,
                "method": method,
                "monthly_rows_out": n_series * n_years * 12,
                "solve_wall_sec": round(wall, 1),
                "verify_wall_sec": round(verify_wall, 1),
                "max_reagg_err": float(max_err),
            }
        )
    )
    assert max_err < 1e-6, f"re-aggregation invariant violated: {max_err}"


def _stage_gen(workdir: str, n_series: int, n_years: int) -> None:
    spark = _get_spark("disagg-stress-gen")
    t0 = time.time()
    low, ind = _gen_frames(spark, n_series, n_years)
    low.write.mode("overwrite").parquet(os.path.join(workdir, "low.parquet"))
    ind.write.mode("overwrite").parquet(os.path.join(workdir, "ind.parquet"))
    with open(os.path.join(workdir, "meta.json"), "w") as fh:
        json.dump({"n_series": n_series, "n_years": n_years}, fh)
    print(json.dumps({
        "stage": "gen", "n_series": n_series, "n_years": n_years,
        "gen_wall_sec": round(time.time() - t0, 1),
    }))


def _stage_solve(workdir: str, shard_spec: str, method: str) -> None:
    from pyspark.sql import functions as F

    from tsdisagg_spark.spark.disagg import disaggregate

    shard, of = (int(p) for p in shard_spec.split("/"))
    if not 0 <= shard < of:
        raise SystemExit(f"bad shard spec {shard_spec!r} (want SHARD/OF, 0<=SHARD<OF)")
    spark = _get_spark(f"disagg-stress-solve-{shard}-{of}")
    low = spark.read.parquet(os.path.join(workdir, "low.parquet"))
    ind = spark.read.parquet(os.path.join(workdir, "ind.parquet"))
    if of > 1:
        low = low.where(F.col("series_id") % of == shard)
        ind = ind.where(F.col("series_id") % of == shard)

    t0 = time.time()
    out = disaggregate(
        low, ind, method=method, agg_func="sum",
        series_col="series_id", ts_col="ts", value_col="y",
    )
    out.write.mode("overwrite").parquet(
        os.path.join(workdir, f"out_{shard}_of_{of}.parquet")
    )
    wall = time.time() - t0
    rec = {
        "stage": "solve", "shard": shard, "of": of, "method": method,
        "solve_wall_sec": round(wall, 1),
    }
    with open(os.path.join(workdir, "solve_log.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def _stage_verify(workdir: str) -> None:
    import glob as _glob

    with open(os.path.join(workdir, "meta.json")) as fh:
        meta = json.load(fh)

    # Pin the shard layout from the solve log instead of globbing: a rerun
    # with a different SHARD/OF split or method in the same WORKDIR used to
    # leave stale out_*_of_*.parquet dirs that a glob silently unioned into
    # one measurement.  The LAST solve record defines the run (of, method);
    # verify requires complete shard coverage under exactly that layout and
    # errors on any extra output directory.
    with open(os.path.join(workdir, "solve_log.jsonl")) as fh:
        solves = [json.loads(line) for line in fh if line.strip()]
    if not solves:
        raise SystemExit("verify: empty solve_log.jsonl — run solve first")
    of, method = solves[-1]["of"], solves[-1]["method"]
    latest: dict = {}  # last run per shard WITHIN the pinned layout
    for rec in solves:
        if rec["of"] == of and rec["method"] == method:
            latest[rec["shard"]] = rec
    missing = sorted(set(range(of)) - set(latest))
    if missing:
        raise SystemExit(
            f"verify: layout {of}-way/{method} (from the last solve) is "
            f"missing shards {missing} — finish the run or rerun them"
        )
    expected_dirs = {
        os.path.join(workdir, f"out_{s}_of_{of}.parquet") for s in range(of)
    }
    extra = sorted(
        set(_glob.glob(os.path.join(workdir, "out_*_of_*.parquet")))
        - expected_dirs
    )
    if extra:
        raise SystemExit(
            f"verify: stale shard outputs from another layout in "
            f"{workdir}: {[os.path.basename(p) for p in extra]} — remove "
            f"them (they would otherwise blend two runs into one "
            f"measurement)"
        )
    walls = [r["solve_wall_sec"] for r in latest.values()]

    spark = _get_spark("disagg-stress-verify")
    low = spark.read.parquet(os.path.join(workdir, "low.parquet"))
    out = spark.read.parquet(*sorted(expected_dirs))

    t0 = time.time()
    n_out = out.count()
    max_err = _reagg_max_err(out, low)
    verify_wall = time.time() - t0

    expected_rows = meta["n_series"] * meta["n_years"] * 12
    summary = {
        "stage": "verify",
        "n_series": meta["n_series"],
        "n_years": meta["n_years"],
        "method": method,
        "monthly_rows_out": n_out,
        "n_shards": len(latest),
        "solve_wall_sec_sum": round(sum(walls), 1),   # single-node sequential
        "solve_wall_sec_max": round(max(walls), 1),   # cluster-width estimate
        "verify_wall_sec": round(verify_wall, 1),
        "max_reagg_err": float(max_err),
    }
    print(json.dumps(summary))
    assert n_out == expected_rows, f"rows {n_out} != expected {expected_rows}"
    assert max_err < 1e-6, f"re-aggregation invariant violated: {max_err}"


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] in {"gen", "solve", "verify"}:
        stage = argv[0]
        workdir = argv[1]
        os.makedirs(workdir, exist_ok=True)
        if stage == "gen":
            _stage_gen(workdir, int(argv[2]), int(argv[3]))
        elif stage == "solve":
            _stage_solve(workdir, argv[2], argv[3] if len(argv) > 3 else "chow-lin")
        else:
            _stage_verify(workdir)
        return
    n_series = int(argv[0]) if len(argv) > 0 else 100_000
    n_years = int(argv[1]) if len(argv) > 1 else 8
    method = argv[2] if len(argv) > 2 else "chow-lin"
    _oneshot(n_series, n_years, method)


if __name__ == "__main__":
    main()
