"""Many-series disaggregation stress — the CORE capability's scale
evidence: the grouped kernel (spark/disagg.py:disaggregate) is
embarrassingly parallel across series, so wall time should scale with
(series x per-series solve) / cores and the driver should hold nothing.

Usage::

    python tools/disagg_stress.py [n_series] [n_years] [method]

Generates ``n_series`` synthetic yearly series (``n_years`` each, so
12x as many monthly indicator rows), runs the distributed
disaggregation, forces full materialization through the noop sink, and
verifies the re-aggregation invariant (yearly sums reproduced) on every
series via one aggregate — the same constraint the golden tests pin,
checked distributed.

Deterministic: values are md5-derived, no RNG state.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_years = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    method = sys.argv[3] if len(sys.argv) > 3 else "chow-lin"

    from pyspark.sql import functions as F

    from tsdisagg_spark.spark.session import get_spark
    from tsdisagg_spark.spark.disagg import disaggregate

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="disagg-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # yearly targets: value = 1200 + deterministic md5 jitter per (sid, yr)
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
    # monthly indicator: smooth trend + md5 noise, one column
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

    t0 = time.time()
    out = disaggregate(
        low, ind, method=method, agg_func="sum",
        series_col="series_id", ts_col="ts", value_col="y",
    )
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    # distributed re-aggregation invariant: max |yearly sum - target| over
    # EVERY series-year (one aggregate; only a scalar reaches the driver)
    t1 = time.time()
    reagg = (
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
    verify_wall = time.time() - t1

    import json

    print(
        json.dumps(
            {
                "n_series": n_series,
                "n_years": n_years,
                "method": method,
                "monthly_rows_out": n_series * n_years * 12,
                "solve_wall_sec": round(wall, 1),
                "verify_wall_sec": round(verify_wall, 1),
                "max_reagg_err": float(reagg),
            }
        )
    )
    assert reagg < 1e-6, f"re-aggregation invariant violated: {reagg}"


if __name__ == "__main__":
    main()
