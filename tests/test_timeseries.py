"""Time-series relational operators: as-of join (vs pandas merge_asof),
gap-fill interpolation (vs pandas interpolate), rolling stats (vs pandas
rolling), indicator correlation (vs numpy corrcoef)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from tsdisagg_spark.operators import timeseries


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (1, _ts("2024-01-01T09:00:00"), "c"),  # before any right row
            (2, _ts("2024-01-01T11:00:00"), "d"),
            (3, _ts("2024-01-01T11:00:00"), "e"),  # key with no right rows
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 10.0),  # equal-instant tie
            (1, _ts("2024-01-01T11:30:00"), 20.0),
            (2, _ts("2024-01-01T09:00:00"), 30.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def test_asof_backward_inclusive(asof_frames):
    left, right = asof_frames
    out = timeseries.asof_join(left, right, on=["user_id"]).toPandas()
    by_tag = out.set_index("tag")
    assert by_tag.loc["a", "price"] == 10.0  # tie is visible when inclusive
    assert by_tag.loc["b", "price"] == 20.0
    assert pd.isna(by_tag.loc["c", "price"])
    assert by_tag.loc["d", "price"] == 30.0
    assert pd.isna(by_tag.loc["e", "price"])


def test_asof_backward_strict(asof_frames):
    left, right = asof_frames
    out = timeseries.asof_join(left, right, on=["user_id"], strict=True).toPandas()
    by_tag = out.set_index("tag")
    assert pd.isna(by_tag.loc["a", "price"])  # equal instant excluded


def test_asof_forward(asof_frames):
    left, right = asof_frames
    out = timeseries.asof_join(
        left, right, on=["user_id"], direction="forward"
    ).toPandas()
    by_tag = out.set_index("tag")
    assert by_tag.loc["c", "price"] == 10.0  # next right row at 10:00
    assert by_tag.loc["a", "price"] == 10.0  # inclusive tie
    assert pd.isna(by_tag.loc["b", "price"])  # nothing after 12:00
    assert pd.isna(by_tag.loc["d", "price"])  # right row is before


def test_asof_inner_and_tolerance(asof_frames):
    left, right = asof_frames
    inner = timeseries.asof_join(left, right, on=["user_id"], how="inner").toPandas()
    assert set(inner["tag"]) == {"a", "b", "d"}
    tol = timeseries.asof_join(
        left, right, on=["user_id"], tolerance_seconds=3600.0
    ).toPandas().set_index("tag")
    assert tol.loc["a", "price"] == 10.0  # 0s gap
    assert tol.loc["b", "price"] == 20.0  # 30min gap
    assert pd.isna(tol.loc["d", "price"])  # 2h gap > tolerance


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_l),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="s"),
        }
    ).drop_duplicates(["k", "ts"])
    rp = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="s"),
            "v": rng.uniform(0, 1, n_r).round(6),
        }
    ).drop_duplicates(["k", "ts"])
    expected = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"), on="ts", by="k"
    ).sort_values(["k", "ts"]).reset_index(drop=True)

    out = (
        timeseries.asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            on=["k"],
        )
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        out["v"], expected["v"], check_names=False
    )


def test_rolling_stats_matches_pandas(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "sid": np.repeat(["a", "b"], 20),
            "ts": list(pd.date_range("2020-01-01", periods=20, freq="MS")) * 2,
            "value": rng.uniform(10, 500, 40).round(2),
        }
    )
    out = (
        timeseries.rolling_stats(spark.createDataFrame(pdf), ["sid"], "ts", "value", n=3)
        .toPandas()
        .sort_values(["sid", "ts"])
        .reset_index(drop=True)
    )
    grp = pdf.sort_values(["sid", "ts"]).groupby("sid")["value"]
    exp_avg = grp.rolling(3, min_periods=1).mean().round(2).reset_index(drop=True)
    exp_std = grp.rolling(3, min_periods=1).std().round(2).reset_index(drop=True)
    # atol 0.011: pandas round() is banker's, Spark's is HALF_UP — exact
    # .005 ties (avg of 2-decimal inputs) legitimately differ by one cent
    np.testing.assert_allclose(out["avg_3"], exp_avg, atol=0.011)
    assert out["std_3"].isna().equals(exp_std.isna())
    np.testing.assert_allclose(
        out["std_3"].dropna(), exp_std.dropna(), atol=0.011
    )
    assert list(out["n_window"][:3]) == [1, 2, 3]


def test_gap_fill_linear_interpolation(spark):
    pdf = pd.DataFrame(
        {
            "series_id": ["s"] * 3,
            "ts": pd.to_datetime(["2020-01-01", "2020-04-01", "2020-05-01"]),
            "value": [100.0, 400.0, 150.0],
        }
    )
    out = (
        timeseries.gap_fill(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(out) == 5  # jan..may
    np.testing.assert_allclose(out["value"], [100.0, 200.0, 300.0, 400.0, 150.0])
    assert list(out["interpolated"]) == [False, True, True, False, False]


def test_gap_fill_multi_series_independent_spans(spark):
    pdf = pd.DataFrame(
        {
            "series_id": ["a", "a", "b", "b"],
            "ts": pd.to_datetime(
                ["2020-01-01", "2020-03-01", "2021-06-01", "2021-08-01"]
            ),
            "value": [1.0, 3.0, 10.0, 30.0],
        }
    )
    out = timeseries.gap_fill(spark.createDataFrame(pdf)).toPandas()
    a = out[out.series_id == "a"].sort_values("ts")
    b = out[out.series_id == "b"].sort_values("ts")
    assert len(a) == 3 and len(b) == 3
    np.testing.assert_allclose(a["value"], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(b["value"], [10.0, 20.0, 30.0])


def test_indicator_corr_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, 50)
    y = 3 * x + rng.normal(0, 0.1, 50)
    z = rng.uniform(0, 1, 50)
    pdf = pd.DataFrame(
        {
            "sid": "s",
            "ts": pd.date_range("2020-01-01", periods=50, freq="D"),
            "y": y,
            "x1": x,
            "x2": z,
        }
    )
    out = timeseries.indicator_corr(
        spark.createDataFrame(pdf), "sid", "y", ["x1", "x2"]
    ).toPandas()
    assert out.loc[0, "n_obs"] == 50
    np.testing.assert_allclose(
        out.loc[0, "corr_x1"], np.corrcoef(y, x)[0, 1], atol=1e-6
    )
    np.testing.assert_allclose(
        out.loc[0, "corr_x2"], np.corrcoef(y, z)[0, 1], atol=1e-6
    )


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """The watermarked stream-stream interval join must produce exactly the
    batch twin's pairs once the availableNow trigger drains the source."""
    from tsdisagg_spark.streaming.joins import interval_join

    src = str(tmp_path / "iv_src")
    rng = np.random.default_rng(5)
    events = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86_400, 300), unit="s"),
            "user_id": rng.integers(0, 10, 300),
            "kind": rng.choice(["click", "purchase"], 300),
            "value": rng.uniform(0, 100, 300).round(6),
        }
    )
    spark.createDataFrame(events).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)

    def split(df):
        clicks = df.filter(df.kind == "click").select("user_id", "ts")
        purchases = df.filter(df.kind == "purchase").select(
            "user_id", "ts", "value"
        )
        return clicks, purchases

    sc, sp = split(stream)
    q = (
        interval_join(sc, sp, on="user_id", upper="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("iv_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not drain in 120s"
    got = spark.sql("select * from iv_join").toPandas()

    bc, bp = split(static)
    expected = interval_join(bc, bp, on="user_id", upper="30 minutes").toPandas()
    key = ["user_id", "ts", "r_ts"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[expected.columns],
        expected.sort_values(key).reset_index(drop=True),
    )


def test_interval_overlap_join_stream_equals_batch(spark, tmp_path):
    """The watermarked stream-stream interval OVERLAP join must produce
    exactly the batch twin's pairs — and, aggregated, exactly the
    oracle-certified ``session_incident_overlap`` output — when fed the
    same sessions + incident windows as multi-micro-batch file streams
    (both sides drip one file per trigger, so cross-batch pairs exercise
    the symmetric join state, not single-batch luck)."""
    from pyspark.sql import functions as F

    from tsdisagg_spark.operators.joins import (
        interval_overlap_join as batch_join,
    )
    from tsdisagg_spark.queries import session_incident_overlap, sessionization, t
    from tsdisagg_spark.streaming.joins import (
        interval_overlap_join as stream_join,
    )

    sf = "/root/testdata/sf0.001"
    sess = sessionization(spark, sf).select(
        F.col("user_id").alias("s_user"),
        F.col("session_start").alias("s_lo"),
        F.col("session_end").alias("s_hi"),
    )
    inc = (
        t(spark, sf, "events")
        .filter((F.col("event_type") == "error") & (F.col("value") >= 18.0))
        .select(
            F.col("event_id").alias("incident_id"),
            (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("win_lo"),
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("win_hi"),
        )
    )
    sess_src, inc_src = str(tmp_path / "sess"), str(tmp_path / "inc")
    sess.repartition(3).write.parquet(sess_src)
    inc.repartition(3).write.parquet(inc_src)

    s_stream = (
        spark.readStream.schema(sess.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sess_src)
    )
    i_stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inc_src)
    )
    # spans: sessions are gap-closed (loose "7 days" bound is still a
    # real eviction bound); incident windows are exactly 10 minutes.
    # The "35 days" watermark exceeds the corpus span, so arbitrary file
    # arrival order cannot drop true pairs — eviction under tight
    # watermarks is the x10-tier run's concern, equality is this one's.
    q = (
        stream_join(
            s_stream,
            i_stream,
            "s_lo",
            "s_hi",
            "win_lo",
            "win_hi",
            max_left_span="7 days",
            max_right_span="10 minutes",
            bucket_seconds=600,
            watermark="35 days",
        )
        .writeStream.format("memory")
        .queryName("ovl_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not drain in 180s"
    got = spark.sql("select * from ovl_pairs")

    expected = batch_join(
        sess, inc, "s_lo", "s_hi", "win_lo", "win_hi", bucket_seconds=600
    ).toPandas()
    key = ["incident_id", "s_user", "s_lo"]
    got_pd = got.toPandas()
    pd.testing.assert_frame_equal(
        got_pd.sort_values(key).reset_index(drop=True)[expected.columns],
        expected.sort_values(key).reset_index(drop=True),
    )

    # the docstring's other contract: the SAME streaming call on BATCH
    # frames degrades to exactly the batch twin's pairs (watermark and
    # eviction bounds inert, span guard still live)
    batch_mode = stream_join(
        sess,
        inc,
        "s_lo",
        "s_hi",
        "win_lo",
        "win_hi",
        max_left_span="7 days",
        max_right_span="10 minutes",
        bucket_seconds=600,
        watermark="35 days",
    ).toPandas()
    pd.testing.assert_frame_equal(
        batch_mode.sort_values(key).reset_index(drop=True)[expected.columns],
        expected.sort_values(key).reset_index(drop=True),
    )

    # aggregated, the streamed pairs ARE the oracle-certified query output
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    agg = (
        got.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("s_user").cast("long").alias("n_users"),
            F.sum(
                (
                    us(F.least(F.col("s_hi"), F.col("win_hi")))
                    - us(F.greatest(F.col("s_lo"), F.col("win_lo")))
                ).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("overlap_us"),
        )
        .toPandas()
    )
    want = session_incident_overlap(spark, sf).toPandas()
    pd.testing.assert_frame_equal(
        agg.sort_values("incident_id").reset_index(drop=True)[want.columns],
        want.sort_values("incident_id").reset_index(drop=True),
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_property_vs_merge_asof(spark, direction, strict):
    """Randomized equivalence with pandas merge_asof over every
    direction x tie-rule combination (allow_exact_matches == not strict)."""
    # explicit per-combination seeds: hash() is salted per process and would
    # make a failing dataset unreproducible
    seed = {"backward": 101, "forward": 202}[direction] + int(strict)
    rng = np.random.default_rng(seed)
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 300),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 2_000, 300), unit="s"),
        }
    ).drop_duplicates(["k", "ts"])
    rp = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 120),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 2_000, 120), unit="s"),
            "v": rng.uniform(0, 1, 120).round(6),
        }
    ).drop_duplicates(["k", "ts"])
    expected = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts"),
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=not strict,
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    out = (
        timeseries.asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            on=["k"],
            direction=direction,
            strict=strict,
        )
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(out["v"], expected["v"], check_names=False)


def test_clip_outliers_bounds_and_flags(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 100,
            "value": list(range(1, 100)) + [10_000.0],  # one extreme outlier
        }
    )
    out = timeseries.clip_outliers(
        spark.createDataFrame(pdf), ["g"], "value", lower_q=0.05, upper_q=0.95
    ).toPandas()
    assert out["clipped"].sum() > 0
    assert out["value_clipped"].max() < 10_000.0
    lo = np.quantile(pdf["value"], 0.05)
    hi = np.quantile(pdf["value"], 0.95)
    np.testing.assert_allclose(out["value_clipped"].min(), round(lo, 6), atol=1e-6)
    np.testing.assert_allclose(out["value_clipped"].max(), round(hi, 6), atol=1e-6)
    # non-outliers pass through untouched
    inner = out[~out["clipped"]]
    np.testing.assert_allclose(inner["value_clipped"], inner["value"].round(6))


def test_clip_outliers_null_group_keys_survive(spark):
    """NULL group keys form their own percentile group and must come back
    through the (null-safe) bounds join — an equi-join would silently drop
    them from the output."""
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 50 + [None] * 50,
            "value": [float(i) for i in range(50)] + [float(100 + i) for i in range(50)],
        }
    )
    out = timeseries.clip_outliers(
        spark.createDataFrame(pdf), ["g"], "value", lower_q=0.05, upper_q=0.95
    ).toPandas()
    assert len(out) == 100  # no row vanished
    null_rows = out[out["g"].isna()]
    assert len(null_rows) == 50
    # NULL group clipped against ITS OWN bounds (values 100..149), not "a"'s
    lo = np.quantile(pdf["value"][50:], 0.05)
    hi = np.quantile(pdf["value"][50:], 0.95)
    np.testing.assert_allclose(null_rows["value_clipped"].min(), round(lo, 6), atol=1e-6)
    np.testing.assert_allclose(null_rows["value_clipped"].max(), round(hi, 6), atol=1e-6)


def test_asof_null_keys_never_match(spark):
    """pandas merge_asof / DuckDB ASOF JOIN semantics: NULL keys don't
    join.  NULL-key left rows emit unmatched; NULL-key right rows are
    invisible even to NULL-key left rows in the same window partition."""
    left = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T12:00:00"), "null-left"),
            (1, _ts("2024-01-01T12:00:00"), "matched"),
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T10:00:00"), 99.0),  # must never propagate
            (1, _ts("2024-01-01T10:00:00"), 10.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    out = timeseries.asof_join(left, right, on=["user_id"]).toPandas()
    by_tag = out.set_index("tag")
    assert len(out) == 2
    assert pd.isna(by_tag.loc["null-left", "price"])
    assert by_tag.loc["matched", "price"] == 10.0
    inner = timeseries.asof_join(
        left, right, on=["user_id"], how="inner"
    ).toPandas()
    assert inner["tag"].tolist() == ["matched"]


def test_gap_fill_preserves_off_grid_observations(spark):
    """Observations not on the lo + k*month grid must survive as anchors
    (an earlier formulation's grid-only left join silently dropped them)."""
    pdf = pd.DataFrame(
        {
            "series_id": ["s"] * 2,
            "ts": pd.to_datetime(["2020-01-15", "2020-03-01"]),
            "value": [100.0, 300.0],
        }
    )
    out = (
        timeseries.gap_fill(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    obs = out[~out.interpolated]
    assert len(obs) == 2  # both observations present
    assert set(pd.to_datetime(obs["ts"])) == set(pd.to_datetime(pdf["ts"]))
    np.testing.assert_allclose(sorted(obs["value"]), [100.0, 300.0])
    # the grid point between them interpolates toward the real 03-01 anchor
    mid = out[out.interpolated]
    assert (mid["value"] > 100.0).all() and (mid["value"] < 300.0).all()


def test_gap_fill_matches_pandas_interpolate(spark):
    """Randomized on-grid series with holes: gap_fill must equal pandas
    resample+interpolate('linear') (equal month spacing makes index-linear
    and month-weighted interpolation coincide)."""
    rng = np.random.default_rng(17)
    idx = pd.date_range("2019-01-01", periods=40, freq="MS")
    full = pd.Series(rng.uniform(50, 150, 40).round(6), index=idx)
    keep = np.sort(
        np.concatenate([[0, 39], rng.choice(np.arange(1, 39), 20, replace=False)])
    )
    sparse = full.iloc[keep]
    pdf = pd.DataFrame(
        {"series_id": "s", "ts": sparse.index, "value": sparse.to_numpy()}
    )
    out = (
        timeseries.gap_fill(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    expected = sparse.resample("MS").interpolate("linear")
    assert len(out) == 40
    np.testing.assert_allclose(out["value"], expected.round(6), atol=1e-6)
    assert (~out["interpolated"]).sum() == len(sparse)


def test_timeseries_ops_handle_empty_inputs(spark):
    """Empty frames flow through the time-series relational operators
    without crashing and preserve output schemas."""
    from tsdisagg_spark.operators import timeseries

    empty = spark.createDataFrame(
        [], "series_id string, ts timestamp, y double"
    )
    right = spark.createDataFrame(
        [], "series_id string, ts timestamp, v double"
    )
    out = timeseries.asof_join(empty, right, on=["series_id"])
    assert out.count() == 0
    assert timeseries.rolling_stats(
        empty, ["series_id"], "ts", "y", n=3
    ).count() == 0
    assert timeseries.gap_fill(
        empty, "series_id", "ts", "y"
    ).count() == 0


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    """Stream-static broadcast enrichment produces exactly the batch
    twin's rows after the availableNow trigger drains the source, keeps
    dimensionless events alive (left join contract), and needs no
    watermark because the join is stateless."""
    from tsdisagg_spark.streaming.joins import enrich

    src = str(tmp_path / "enrich_src")
    rng = np.random.default_rng(9)
    events = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 3600, 200), unit="s"),
            "user_id": rng.integers(0, 12, 200),  # ids 10,11 miss the dim
            "value": rng.uniform(0, 10, 200).round(6),
        }
    )
    spark.createDataFrame(events).write.parquet(src)
    dim = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": range(10), "tier": [f"t{i % 3}" for i in range(10)]}
        )
    )
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)

    q = (
        enrich(stream, dim, on="user_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not drain in 120s"
    got = spark.sql("select * from enriched").toPandas()

    expected = enrich(static, dim, on="user_id").toPandas()
    key = ["user_id", "ts", "value"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[expected.columns],
        expected.sort_values(key).reset_index(drop=True),
    )
    # dimensionless events survive with null tier
    assert got[got.user_id >= 10].tier.isna().all()
    assert len(got[got.user_id >= 10]) > 0


def test_ewma_matches_pandas_ewm(spark):
    """ewma_series == pandas ewm(alpha=..., adjust=False) per series, in
    order, including the s_0 = x_0 seed."""
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "series_id": np.repeat(["a", "b", "c"], 40),
            "ts": np.tile(
                pd.date_range("2020-01-31", periods=40, freq="ME"), 3
            ),
            "value": rng.uniform(-100, 100, 120).round(4),
        }
    )
    got = (
        timeseries.ewma_series(
            spark.createDataFrame(pdf),
            ["series_id"],
            ord_col="ts",
            value_col="value",
            alpha=0.3,
            round_to=9,
        )
        .toPandas()
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    exp = (
        pdf.assign(
            ewma=pdf.groupby("series_id")["value"].transform(
                lambda s: s.ewm(alpha=0.3, adjust=False).mean()
            )
        )
        .sort_values(["series_id", "ts"])
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got["ewma"], exp["ewma"], rtol=0, atol=5e-10)
    assert list(got.columns) == ["series_id", "ts", "ewma"]


def test_ewma_single_row_series_and_unrounded(spark):
    pdf = pd.DataFrame(
        {
            "series_id": ["solo", "duo", "duo"],
            "ts": pd.to_datetime(["2020-01-01", "2020-01-01", "2020-02-01"]),
            "value": [42.0, 1.0, 3.0],
        }
    )
    got = {
        (r["series_id"], r["ts"].isoformat()): r["ewma"]
        for r in timeseries.ewma_series(
            spark.createDataFrame(pdf),
            ["series_id"],
            ord_col="ts",
            value_col="value",
            alpha=0.5,
            round_to=None,
        ).collect()
    }
    # seed is the first observation itself; 0.5*3 + 0.5*1 = 2 exactly
    assert got[("solo", "2020-01-01T00:00:00")] == 42.0
    assert got[("duo", "2020-01-01T00:00:00")] == 1.0
    assert got[("duo", "2020-02-01T00:00:00")] == 2.0


def test_interval_overlap_join_exactly_once_across_restarts(spark, tmp_path):
    """Exactly-once across RESTARTS: two availableNow invocations of the
    streaming overlap join share one checkpoint while the sources grow
    in between — the parquet sink must end holding every cross-run pair
    exactly once (pairs between run-2 arrivals and run-1 state included,
    nothing duplicated on resume).  This is the recovery contract an
    unbounded blast-radius pipeline actually relies on."""
    import datetime as dt

    from pyspark.sql import functions as F

    from tsdisagg_spark.operators.joins import (
        interval_overlap_join as batch_join,
    )
    from tsdisagg_spark.streaming.joins import (
        interval_overlap_join as stream_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    sess_rows = [(i, t0 + 7 * i * m, t0 + (7 * i + 10) * m) for i in range(40)]
    inc_rows = [(100 + i, t0 + 11 * i * m, t0 + (11 * i + 6) * m) for i in range(25)]
    sess = spark.createDataFrame(
        sess_rows, "sid long, s_lo timestamp, s_hi timestamp"
    )
    inc = spark.createDataFrame(
        inc_rows, "iid long, w_lo timestamp, w_hi timestamp"
    )
    sess_src, inc_src = str(tmp_path / "s"), str(tmp_path / "i")
    sink_dir, ckpt = str(tmp_path / "pairs"), str(tmp_path / "ckpt")

    def run_once():
        s_stream = (
            spark.readStream.schema(sess.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(sess_src)
        )
        i_stream = (
            spark.readStream.schema(inc.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(inc_src)
        )
        q = (
            stream_join(
                s_stream, i_stream, "s_lo", "s_hi", "w_lo", "w_hi",
                max_left_span="15 minutes", max_right_span="10 minutes",
                bucket_seconds=600, watermark="10 hours",
            )
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    # run 1: first half of each side
    sess.filter(F.col("sid") < 20).coalesce(1).write.mode("append").parquet(sess_src)
    inc.filter(F.col("iid") < 112).coalesce(1).write.mode("append").parquet(inc_src)
    run_once()
    # the sources grow while the query is DOWN; run 2 resumes the ckpt
    sess.filter(F.col("sid") >= 20).coalesce(1).write.mode("append").parquet(sess_src)
    inc.filter(F.col("iid") >= 112).coalesce(1).write.mode("append").parquet(inc_src)
    run_once()

    got = (
        spark.read.parquet(sink_dir)
        .select("sid", "iid")
        .toPandas()
        .itertuples(index=False)
    )
    got = sorted(tuple(r) for r in got)
    want = sorted(
        (r["sid"], r["iid"])
        for r in batch_join(
            sess, inc, "s_lo", "s_hi", "w_lo", "w_hi", bucket_seconds=600
        ).collect()
    )
    assert got == want and len(want) > 10  # cross-run pairs, no dupes
