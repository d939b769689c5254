"""Distributed disaggregation parity: the Spark grouped-kernel path must
reproduce the (golden-tested) single-series pandas API per series."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsdisagg_spark import disaggregate_series
from tsdisagg_spark.spark.disagg import disaggregate, fit_reports

DATA = "/root/reference/tests/data"


@pytest.fixture(scope="module")
def multi_series(spark):
    """Five synthetic series derived from the sales/exports fixtures by
    deterministic scaling, in long format."""
    sales = pd.read_csv(f"{DATA}/sales_a.csv", index_col=0)
    sales.index = pd.date_range("1975-01-01", freq="YS", periods=len(sales))
    sales.columns = ["y"]
    exports = pd.read_csv(f"{DATA}/exports_q.csv", index_col=0)
    exports.index = pd.date_range("1972-01-01", freq="QS-OCT", periods=len(exports))
    exports.columns = ["x1"]

    low_rows, ind_rows, locals_ = [], [], {}
    for i in range(5):
        scale = 1.0 + 0.25 * i
        sid = f"s{i}"
        low_i = sales["y"] * scale
        ind_i = exports["x1"] * (1.0 + 0.1 * i)
        locals_[sid] = (low_i, ind_i)
        low_rows.append(
            pd.DataFrame({"series_id": sid, "ts": low_i.index, "y": low_i.to_numpy()})
        )
        ind_rows.append(
            pd.DataFrame(
                {
                    "series_id": sid,
                    "ts": ind_i.index,
                    "x1": ind_i.to_numpy(),
                    "intercept": 1.0,
                }
            )
        )

    low_sdf = spark.createDataFrame(pd.concat(low_rows, ignore_index=True))
    ind_sdf = spark.createDataFrame(pd.concat(ind_rows, ignore_index=True))
    return low_sdf, ind_sdf, locals_


def _collect_by_series(sdf):
    pdf = sdf.toPandas()
    return {
        sid: grp.sort_values("ts").set_index("ts")["y_hat"]
        for sid, grp in pdf.groupby("series_id")
    }


def test_spark_matches_pandas_chow_lin(multi_series):
    low_sdf, ind_sdf, locals_ = multi_series
    got = _collect_by_series(
        disaggregate(low_sdf, ind_sdf, method="chow-lin", agg_func="sum")
    )
    assert set(got) == set(locals_)
    for sid, (low_i, ind_i) in locals_.items():
        expected = disaggregate_series(
            low_i.to_frame(),
            ind_i.to_frame().assign(intercept=1.0),
            method="chow-lin",
            agg_func="sum",
            verbose=False,
        )
        np.testing.assert_allclose(
            got[sid].to_numpy(), expected.to_numpy(), rtol=1e-10
        )


def test_spark_companion_path_denton(multi_series, spark):
    low_sdf, _ind, locals_ = multi_series
    got = _collect_by_series(
        disaggregate(low_sdf, method="denton", agg_func="sum", target_freq="QS")
    )
    for sid, (low_i, _unused) in locals_.items():
        expected = disaggregate_series(
            low_i.to_frame(), method="denton", agg_func="sum", target_freq="QS"
        )
        np.testing.assert_allclose(
            got[sid].to_numpy(), expected.to_numpy(), rtol=1e-10
        )
        # aggregation constraint holds through the distributed path
        yearly = got[sid].groupby(got[sid].index.year).sum()
        np.testing.assert_allclose(
            yearly.loc[1975:2010].to_numpy(), low_i.to_numpy(), rtol=1e-8
        )


def test_spark_errors_skip(multi_series, spark):
    low_sdf, ind_sdf, _ = multi_series
    # poison one series: drop most of its rows so frequency inference fails
    poisoned = low_sdf.filter(
        ~((F.col("series_id") == "s0") & (F.year("ts") % 2 == 0))
    )
    out = disaggregate(poisoned, ind_sdf, method="chow-lin", agg_func="sum",
                       errors="skip")
    sids = {r["series_id"] for r in out.select("series_id").distinct().collect()}
    assert sids == {"s1", "s2", "s3", "s4"}

    with pytest.raises(Exception, match="series"):
        disaggregate(poisoned, ind_sdf, method="chow-lin", errors="raise").count()


def test_fit_reports(multi_series):
    low_sdf, ind_sdf, _ = multi_series
    rep = fit_reports(low_sdf, ind_sdf, method="chow-lin", agg_func="sum").toPandas()
    # 5 series x 2 indicator columns
    assert len(rep) == 10
    assert set(rep["variable"]) == {"x1", "intercept"}
    assert (rep["sd_err"] > 0).all()
    assert rep["rho"].between(0, 1).all()


def test_single_shuffle_plan(multi_series):
    """The distributed plan must contain exactly one exchange: the hash
    partition by series_id feeding the grouped kernel."""
    low_sdf, ind_sdf, _ = multi_series
    plan = (
        disaggregate(low_sdf, ind_sdf, method="denton-cholette")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
