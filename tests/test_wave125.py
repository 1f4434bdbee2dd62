"""Wave 125: IPW treatment effect and regression discontinuity."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics


def _confounded(spark):
    # two strata: A treats 25%, B treats 75%; B's base outcome is 100
    # higher.  True effect = +10 everywhere.
    rows = []
    for i in range(40):
        s = "A" if i < 20 else "B"
        base = 0.0 if s == "A" else 100.0
        rate = 1 if s == "A" else 3  # of 4
        t = 1 if (i % 4) < rate else 0
        rows.append(Row(stratum=s, treated=t, outcome=base + 10.0 * t))
    return spark.createDataFrame(rows)


def test_ipw_removes_stratum_confounding(spark):
    out = eventanalytics.ipw_treatment_effect(_confounded(spark)).collect()[0]
    assert out["n_units"] == 40
    assert out["n_excluded_strata"] == 0
    # treated units concentrate in the high-outcome stratum: naive >> 10
    assert out["naive_diff"] > 40.0
    assert abs(out["ipw_ate"] - 10.0) < 1e-3


def test_ipw_excludes_positivity_violations(spark):
    rows = (
        [Row(stratum="ok", treated=i % 2, outcome=5.0 + 2.0 * (i % 2))
         for i in range(10)]
        + [Row(stratum="all_treated", treated=1, outcome=999.0)] * 5
        + [Row(stratum="none_treated", treated=0, outcome=-999.0)] * 5
    )
    out = eventanalytics.ipw_treatment_effect(
        spark.createDataFrame(rows)
    ).collect()[0]
    assert out["n_excluded_strata"] == 2
    assert out["n_units"] == 10  # only the 'ok' stratum survives
    assert abs(out["ipw_ate"] - 2.0) < 1e-3


def _rd_data(spark, jump=50.0):
    rows = []
    for i in range(400):
        x = i / 4.0  # running variable 0..100
        y = 3.0 * x + (jump if x >= 50.0 else 0.0)
        rows.append(Row(running=x, outcome=y))
    return spark.createDataFrame(rows)


def test_rd_recovers_jump_with_slope(spark):
    out = eventanalytics.regression_discontinuity(
        _rd_data(spark), cutoff=50.0, bandwidth=20.0
    ).collect()[0]
    # a naive mean-difference over [30,70) would report jump + slope*20
    # = 50 + 60; the local-linear form must isolate the jump
    assert abs(out["rd_estimate"] - 50.0) < 1e-3
    assert abs(out["left_pred"] - 150.0) < 1e-3
    assert abs(out["right_pred"] - 200.0) < 1e-3
    assert out["n_left"] == 80
    assert out["n_right"] == 80


def test_rd_no_jump_reports_zero(spark):
    out = eventanalytics.regression_discontinuity(
        _rd_data(spark, jump=0.0), cutoff=50.0, bandwidth=20.0
    ).collect()[0]
    assert abs(out["rd_estimate"]) < 1e-3
