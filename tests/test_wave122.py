"""Wave 122: exact Shapley attribution and Brier decomposition."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics, profiling


def _journeys(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ev(u, i, typ):
        return Row(
            event_id=u * 100 + i, user_id=u,
            ts=t0 + dt.timedelta(minutes=i), event_type=typ, value=1.0,
        )

    rows = []
    # 3 users convert after {click}; 1 after {click, view}; 1 after {view}
    for u in (1, 2, 3):
        rows += [ev(u, 0, "click"), ev(u, 1, "purchase")]
    rows += [ev(4, 0, "click"), ev(4, 1, "view"), ev(4, 2, "purchase")]
    rows += [ev(5, 0, "view"), ev(5, 1, "purchase")]
    # a user who never converts: must not contribute
    rows += [ev(6, 0, "click"), ev(6, 1, "view")]
    # post-purchase events must not count as channels
    rows += [ev(7, 0, "click"), ev(7, 1, "purchase"), ev(7, 2, "view")]
    return spark.createDataFrame(rows)


def test_shapley_efficiency_and_order(spark):
    out = {
        r["channel"]: r
        for r in eventanalytics.shapley_attribution(
            _journeys(spark), channels=("click", "view")
        ).collect()
    }
    assert set(out) == {"click", "view"}
    total = sum(r["shapley_credit"] for r in out.values())
    n_conv = next(iter(out.values()))["n_conversions"]
    assert n_conv == 6  # users 1,2,3,4,5,7
    # efficiency: credits sum to v(full set) = all conversions
    assert abs(total - 6.0) < 1e-6
    # click appears in 5 journeys, view in 2 -> click must earn more
    assert out["click"]["shapley_credit"] > out["view"]["shapley_credit"]


def test_shapley_hand_computed_values(spark):
    out = {
        r["channel"]: r["shapley_credit"]
        for r in eventanalytics.shapley_attribution(
            _journeys(spark), channels=("click", "view")
        ).collect()
    }
    # v({}) = 0, v({c}) = 5 (sets {c}x4 ... users 1,2,3,7 plus none),
    # exact: cnt({c})=4, cnt({v})=1, cnt({c,v})=1
    # v({c})=4, v({v})=1, v({c,v})=6
    # shapley(c) = 1/2*(v(c)-v(0)) + 1/2*(v(cv)-v(v)) = (4 + 5)/2 = 4.5
    # shapley(v) = 1/2*(v(v)-v(0)) + 1/2*(v(cv)-v(c)) = (1 + 2)/2 = 1.5
    assert abs(out["click"] - 4.5) < 1e-6
    assert abs(out["view"] - 1.5) < 1e-6


def test_brier_decomposition_perfect_and_base_rate(spark):
    # perfect confident forecast: brier ~ 0, reliability ~ 0
    rows = [Row(score=0.95, label=1)] * 6 + [Row(score=0.05, label=0)] * 4
    out = profiling.brier_decomposition(spark.createDataFrame(rows)).collect()[0]
    assert out["n"] == 10
    assert out["brier"] < 0.01
    assert out["reliability"] < 0.01
    assert abs(out["uncertainty"] - 0.6 * 0.4) < 1e-6
    # near-perfect separation: resolution approaches uncertainty
    assert abs(out["resolution"] - out["uncertainty"]) < 0.01


def test_brier_decomposition_uninformative_forecast(spark):
    # constant 0.5 on a 50/50 outcome: resolution 0, reliability 0,
    # brier = 0.25 = uncertainty
    rows = [Row(score=0.5, label=i % 2) for i in range(20)]
    out = profiling.brier_decomposition(spark.createDataFrame(rows)).collect()[0]
    assert out["resolution"] == 0.0
    assert out["reliability"] == 0.0
    assert abs(out["brier"] - 0.25) < 1e-6
    assert abs(out["uncertainty"] - 0.25) < 1e-6
