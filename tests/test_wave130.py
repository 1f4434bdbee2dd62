"""Wave 130: in-engine logistic fit and UCB1 ranking."""

from __future__ import annotations

import math

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics, profiling


def _logit_data(spark, a=0.5, b=2.0, n=400):
    rows = []
    for i in range(n):
        x = -3.0 + 6.0 * i / (n - 1)
        p = 1.0 / (1.0 + math.exp(-(a + b * x)))
        # deterministic thresholding: label 1 where the model's CDF
        # crosses a stratified grid -> empirical rates track p closely
        y = 1 if ((i * 37) % 100) / 100.0 < p else 0
        rows.append(Row(x=x, y=y))
    return spark.createDataFrame(rows)


def test_logistic_recovers_direction_and_sign(spark):
    out = profiling.logistic_1d_fit(_logit_data(spark), iters=2).collect()[0]
    assert out["n"] == 400
    # two Newton steps: signs and rough magnitudes must be right
    assert 0.0 < out["a"] < 1.5
    assert 1.0 < out["b"] < 3.0
    # better than the null model's ln 2
    assert out["mean_nll"] < 0.6


def test_logistic_more_iters_never_worse(spark):
    d = _logit_data(spark)
    one = profiling.logistic_1d_fit(d, iters=1).collect()[0]
    three = profiling.logistic_1d_fit(d, iters=3).collect()[0]
    assert three["mean_nll"] <= one["mean_nll"] + 1e-9


def test_logistic_flat_labels_keep_slope_near_zero(spark):
    rows = [Row(x=float(i % 7 - 3), y=i % 2) for i in range(100)]
    out = profiling.logistic_1d_fit(spark.createDataFrame(rows)).collect()[0]
    assert abs(out["b"]) < 0.2
    assert abs(out["mean_nll"] - math.log(2)) < 0.01


def test_ucb1_exploration_bonus_orders_arms(spark):
    # arm A: 100 pulls, mean 0.5; arm B: 2 pulls, mean 0.5 -> B's bonus
    # must rank it first; arm C: 100 pulls, mean 0.9 beats both means
    rows = (
        [Row(item=1, reward=float(i % 2)) for i in range(100)]
        + [Row(item=2, reward=float(i % 2)) for i in range(2)]
        + [Row(item=3, reward=1.0 if i % 10 else 0.0) for i in range(100)]
    )
    out = {r["item"]: r for r in eventanalytics.ucb1_ranking(
        spark.createDataFrame(rows)).collect()}
    assert out[2]["ucb"] > out[1]["ucb"]  # same mean, fewer pulls -> bigger bonus
    assert out[3]["mean_reward"] == 0.9
    # order: the under-explored arm outranks the exploited 0.5 arm
    order = sorted(out, key=lambda k: (-out[k]["ucb"], k))
    assert order.index(2) < order.index(1)
