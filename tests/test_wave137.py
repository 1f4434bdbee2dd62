"""Wave 137 goldens: McNemar's paired test and the disparate-impact
filter audit, hand-computed on tiny frames."""

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.profiling import (
    filter_disparate_impact,
    mcnemar_test,
)


def _pairs(spark, both, only_a, only_b, neither):
    rows = (
        [Row(a_correct=True, b_correct=True)] * both
        + [Row(a_correct=True, b_correct=False)] * only_a
        + [Row(a_correct=False, b_correct=True)] * only_b
        + [Row(a_correct=False, b_correct=False)] * neither
    )
    return spark.createDataFrame(rows)


def test_mcnemar_hand_computed(spark):
    # b=12 only-A, c=3 only-B: chi2 = (|12-3|-1)^2 / 15 = 64/15 ~ 4.267
    r = mcnemar_test(_pairs(spark, 50, 12, 3, 5)).collect()[0]
    assert (r["n_both_right"], r["n_only_a"], r["n_only_b"], r["n_both_wrong"]) == (
        50, 12, 3, 5,
    )
    assert r["mcnemar_chi2"] == pytest.approx(64 / 15, abs=1e-6)
    assert bool(r["significant"]) is True  # 4.267 > 3.841


def test_mcnemar_insignificant_and_degenerate(spark):
    # b=5, c=4: chi2 = 0/9 = 0 -> not significant
    r = mcnemar_test(_pairs(spark, 10, 5, 4, 1)).collect()[0]
    assert r["mcnemar_chi2"] == pytest.approx(0.0)
    assert bool(r["significant"]) is False
    # no discordant pairs: statistic undefined
    r0 = mcnemar_test(_pairs(spark, 10, 0, 0, 2)).collect()[0]
    assert r0["mcnemar_chi2"] is None and r0["significant"] is None


def test_disparate_impact_hand_computed(spark):
    # group a: 8/10 kept (rate .8); group b: 4/10 kept (rate .4)
    # impact ratio b = .4/.8 = .5 < .8 -> flagged
    rows = []
    for i in range(10):
        rows.append(Row(source="a", kept=i < 8, good=i < 7))
        rows.append(Row(source="b", kept=i < 4, good=i < 7))
    out = {r["source"]: r for r in filter_disparate_impact(spark.createDataFrame(rows)).collect()}
    assert out["a"]["sel_rate"] == pytest.approx(0.8)
    assert out["a"]["impact_ratio"] == pytest.approx(1.0)
    assert not out["a"]["four_fifths_flag"]
    assert out["b"]["sel_rate"] == pytest.approx(0.4)
    assert out["b"]["impact_ratio"] == pytest.approx(0.5)
    assert out["b"]["four_fifths_flag"]
    # group a: truth 7 good / 3 bad; kept = first 8 -> tp=7, fp=1, fn=0, tn=2
    assert out["a"]["tpr"] == pytest.approx(1.0)
    assert out["a"]["fpr"] == pytest.approx(1 / 3, abs=1e-6)
    # group b: kept = first 4 (all good) -> tpr 4/7, fpr 0
    assert out["b"]["tpr"] == pytest.approx(4 / 7, abs=1e-6)
    assert out["b"]["fpr"] == pytest.approx(0.0)


def test_disparate_impact_single_group_ratio_one(spark):
    rows = [Row(source="only", kept=i % 2 == 0, good=True) for i in range(10)]
    r = filter_disparate_impact(spark.createDataFrame(rows)).collect()[0]
    assert r["impact_ratio"] == pytest.approx(1.0)
    assert not r["four_fifths_flag"]
