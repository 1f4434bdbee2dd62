"""Wave 141 goldens: t-closeness EMD and the KMV distinct sketch."""

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.profiling import t_closeness_report
from rss_feed_etl_spark.operators.sketches import kmv_distinct_estimate


def test_t_closeness_hand_computed(spark):
    # table sensitive distribution over sv {0,1}: 4 each (CDF .5, 1).
    # class A: all sv=0 (CDF 1, 1)  -> EMD = (|1-.5| + 0)/(2-1) = 0.5
    # class B: all sv=1 (CDF 0, 1)  -> EMD = (|0-.5| + 0)/1     = 0.5
    # class C: 2+2 balanced         -> EMD = 0
    rows = (
        [Row(g="A", sv=0)] * 2
        + [Row(g="B", sv=1)] * 2
        + [Row(g="C", sv=0)] * 2
        + [Row(g="C", sv=1)] * 2
    )
    out = {
        r["g"]: r
        for r in t_closeness_report(
            spark.createDataFrame(rows), ["g"], "sv", t=0.3
        ).collect()
    }
    assert out["A"]["emd"] == pytest.approx(0.5)
    assert out["B"]["emd"] == pytest.approx(0.5)
    assert out["C"]["emd"] == pytest.approx(0.0)
    assert out["A"]["exceeds_t"] and out["B"]["exceeds_t"]
    assert not out["C"]["exceeds_t"]
    assert out["C"]["group_size"] == 4


def test_t_closeness_ordered_distance_beats_tv(spark):
    # sv domain {0,1,2}, table uniform.  A class concentrated at 0 is
    # FARTHER (in EMD) than one concentrated at 1 — the ordered-domain
    # property total variation cannot see.
    rows = []
    for sv in (0, 1, 2):
        rows += [Row(g="bg", sv=sv)] * 10
    rows += [Row(g="at0", sv=0)] * 3 + [Row(g="at1", sv=1)] * 3
    out = {
        r["g"]: r["emd"]
        for r in t_closeness_report(
            spark.createDataFrame(rows), ["g"], "sv"
        ).collect()
    }
    assert out["at0"] > out["at1"]


def test_kmv_small_groups_exact_mode(spark):
    rows = [Row(g="a", k=i) for i in range(5)] + [Row(g="b", k=i) for i in range(3)]
    out = {
        r["scope"]: r
        for r in kmv_distinct_estimate(
            spark.createDataFrame(rows), "k", "g", k=12
        ).collect()
    }
    # below k distinct -> the sketch holds everything: estimate exact
    assert out["a"]["kmv_estimate"] == pytest.approx(5.0)
    assert out["a"]["rel_err"] == pytest.approx(0.0)
    assert out["b"]["kmv_estimate"] == pytest.approx(3.0)
    assert out["__union__"]["exact_distinct"] == 5  # same key space unions


def test_kmv_estimation_mode_reasonable(spark):
    rows = [Row(g="big", k=i) for i in range(500)]
    out = {
        r["scope"]: r
        for r in kmv_distinct_estimate(
            spark.createDataFrame(rows), "k", "g", k=12
        ).collect()
    }
    r = out["big"]
    assert r["exact_distinct"] == 500
    # KMV with k=12 is noisy but must land within ~3/sqrt(k-1) ~ 90%
    assert abs(r["rel_err"]) < 0.9
    # union of one group == the group
    assert out["__union__"]["kmv_estimate"] == r["kmv_estimate"]
