"""Wave 102: exact rank-statistic AUC."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling


def _auc(spark, rows):
    df = spark.createDataFrame([Row(score=float(s), pos=p) for s, p in rows])
    return profiling.score_label_auc(df).collect()[0]


def test_auc_perfect_random_and_inverted(spark):
    perfect = _auc(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])
    assert perfect.auc == 1.0 and perfect.n_pos == 2 and perfect.n_neg == 2
    inverted = _auc(spark, [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)])
    assert inverted.auc == 0.0


def test_auc_midrank_ties(spark):
    # one positive tied with one negative at 0.5, plus a clean pair:
    # pairs: (p=.5 vs n=.5) counts 0.5; (p=.5 vs n=.1) counts 1;
    # (p=.9 vs n=.5) 1; (p=.9 vs n=.1) 1 -> AUC = 3.5/4
    got = _auc(spark, [(0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)])
    assert got.auc == round(3.5 / 4, 6)


def test_auc_undefined_on_single_class(spark):
    got = _auc(spark, [(0.9, 1), (0.8, 1)])
    assert got.auc is None and got.n_neg == 0


def test_pr_curve_known_operating_points(spark):
    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.1, 0)]
    df = spark.createDataFrame([Row(score=float(s), pos=p) for s, p in rows])
    out = {r.threshold: r for r in profiling.pr_curve(df).collect()}
    assert len(out) == 4
    t9 = out[0.9]
    assert (t9.tp, t9.fp, t9.fn) == (1, 0, 1)
    assert t9.precision == 1.0 and t9.recall == 0.5
    t7 = out[0.7]
    assert (t7.tp, t7.fp) == (2, 1)
    assert t7.precision == round(2 / 3, 6) and t7.recall == 1.0
    assert t7.f1 == round(4 / 5, 6)
    t1 = out[0.1]
    assert (t1.tp, t1.fp, t1.fn) == (2, 2, 0)
