"""Wave 127: BH FDR selection and Good-Turing mass."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, textstats


def test_bh_selects_signals_not_nulls(spark):
    # 5 strong signals among 100 spread-out nulls at alpha = 0.1
    rows = [Row(test_id=i, p=0.0001 * (i + 1)) for i in range(5)] + [
        Row(test_id=100 + i, p=0.2 + 0.008 * i) for i in range(100)
    ]
    out = profiling.bh_fdr_select(spark.createDataFrame(rows), alpha=0.1).collect()
    ids = {r["test_id"] for r in out}
    assert ids == {0, 1, 2, 3, 4}
    assert all(r["n_tests"] == 105 for r in out)
    assert all(r["k_selected"] == 5 for r in out)


def test_bh_steps_up_through_borderline(spark):
    # classic step-up behavior: p=(0.01, 0.02, 0.029) at alpha=0.1, m=3:
    # thresholds are (0.0333, 0.0667, 0.1) -> ALL selected even though
    # only the first clears its own per-rank bound most conservatively
    rows = [
        Row(test_id=1, p=0.01),
        Row(test_id=2, p=0.02),
        Row(test_id=3, p=0.029),
    ]
    out = profiling.bh_fdr_select(spark.createDataFrame(rows), alpha=0.1).collect()
    assert len(out) == 3


def test_bh_nothing_significant_empty(spark):
    rows = [Row(test_id=i, p=0.5 + 0.004 * i) for i in range(50)]
    out = profiling.bh_fdr_select(spark.createDataFrame(rows), alpha=0.05).collect()
    assert out == []


def test_good_turing_hand_checked(spark):
    # word types: a(3), b(2), c(2), d(1), e(1), f(1)
    df = spark.createDataFrame([Row(doc_id=1, text="a a a b b c c d e f")])
    out = {
        r["r"]: r
        for r in textstats.good_turing_mass(df, max_r=3, ngram=1).collect()
    }
    assert out[1]["n_r"] == 3 and out[2]["n_r"] == 2 and out[3]["n_r"] == 1
    # r*=1: (1+1)*N2/N1 = 2*2/3
    assert abs(out[1]["r_star"] - 4 / 3) < 1e-6
    # r*=2: 3*N3/N2 = 3*1/2
    assert abs(out[2]["r_star"] - 1.5) < 1e-6
    # unseen mass = N1 / N = 3/10
    assert abs(out[1]["unseen_mass"] - 0.3) < 1e-6


def test_good_turing_trigram_mode_counts_positions(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="x y z x y z"), Row(doc_id=2, text="x y z")]
    )
    # doc1 trigrams: xyz yzx zxy xyz ; doc2: xyz -> xyz count 3, others 1
    out = {
        r["r"]: r
        for r in textstats.good_turing_mass(df, max_r=3, ngram=3).collect()
    }
    assert out[1]["n_r"] == 2
    assert out[3]["n_r"] == 1
    assert abs(out[1]["unseen_mass"] - 2 / 5) < 1e-6
