"""Wave 131: risk-coverage curve and Gini mean difference."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling


def test_risk_coverage_monotone_for_calibrated_scorer(spark):
    # confidence perfectly ranks correctness: top half always right,
    # bottom half mostly wrong -> risk rises with coverage
    rows = []
    for i in range(100):
        conf = 1.0 - i / 100.0
        rows.append(Row(confidence=conf, correct=i < 50 or i % 3 == 0))
    out = sorted(
        profiling.risk_coverage_curve(spark.createDataFrame(rows)).collect(),
        key=lambda r: r["coverage"],
    )
    assert len(out) == 10
    assert out[0]["selective_risk"] == 0.0  # top decile is clean
    risks = [r["selective_risk"] for r in out]
    assert risks == sorted(risks)  # monotone non-decreasing
    assert out[-1]["coverage"] == 1.0
    assert out[-1]["n_served"] == 100


def test_risk_coverage_counts_accumulate(spark):
    rows = [Row(confidence=float(i), correct=bool(i % 2)) for i in range(40)]
    out = sorted(
        profiling.risk_coverage_curve(spark.createDataFrame(rows)).collect(),
        key=lambda r: r["coverage"],
    )
    served = [r["n_served"] for r in out]
    assert served == sorted(served)
    assert served[-1] == 40
    errs = [r["n_errors"] for r in out]
    assert errs[-1] == 20


def test_gmd_hand_checked(spark):
    # values {0, 10}: pairs |0-10| only; n=4 (2 each):
    # pairsum over i<j = 2*2*10 = 40; gmd = 2*40/(4*3) = 20/3
    rows = [Row(grp="a", v=0.0), Row(grp="a", v=0.0),
            Row(grp="a", v=10.0), Row(grp="a", v=10.0)]
    out = profiling.gini_mean_difference(spark.createDataFrame(rows)).collect()[0]
    assert out["n"] == 4
    assert abs(out["gmd"] - 20 / 3) < 1e-6
    assert abs(out["mean"] - 5.0) < 1e-6
    assert abs(out["relative_gmd"] - (20 / 3) / 5.0) < 1e-6


def test_gmd_robust_vs_variance_on_heavy_tail(spark):
    import statistics

    base = [float(v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
    whale = base[:-1] + [1000.0]
    rows = [Row(grp="base", v=v) for v in base] + [
        Row(grp="whale", v=v) for v in whale
    ]
    out = {
        r["grp"]: r
        for r in profiling.gini_mean_difference(
            spark.createDataFrame(rows)
        ).collect()
    }
    var_ratio = statistics.pvariance(whale) / statistics.pvariance(base)
    gmd_ratio = out["whale"]["gmd"] / out["base"]["gmd"]
    # the whale inflates variance ~quadratically, GMD only linearly
    assert gmd_ratio < var_ratio / 100
    assert out["whale"]["gmd"] > out["base"]["gmd"]
