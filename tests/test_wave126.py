"""Wave 126: Mann-Whitney U and competing-risks CIF."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, timeseries


def test_mann_whitney_detects_shift(spark):
    rows = [Row(grp="a", v=float(10 + i)) for i in range(30)] + [
        Row(grp="b", v=float(30 + i)) for i in range(30)
    ]
    out = profiling.mann_whitney_u(spark.createDataFrame(rows)).collect()[0]
    assert out["n_a"] == out["n_b"] == 30
    assert out["z"] < -1.96  # a is stochastically smaller -> strongly negative


def test_mann_whitney_identical_distributions_near_zero(spark):
    rows = []
    for i in range(40):
        rows.append(Row(grp="a", v=float(i % 10)))
        rows.append(Row(grp="b", v=float(i % 10)))
    out = profiling.mann_whitney_u(spark.createDataFrame(rows)).collect()[0]
    # fully tied arms: U exactly at its null mean
    assert abs(out["z"]) < 1e-9
    assert out["u_a"] == 40 * 40 / 2


def test_mann_whitney_midranks_hand_checked(spark):
    # a: {1, 2}, b: {2, 3} -> ranks 1, 2.5, 2.5, 4; R_a = 3.5, U_a = 0.5
    rows = [
        Row(grp="a", v=1.0), Row(grp="a", v=2.0),
        Row(grp="b", v=2.0), Row(grp="b", v=3.0),
    ]
    out = profiling.mann_whitney_u(spark.createDataFrame(rows)).collect()[0]
    assert out["u_a"] == 0.5


def test_cif_sums_below_one_and_monotone(spark):
    rows = (
        [Row(dur=1, etype="a")] * 3
        + [Row(dur=2, etype="b")] * 2
        + [Row(dur=3, etype="a")]
        + [Row(dur=4, etype="censored")] * 4
    )
    out = timeseries.competing_risks_cif(spark.createDataFrame(rows)).collect()
    out = sorted(out, key=lambda r: r["dur"])
    assert [r["dur"] for r in out] == [1, 2, 3]  # censor-only times dropped
    # hand-check t=1: n=10, d_a=3 -> cif_a = 3/10
    assert abs(out[0]["cif_a"] - 0.3) < 1e-6
    assert out[0]["cif_b"] == 0.0
    # t=2: S(1)=0.7, d_b=2, n=7 -> cif_b = 0.7*2/7 = 0.2
    assert abs(out[1]["cif_b"] - 0.2) < 1e-6
    # monotone non-decreasing, total incidence <= 1
    for prev, cur in zip(out, out[1:]):
        assert cur["cif_a"] >= prev["cif_a"] - 1e-9
        assert cur["cif_b"] >= prev["cif_b"] - 1e-9
    last = out[-1]
    assert last["cif_a"] + last["cif_b"] <= 1.0 + 1e-9
    # all-cause survival equals 1 - total incidence when no censoring
    # happened before the last event time
    assert abs(last["surv"] - (1 - last["cif_a"] - last["cif_b"])) < 1e-6


def test_cif_everyone_fails_is_guarded(spark):
    rows = [Row(dur=1, etype="a")] * 5
    out = timeseries.competing_risks_cif(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert abs(out[0]["cif_a"] - 1.0) < 1e-6
    assert out[0]["surv"] < 1e-6  # clamped, not NaN
