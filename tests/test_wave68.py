"""Wave 68: LSH sensitivity curve and series correlation matrix."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import dedup, timeseries


def test_lsh_curve_matches_closed_form(spark):
    out = {r["s"]: r for r in dedup.lsh_sensitivity_curve(spark).collect()}
    assert len(out) == 19
    for s, row in out.items():
        pb = s**4
        expect = 1.0 - (1.0 - pb) ** 8
        assert abs(row["p_band"] - round(pb, 6)) < 1e-6
        assert abs(row["p_detect"] - round(expect, 6)) < 2e-6
    # the documented operating point: ~.5 crossover near j=0.55
    assert 0.3 < out[0.55]["p_detect"] < 0.7
    # monotone S-curve
    svals = sorted(out)
    pd = [out[s]["p_detect"] for s in svals]
    assert pd == sorted(pd)
    assert out[0.2]["p_detect"] < 0.05 and out[0.9]["p_detect"] > 0.99


def _mk(spark, series):
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for typ, daily in series.items():
        for d, n in enumerate(daily):
            for _ in range(n):
                rows.append(
                    Row(event_id=eid, ts=base + dt.timedelta(days=d), event_type=typ)
                )
                eid += 1
    return spark.createDataFrame(rows)


def test_corr_matrix_signs_and_symmetric_pairs(spark):
    up = [1, 2, 3, 4, 5, 6, 7, 8]
    down = [8, 7, 6, 5, 4, 3, 2, 1]
    up2 = [2, 4, 6, 8, 10, 12, 14, 16]
    df = _mk(spark, {"a": up, "b": down, "c": up2})
    out = {
        (r["type_a"], r["type_b"]): r["corr"]
        for r in timeseries.series_correlation_matrix(df).collect()
    }
    # each unordered pair exactly once, a < b
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert abs(out[("a", "c")] - 1.0) < 1e-6  # perfectly linear
    assert abs(out[("a", "b")] + 1.0) < 1e-6  # perfectly inverse
    assert abs(out[("b", "c")] + 1.0) < 1e-6


def test_corr_matrix_shared_span_only(spark):
    # 'late' starts 4 days in: correlation runs over the 4 shared days
    df = _mk(spark, {"a": [5, 6, 7, 8, 1, 2, 3, 4], "late": [0, 0, 0, 0, 2, 4, 6, 8]})
    # day counts of 0 mean NO rows that day -> those days don't exist
    rows = timeseries.series_correlation_matrix(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["type_a"], r["type_b"]) == ("a", "late")
    assert r["n_days"] == 4
    assert abs(r["corr"] - 1.0) < 1e-6  # 1,2,3,4 vs 2,4,6,8 on shared days


def test_corr_constant_series_excluded(spark):
    df = _mk(spark, {"a": [3, 3, 3, 3], "b": [1, 2, 3, 4]})
    # 'a' has zero variance -> pair filtered rather than NaN
    assert timeseries.series_correlation_matrix(df).count() == 0
