"""Wave-36: dedup pair recall, trend slopes, KS drift."""

import datetime as dt

from rss_feed_etl_spark.operators import dedup, timeseries


def test_blocking_quality_metrics(spark):
    cand = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "id_a long, id_b long")
    truth = spark.createDataFrame([(1, 2), (3, 4), (7, 8)], "id_a long, id_b long")
    r = dedup.blocking_quality(cand, truth, n_records=10).collect()[0]
    assert r["n_truth"] == 3 and r["n_found"] == 2 and r["n_candidates"] == 3
    assert round(r["pairs_completeness"], 6) == round(2 / 3, 6)
    assert r["reduction_ratio"] == round(1 - 3 / 45, 6)


def test_trend_slope_recovers_linear_growth(spark):
    rows = []
    base = dt.datetime(2024, 6, 1, 12)
    for d in range(10):
        # "up": d+1 events/day (slope 1); "flat": 3/day (slope 0)
        for i in range(d + 1):
            rows.append((len(rows), base + dt.timedelta(days=d, minutes=i), "up"))
        for i in range(3):
            rows.append((len(rows), base + dt.timedelta(days=d, minutes=i), "flat"))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["event_type"]: r["slope"] for r in timeseries.daily_trend_slope(ev).collect()}
    assert out["up"] == 1.0
    assert out["flat"] == 0.0


def test_ks_drift_detects_shift(spark):
    rows = []
    base = dt.datetime(2024, 6, 1)
    for i in range(100):  # before: values 0..99; after: values 50..149
        rows.append((i, base + dt.timedelta(minutes=i), "e", float(i)))
        rows.append((1000 + i, base + dt.timedelta(days=10, minutes=i), "e", float(i + 50)))
        # a stable group on both sides
        rows.append((2000 + i, base + dt.timedelta(minutes=i), "s", float(i % 10)))
        rows.append((3000 + i, base + dt.timedelta(days=10, minutes=i), "s", float(i % 10)))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {r["event_type"]: r for r in
           timeseries.ks_drift(ev, split_ts="2024-06-05 00:00:00").collect()}
    assert out["e"]["ks_stat"] == 0.5  # exactly half the mass shifted
    assert out["s"]["ks_stat"] == 0.0
    assert out["e"]["n_before"] == 100 and out["e"]["n_after"] == 100
