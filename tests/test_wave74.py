"""Wave 74: peak concurrency sweep and positional attribution."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea


def _ev(eid, ts, typ="view", uid=1, val=0.0):
    return Row(event_id=eid, user_id=uid, event_type=typ, ts=ts, value=val)


def test_peak_concurrency_counts_overlaps(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        _ev(1, base),                              # 12:00-12:30
        _ev(2, base + dt.timedelta(minutes=10)),   # 12:10-12:40 (2 live)
        _ev(3, base + dt.timedelta(minutes=20)),   # 12:20-12:50 (3 live)
        _ev(4, base + dt.timedelta(minutes=40)),   # 12:40-13:10 (after 1,2 end)
        _ev(5, base + dt.timedelta(hours=5)),      # isolated
    ]
    out = ea.peak_concurrency(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["day"] == "2024-01-01"
    assert r["n_started"] == 5
    assert r["peak_concurrent"] == 3


def test_peak_concurrency_back_to_back_no_double_count(spark):
    # session 2 starts exactly when session 1 ends: half-open [s, e)
    # means they never overlap — the -1 sorts before the +1
    base = dt.datetime(2024, 1, 2, 9, 0, 0)
    rows = [_ev(1, base), _ev(2, base + dt.timedelta(seconds=1800))]
    r = ea.peak_concurrency(spark.createDataFrame(rows)).collect()[0]
    assert r["peak_concurrent"] == 1


def test_peak_concurrency_midnight_split(spark):
    # session 23:50-00:20 contributes to BOTH days
    rows = [_ev(1, dt.datetime(2024, 1, 1, 23, 50, 0))]
    out = {r["day"]: r for r in ea.peak_concurrency(spark.createDataFrame(rows)).collect()}
    assert set(out) == {"2024-01-01", "2024-01-02"}
    assert out["2024-01-01"]["peak_concurrent"] == 1
    assert out["2024-01-02"]["peak_concurrent"] == 1


def test_positional_credit_split(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        # user 1: view, click, view, view -> purchase(100):
        # first view 40, last view 40, middles (click, view) share 20
        _ev(1, base, "view", 1),
        _ev(2, base + dt.timedelta(hours=1), "click", 1),
        _ev(3, base + dt.timedelta(hours=2), "view", 1),
        _ev(4, base + dt.timedelta(hours=3), "view", 1),
        _ev(5, base + dt.timedelta(hours=4), "purchase", 1, 100.0),
        # user 2: lone purchase -> direct
        _ev(6, base, "purchase", 2, 40.0),
        # user 3: single click -> 100% of 60
        _ev(7, base, "click", 3),
        _ev(8, base + dt.timedelta(hours=1), "purchase", 3, 60.0),
    ]
    out = {
        r["source"]: r
        for r in ea.positional_attribution(
            spark.createDataFrame(rows), ["view", "click"]
        ).collect()
    }
    # user1: views get 40 + 40 + 10 (middle view) = 90; click gets 10
    # user3: click gets 60
    assert out["view"]["credited_value"] == 90.0
    assert out["click"]["credited_value"] == 70.0
    assert out["direct"]["credited_value"] == 40.0
    assert out["view"]["n_touches"] == 3 and out["click"]["n_touches"] == 2
    # credits conserve total conversion value
    total = sum(r["credited_value"] for r in out.values())
    assert abs(total - 200.0) < 1e-9


def test_positional_stale_touches_go_direct(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        _ev(1, base, "view", 1),
        _ev(2, base + dt.timedelta(days=30), "purchase", 1, 50.0),
    ]
    out = {
        r["source"]: r
        for r in ea.positional_attribution(
            spark.createDataFrame(rows), ["view", "click"], max_age_days=7
        ).collect()
    }
    assert out["direct"]["credited_value"] == 50.0
    assert "view" not in out
