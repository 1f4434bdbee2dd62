"""Wave 84: SLO burn rate and user hour divergence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea
from rss_feed_etl_spark.operators import timeseries


def test_burn_rate_requires_both_windows(spark):
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # 12 healthy hours (0% errors), then ONE bad hour (50%), then healthy:
    # short window breaches but the 6h window absorbs it -> no alert.
    # Then 6 consecutive bad hours -> both windows breach -> alert.
    for h in range(12):
        for i in range(10):
            rows.append(Row(event_id=eid, event_type="view",
                            ts=base + dt.timedelta(hours=h, minutes=i))); eid += 1
    # isolated bad hour 12
    for i in range(5):
        rows.append(Row(event_id=eid, event_type="error",
                        ts=base + dt.timedelta(hours=12, minutes=i))); eid += 1
    for i in range(5):
        rows.append(Row(event_id=eid, event_type="view",
                        ts=base + dt.timedelta(hours=12, minutes=30 + i))); eid += 1
    # recovery hours 13-17
    for h in range(13, 18):
        for i in range(10):
            rows.append(Row(event_id=eid, event_type="view",
                            ts=base + dt.timedelta(hours=h, minutes=i))); eid += 1
    # sustained incident hours 18-23: 60% errors
    for h in range(18, 24):
        for i in range(6):
            rows.append(Row(event_id=eid, event_type="error",
                            ts=base + dt.timedelta(hours=h, minutes=i))); eid += 1
        for i in range(4):
            rows.append(Row(event_id=eid, event_type="view",
                            ts=base + dt.timedelta(hours=h, minutes=30 + i))); eid += 1
    out = timeseries.slo_burn_rate(
        spark.createDataFrame(rows), slo_budget=0.25, long_window_hours=6
    ).collect()
    hours = {r["hour"] for r in out}
    # the isolated spike never fires (long window healthy)
    assert "2024-01-01 12:00" not in hours
    # the sustained incident fires once the 6h window catches up
    assert "2024-01-01 23:00" in hours
    for r in out:
        assert r["burn_1h"] > 1.0 and r["burn_6h"] > 1.0


def test_user_hour_divergence_ranks_night_bot_first(spark):
    import random

    rnd = random.Random(6)
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # 50 humans: activity concentrated 9-17h
    for u in range(50):
        for _ in range(30):
            hr = rnd.choice(range(9, 18))
            rows.append(Row(event_id=eid, user_id=u,
                            ts=base + dt.timedelta(hours=hr, minutes=rnd.randrange(60)))); eid += 1
    # bot 999: fires exactly at 03:00 every day
    for d in range(30):
        rows.append(Row(event_id=eid, user_id=999,
                        ts=base + dt.timedelta(days=d, hours=3))); eid += 1
    out = ea.user_hour_divergence(spark.createDataFrame(rows), top_k=5).collect()
    assert out[0]["user_id"] == 999
    assert out[0]["kl"] > out[-1]["kl"]
    assert out[0]["n_events"] == 30


def test_user_hour_divergence_min_events_filter(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [Row(event_id=i, user_id=1, ts=base + dt.timedelta(hours=i % 24))
            for i in range(48)]
    rows += [Row(event_id=100, user_id=2, ts=base)]  # 1 event only
    out = ea.user_hour_divergence(spark.createDataFrame(rows), min_events=10).collect()
    assert {r["user_id"] for r in out} == {1}
