"""Wave 77: partition granularity advisor and RFM segments."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea
from rss_feed_etl_spark.operators import layout


def test_granularity_read_amplification_ordering(spark):
    # 90 days of uniform traffic, query = last 7 days:
    # day partitions read ~7/90 of rows; month reads the whole last month
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for d in range(90):
        for _ in range(10):
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=d)))
            eid += 1
    out = {
        r["granularity"]: r
        for r in layout.partition_granularity_advisor(
            spark.createDataFrame(rows), window_days=7
        ).collect()
    }
    assert out["day"]["n_partitions"] == 90
    assert out["month"]["n_partitions"] == 3
    # finer partitioning reads less than or equal rows for the same query
    assert out["day"]["rows_read"] <= out["week"]["rows_read"] <= out["month"]["rows_read"]
    assert out["day"]["read_amplification"] < out["month"]["read_amplification"]
    # all granularities answer the same question
    assert len({r["rows_matching"] for r in out.values()}) == 1
    # day partitions cover the window almost exactly (boundary partition
    # can hold out-of-window rows only at the window's start day)
    assert out["day"]["read_amplification"] < 1.2


def test_granularity_day_boundary_partition(spark):
    # window cuts INTO a day: that day's partition is read whole
    rows = [
        Row(event_id=1, ts=dt.datetime(2024, 1, 1, 6)),
        Row(event_id=2, ts=dt.datetime(2024, 1, 8, 1)),   # in window
        Row(event_id=3, ts=dt.datetime(2024, 1, 15, 2)),  # tmax
    ]
    out = {
        r["granularity"]: r
        for r in layout.partition_granularity_advisor(
            spark.createDataFrame(rows), window_days=7
        ).collect()
    }
    # lo = Jan 8 02:00 (tmax - 7d): the Jan 8 01:00 event is OUTSIDE
    d = out["day"]
    assert d["rows_matching"] == 1
    assert d["partitions_read"] == 1 and d["rows_read"] == 1
    # month granularity drags in the out-of-window January 8 row
    assert out["month"]["rows_read"] == 3


def test_rfm_segments_place_extreme_users(spark):
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 50 background users: moderate everything
    for u in range(50):
        for d in range(3):
            rows.append(Row(event_id=eid, user_id=u, value=10.0,
                            ts=base + dt.timedelta(days=30 + u % 10 + d))); eid += 1
    # whale: recent, frequent, high-value
    for d in range(20):
        rows.append(Row(event_id=eid, user_id=999, value=500.0,
                        ts=base + dt.timedelta(days=40 + d % 5))); eid += 1
    out = ea.rfm_segments(spark.createDataFrame(rows)).collect()
    assert sum(r["n_users"] for r in out) == 51
    # whale: lowest recency-days score (1), top frequency + monetary (5)
    whale = [r for r in out if r["f_score"] == 5 and r["m_score"] == 5]
    assert len(whale) == 1 and whale[0]["r_score"] == 1
    assert whale[0]["n_users"] == 1
    assert abs(whale[0]["avg_monetary"] - 10000.0) < 0.01


def test_rfm_uniform_users_single_segment(spark):
    base = dt.datetime(2024, 2, 1)
    rows = [
        Row(event_id=i, user_id=i, value=5.0, ts=base) for i in range(40)
    ]
    out = ea.rfm_segments(spark.createDataFrame(rows)).collect()
    # identical users -> identical scores -> exactly one segment
    assert len(out) == 1
    assert out[0]["n_users"] == 40
    assert (out[0]["r_score"], out[0]["f_score"], out[0]["m_score"]) == (1, 1, 1)
