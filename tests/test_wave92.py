"""Wave 92: Hill tail exponent and top-k persistence."""

from __future__ import annotations

import datetime as dt
import math
import random

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea
from rss_feed_etl_spark.operators import profiling


def test_hill_recovers_pareto_alpha(spark):
    rnd = random.Random(12)
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # Pareto(alpha=2) activity: c = ceil(xmin / U^{1/2})
    for u in range(3000):
        c = min(int(math.ceil(5.0 / (rnd.random() ** 0.5))), 2000)
        for _ in range(c):
            rows.append(Row(event_id=eid, user_id=u, ts=base)); eid += 1
    out = profiling.hill_tail_exponent(spark.createDataFrame(rows)).collect()[0]
    assert out["n_tail"] > 100
    assert 1.3 < out["alpha_hat"] < 3.0  # near the planted alpha=2


def test_hill_light_tail_gives_large_alpha(spark):
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # near-constant activity: tail barely exceeds x_min -> huge alpha
    for u in range(500):
        for _ in range(10 + (u % 2)):
            rows.append(Row(event_id=eid, user_id=u, ts=base)); eid += 1
    out = profiling.hill_tail_exponent(spark.createDataFrame(rows)).collect()[0]
    assert out["alpha_hat"] is None or out["alpha_hat"] > 5.0


def test_topk_persistence_streaks(spark):
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # item 1: top every day for 6 days; item 2: days 0,1 and 4,5 (streak 2);
    # filler items keep the top-2 competitive
    for d in range(6):
        for _ in range(10):
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=d),
                            props='{"k": 1}')); eid += 1
        n2 = 8 if d in (0, 1, 4, 5) else 1
        for _ in range(n2):
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=d),
                            props='{"k": 2}')); eid += 1
        for _ in range(5):
            rows.append(Row(event_id=eid, ts=base + dt.timedelta(days=d),
                            props='{"k": 3}')); eid += 1
    out = {r["item"]: r for r in
           ea.topk_persistence(spark.createDataFrame(rows), k=2).collect()}
    assert out["1"]["n_days_in_topk"] == 6 and out["1"]["max_streak"] == 6
    assert out["2"]["n_days_in_topk"] == 4 and out["2"]["max_streak"] == 2
    assert out["3"]["n_days_in_topk"] == 2  # wins top-2 only when item2 dips
