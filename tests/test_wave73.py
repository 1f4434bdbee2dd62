"""Wave 73: CUPED adjustment and inter-event burstiness."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea


def test_cuped_reduces_variance_when_pre_predicts_post(spark):
    # users with strong pre→post correlation: post = pre + noise.
    # CUPED should reclaim most of the between-user variance.
    rnd = random.Random(3)
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for u in range(400):
        usage = rnd.uniform(10, 100)  # stable per-user level
        for d in range(4):  # pre-period events (days 0-3)
            rows.append(Row(event_id=eid, user_id=u, event_type="x",
                            ts=base + dt.timedelta(days=d), value=usage + rnd.uniform(-1, 1)))
            eid += 1
        for d in range(6, 10):  # post-period events (days 6-9)
            rows.append(Row(event_id=eid, user_id=u, event_type="x",
                            ts=base + dt.timedelta(days=d), value=usage + rnd.uniform(-1, 1)))
            eid += 1
    out = ea.cuped_adjustment(spark.createDataFrame(rows)).collect()
    assert len(out) == 2 and {r["arm"] for r in out} == {0, 1}
    for r in out:
        assert r["var_reduction_pct"] > 90.0  # pre almost fully predicts post
        # adjustment recentres but stays in the data's range
        assert 0 < r["mean_adj"] < 500
    assert sum(r["n_users"] for r in out) == 400


def test_cuped_no_pre_signal_changes_nothing_much(spark):
    # post independent of pre -> theta ~ 0 -> adj ~ raw, reduction ~ 0
    rnd = random.Random(8)
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for u in range(300):
        rows.append(Row(event_id=eid, user_id=u, event_type="x",
                        ts=base, value=rnd.uniform(0, 100))); eid += 1
        rows.append(Row(event_id=eid, user_id=u, event_type="x",
                        ts=base + dt.timedelta(days=9), value=rnd.uniform(0, 100))); eid += 1
    out = ea.cuped_adjustment(spark.createDataFrame(rows)).collect()
    for r in out:
        assert abs(r["var_reduction_pct"]) < 10.0
        assert abs(r["mean_adj"] - r["mean_post"]) < 5.0


def test_burstiness_separates_metronome_from_bursts(spark):
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # metronome: one user, exactly hourly -> sigma 0 -> B = -1
    for i in range(50):
        rows.append(Row(event_id=eid, user_id=1, event_type="steady",
                        ts=base + dt.timedelta(hours=i), value=1.0)); eid += 1
    # bursty: tight clusters separated by long silences
    t = base
    for burst in range(10):
        for j in range(5):
            t += dt.timedelta(seconds=1)
            rows.append(Row(event_id=eid, user_id=2, event_type="bursty",
                            ts=t, value=1.0)); eid += 1
        t += dt.timedelta(days=2)
    out = {r["event_type"]: r for r in
           ea.interevent_burstiness(spark.createDataFrame(rows)).collect()}
    assert out["steady"]["burstiness"] == -1.0
    assert out["steady"]["mean_gap_s"] == 3600.0
    # 40 one-second gaps + 9 two-day silences: sigma ~ 2x mu -> B ~ 0.36
    assert out["bursty"]["burstiness"] > 0.3
    assert out["bursty"]["n_gaps"] == 49


def test_burstiness_gaps_are_within_user(spark):
    # two interleaved users, each strictly hourly: per-user gaps stay
    # 3600 s even though the merged stream alternates every 30 min
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for i in range(20):
        rows.append(Row(event_id=eid, user_id=1, event_type="t",
                        ts=base + dt.timedelta(hours=i), value=1.0)); eid += 1
        rows.append(Row(event_id=eid, user_id=2, event_type="t",
                        ts=base + dt.timedelta(hours=i, minutes=30), value=1.0)); eid += 1
    out = ea.interevent_burstiness(spark.createDataFrame(rows)).collect()[0]
    assert out["mean_gap_s"] == 3600.0
    assert out["burstiness"] == -1.0
