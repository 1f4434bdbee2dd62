"""Wave 75: Nelson-Aalen hazard, QTE, and join-order advisor."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea
from rss_feed_etl_spark.operators import profiling


def test_nelson_aalen_matches_hand_computation(spark):
    # lifetimes (all events, censor far in past): durations 0,0,1,2
    # risk sets: t=0: n=4 d=2; t=1: n=2 d=1; t=2: n=1 d=1
    # H(0)=0.5, H(1)=1.0, H(2)=2.0
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, dur in [(1, 0), (2, 0), (3, 1), (4, 2)]:
        rows.append(Row(event_id=eid, user_id=u, ts=base)); eid += 1
        rows.append(Row(event_id=eid, user_id=u, ts=base + dt.timedelta(days=dur))); eid += 1
    # sentinel user far in future so every real user is censor-eligible
    rows.append(Row(event_id=eid, user_id=99, ts=base + dt.timedelta(days=100)))
    df = spark.createDataFrame(rows)
    out = {r["duration_days"]: r for r in ea.nelson_aalen(df, censor_days=3).collect()}
    # risk sets: t0 n=5 (sentinel censors AT 0), d=2; t1 n=2 d=1; t2 n=1 d=1
    assert out[0]["cum_hazard"] == 0.4
    assert abs(out[1]["cum_hazard"] - round(2 / 5 + 1 / 2, 6)) < 1e-6
    assert abs(out[2]["cum_hazard"] - round(2 / 5 + 1 / 2 + 1.0, 6)) < 1e-6
    # SE is monotone nondecreasing like H itself
    hs = [out[k]["hazard_se"] for k in sorted(out)]
    assert hs == sorted(hs)


def test_nelson_aalen_hazard_below_km_neg_log(spark):
    # algebraic identity check: H_NA(t) <= -ln(S_KM(t)) for d < n
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, dur in [(1, 0), (2, 1), (3, 1), (4, 3), (5, 4), (6, 6)]:
        rows.append(Row(event_id=eid, user_id=u, ts=base)); eid += 1
        rows.append(Row(event_id=eid, user_id=u, ts=base + dt.timedelta(days=dur))); eid += 1
    rows.append(Row(event_id=eid, user_id=99, ts=base + dt.timedelta(days=60)))
    df = spark.createDataFrame(rows)
    import math

    na = {r["duration_days"]: r["cum_hazard"] for r in ea.nelson_aalen(df).collect()}
    km = {r["duration_days"]: r["survival"] for r in ea.kaplan_meier(df).collect()}
    for t, h in na.items():
        if km[t] and km[t] > 0:
            assert h <= -math.log(km[t]) + 1e-9


def test_qte_detects_tail_only_effect(spark):
    import hashlib

    def arm(u):
        return (int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 1_000_000_007) % 2

    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for u in range(2000):
        # arm 1 gets a boost ONLY in its top draw (tail effect)
        for i in range(3):
            v = float(10 + (u * 7 + i * 13) % 50)
            if arm(u) == 1 and i == 2:
                v += 100.0
            rows.append(Row(event_id=eid, user_id=u, ts=base, value=v)); eid += 1
    out = profiling.quantile_treatment_effect(spark.createDataFrame(rows)).collect()[0]
    # median barely moves; p75 moves a lot
    assert abs(out["qte_50"]) < out["qte_75"]
    assert out["qte_75"] > 20.0


def test_join_order_advisor_prefers_smaller_intermediate(spark):
    # A(1000 rows) -- B(100) -- C(10): (B JOIN C) is the smaller start
    a = spark.createDataFrame([Row(ka=i % 100) for i in range(1000)])
    b = spark.createDataFrame([Row(kb=i, kc=i % 10) for i in range(100)])
    c = spark.createDataFrame([Row(kcc=i) for i in range(10)])
    out = {
        r["join_order"]: r
        for r in profiling.join_order_advisor(
            a, b, c, ("ka", "kb"), ("kc", "kcc"), ("A", "B", "C")
        ).collect()
    }
    assert out["(A JOIN B) JOIN C"]["intermediate_rows"] == 1000
    assert out["(B JOIN C) JOIN A"]["intermediate_rows"] == 100
    assert out["(B JOIN C) JOIN A"]["recommended"] == 1
    assert out["(A JOIN B) JOIN C"]["recommended"] == 0
