"""Wave 87: panel user slopes and Kitagawa decomposition."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea


def test_panel_slopes_detect_universal_growth(spark):
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # every user's daily value grows by exactly 2/day from a personal base
    for u in range(40):
        for d in range(5):
            rows.append(Row(event_id=eid, user_id=u,
                            ts=base + dt.timedelta(days=d),
                            value=float(10 * u + 2 * d)))
            eid += 1
    out = ea.panel_user_slopes(spark.createDataFrame(rows)).collect()[0]
    assert out["n_users"] == 40
    assert abs(out["median_slope"] - 2.0) < 1e-6
    assert abs(out["p25_slope"] - 2.0) < 1e-6
    assert out["frac_positive"] == 1.0


def test_panel_slopes_vs_pooled_confound(spark):
    # individual users FLAT, but later cohorts have lower value: pooled
    # trend would be negative; the panel median slope is 0
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(30):
        lvl = float(100 - u)  # later (higher-id) users lower level
        for d in range(4):
            rows.append(Row(event_id=eid, user_id=u,
                            ts=base + dt.timedelta(days=u + d), value=lvl))
            eid += 1
    out = ea.panel_user_slopes(spark.createDataFrame(rows)).collect()[0]
    assert out["median_slope"] == 0.0
    assert out["p25_slope"] == 0.0 and out["p75_slope"] == 0.0


def _arm4(u):
    return (int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 1_000_000_007) % 4


def test_kitagawa_effects_sum_to_delta(spark):
    base = dt.datetime(2024, 1, 1)
    late = dt.datetime(2024, 12, 1)
    rows, eid = [], 0
    # era 1 doubles segment-0 traffic (mix shift) and improves segment-1
    # conversion (rate shift); other segments stable
    for u in range(400):
        seg = _arm4(u)
        n_old = 2
        n_new = 4 if seg == 0 else 2
        conv_old = 1 if seg in (1, 2) else 0
        conv_new = 2 if seg == 1 else (1 if seg == 2 else 0)
        for i in range(n_old):
            typ = "purchase" if i < conv_old else "view"
            rows.append(Row(event_id=eid, user_id=u, event_type=typ, ts=base)); eid += 1
        for i in range(n_new):
            typ = "purchase" if i < conv_new else "view"
            rows.append(Row(event_id=eid, user_id=u, event_type=typ, ts=late)); eid += 1
    out = {r["segment"]: r for r in
           ea.kitagawa_rate_decomposition(spark.createDataFrame(rows)).collect()}
    o = out["OVERALL"]
    delta = o["rate_new"] - o["rate_old"]
    assert abs((o["rate_effect"] + o["mix_effect"]) - delta) < 1e-5
    # segment 1 carries the rate effect; segment 0's mix effect is negative
    # (it grew but converts at 0 -> dilution shows up as rate-0 mix drag)
    assert out["1"]["rate_effect"] > 0
    assert o["mix_effect"] != 0.0
