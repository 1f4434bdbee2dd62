"""Wave 46: Wilson intervals, transition probabilities, funnel latency."""

from __future__ import annotations

import datetime as dt
import math

from rss_feed_etl_spark.operators import eventanalytics as ea, graph


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )


def test_wilson_interval_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        et = "purchase" if i < 10 else "view"
        rows.append((i, t0, 1, et, 1.0, '{"k": 3}'))
    out = ea.wilson_rate_intervals(_ev(spark, rows), z=1.96).collect()
    r = out[0]
    assert r["segment"] == 3 and r["n"] == 40 and r["n_conv"] == 10
    p, n, z = 0.25, 40.0, 1.96
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert math.isclose(r["ci_lo"], round(center - half, 6), abs_tol=1e-6)
    assert math.isclose(r["ci_hi"], round(center + half, 6), abs_tol=1e-6)
    assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0


def test_transition_probs_rows_sum_to_one(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), i % 3, ["a", "b", "c"][i % 3], 0.0, "{}")
        for i in range(60)
    ]
    out = graph.transition_probabilities(_ev(spark, rows), alpha=1.0).collect()
    assert len(out) == 9  # dense 3x3 even if some transitions unobserved
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], 0.0)
        by_src[r["src"]] += r["p"]
    for s, tot in by_src.items():
        assert math.isclose(tot, 1.0, abs_tol=1e-4), s


def test_funnel_latency_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: view at t0, purchase 100s later
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=100), 1, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE any view -> exposed but not converted
        (3, t0, 2, "purchase", 0.0, "{}"),
        (4, t0 + dt.timedelta(seconds=50), 2, "view", 0.0, "{}"),
        # u3: view only
        (5, t0, 3, "view", 0.0, "{}"),
        # u4: purchase only -> never exposed, excluded entirely
        (6, t0, 4, "purchase", 0.0, "{}"),
    ]
    r = ea.funnel_latency(_ev(spark, rows)).collect()[0]
    assert r["n_exposed"] == 3
    assert r["n_converted"] == 1
    assert math.isclose(r["latency_p50_s"], 100.0)
