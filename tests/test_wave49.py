"""Wave 49: diff-in-diff and ordered-pair episodes."""

from __future__ import annotations

import datetime as dt
import math

from rss_feed_etl_spark.operators import eventanalytics as ea


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_did_recovers_planted_effect(spark):
    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for u in range(40):
        treated = u % 2 == 1
        for t, is_post in ((pre, False), (post, True)):
            eid += 1
            # base 10; time trend +5 post for everyone; +7 treatment effect
            v = 10.0 + (5.0 if is_post else 0.0)
            if treated and is_post:
                v += 7.0
            rows.append((eid, t, u, "view", v))
    r = ea.diff_in_diff(_ev(spark, rows), split_date="2024-01-16").collect()[0]
    assert math.isclose(r["did_estimate"], 7.0, abs_tol=1e-6)
    assert math.isclose(r["treat_post"] - r["treat_pre"], 12.0, abs_tol=1e-6)
    assert math.isclose(r["ctrl_post"] - r["ctrl_pre"], 5.0, abs_tol=1e-6)
    # constant cells -> zero variance -> zero SE, CI collapses on estimate
    assert r["std_err"] == 0.0
    assert r["ci_lo"] == r["ci_hi"] == 7.0


def test_did_se_positive_with_noise(spark):
    import random

    rng = random.Random(4)
    rows = []
    eid = 0
    for u in range(100):
        for day in (5, 25):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day), u, "view",
                 round(rng.uniform(0, 100), 3))
            )
    r = ea.diff_in_diff(_ev(spark, rows), split_date="2024-01-16").collect()[0]
    assert r["std_err"] > 0
    assert r["ci_lo"] < r["did_estimate"] < r["ci_hi"]


def test_episodes_window_boundary(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: view then purchase 2h later -> inside 24h window
        (1, t0, 1, "view", 0.0),
        (2, t0 + dt.timedelta(hours=2), 1, "purchase", 0.0),
        # u2: view then purchase 30h later -> outside
        (3, t0, 2, "view", 0.0),
        (4, t0 + dt.timedelta(hours=30), 2, "purchase", 0.0),
        # u3: purchase before view -> no episode
        (5, t0, 3, "purchase", 0.0),
        (6, t0 + dt.timedelta(hours=1), 3, "view", 0.0),
        # u4: two qualifying purchases after one view
        (7, t0, 4, "view", 0.0),
        (8, t0 + dt.timedelta(hours=1), 4, "purchase", 0.0),
        (9, t0 + dt.timedelta(hours=2), 4, "purchase", 0.0),
    ]
    r = ea.ordered_pair_episodes(_ev(spark, rows), within_hours=24).collect()[0]
    assert r["n_exposed_users"] == 4
    assert r["n_episode_users"] == 2  # u1 and u4
    assert r["n_episodes"] == 3
    assert math.isclose(r["support"], 0.5)


def test_episodes_refreshed_by_new_view(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 0.0),
        # a second view 40h later refreshes the window
        (2, t0 + dt.timedelta(hours=40), 1, "view", 0.0),
        (3, t0 + dt.timedelta(hours=41), 1, "purchase", 0.0),
    ]
    r = ea.ordered_pair_episodes(_ev(spark, rows), within_hours=24).collect()[0]
    assert r["n_episode_users"] == 1
