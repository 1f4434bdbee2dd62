"""Wave-13 operators: funnel, retention cohorts, histogram, deciles."""

import datetime

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics as ea


def _ev(i, u, t, typ, v=1.0):
    return Row(
        event_id=i,
        user_id=u,
        ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=t),
        event_type=typ,
        value=v,
    )


def test_funnel_requires_stage_order(spark):
    events = spark.createDataFrame(
        [
            # u1 completes the funnel in order
            _ev(1, 1, 0, "view"), _ev(2, 1, 1, "click"), _ev(3, 1, 2, "purchase"),
            # u2 purchases BEFORE clicking — purchase must not count
            _ev(4, 2, 0, "view"), _ev(5, 2, 1, "purchase"), _ev(6, 2, 2, "click"),
            # u3 clicks without ever viewing — neither click nor purchase count
            _ev(7, 3, 0, "click"), _ev(8, 3, 1, "purchase"),
        ]
    )
    out = {r["stage"]: r["n_users"] for r in ea.funnel_stages(events, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 2, "click": 2, "purchase": 1}


def test_retention_offsets(spark):
    events = spark.createDataFrame(
        [
            _ev(1, 1, 0, "view"),            # u1 cohort day 0
            _ev(2, 1, 24 * 2, "view"),       # active again day 2
            _ev(3, 2, 0, "view"),            # u2 cohort day 0, never returns
            _ev(4, 3, 24, "view"),           # u3 cohort day 1
        ]
    )
    rows = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in ea.retention_cohorts(events).collect()
    }
    assert rows == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_histogram_underflow_overflow(spark):
    events = spark.createDataFrame(
        [_ev(1, 1, 0, "a", -5.0), _ev(2, 1, 0, "a", 10.0), _ev(3, 1, 0, "a", 999.0)]
    )
    out = {r["bucket"]: r["n"] for r in ea.value_histogram(events, lo=0, hi=100, n_bins=10).collect()}
    assert out == {0: 1, 2: 1, 11: 1}  # underflow, [10,20), overflow


def test_deciles_partition_evenly(spark):
    events = spark.createDataFrame([_ev(i, 1, 0, "a", float(i)) for i in range(100)])
    out = ea.group_deciles(events, n=10).collect()
    assert len(out) == 10
    assert all(r["n"] == 10 for r in out)
    d1 = [r for r in out if r["decile"] == 1][0]
    assert d1["lo"] == 0.0 and d1["hi"] == 9.0


def test_last_touch_attribution_rules(spark):
    events = spark.createDataFrame(
        [
            # u1: click then purchase → attributed to click
            _ev(1, 1, 0, "click"), _ev(2, 1, 1, "purchase", 10.0),
            # u2: view then (later) click then purchase → LAST touch = click
            _ev(3, 2, 0, "view"), _ev(4, 2, 1, "click"), _ev(5, 2, 2, "purchase", 20.0),
            # u3: purchase with no prior source → direct
            _ev(6, 3, 0, "purchase", 5.0),
            # u4: view 10 days before purchase → stale → direct
            _ev(7, 4, 0, "view"), _ev(8, 4, 24 * 10, "purchase", 7.0),
        ]
    )
    out = {r["source"]: (r["n_conversions"], r["total_value"]) for r in
           ea.last_touch_attribution(events, ["view", "click"], max_age_days=7).collect()}
    assert out == {"click": (2, 30.0), "direct": (2, 12.0)}
