"""Wave 56: point-in-time SCD2 interval enrichment."""

from __future__ import annotations

import datetime as dt

from rss_feed_etl_spark.operators import joins


def test_interval_enrich_picks_effective_version(spark):
    t = lambda d: dt.datetime(2024, 1, d)
    versions = spark.createDataFrame(
        [
            (1, 10.0, t(1), t(5)),
            (1, 20.0, t(5), t(10)),
            (1, 30.0, t(10), None),
            (2, 99.0, t(3), None),
        ],
        "user_id bigint, value double, effective_start timestamp, effective_end timestamp",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, t(2)),   # version 10
            (101, 1, t(5)),   # boundary: start inclusive -> 20
            (102, 1, t(12)),  # open version -> 30
            (103, 2, t(1)),   # before user 2's first version -> NULL
            (104, 3, t(4)),   # unknown key -> NULL
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    out = {r["event_id"]: r["dim_value"] for r in joins.scd2_interval_enrich(
        facts, versions, key="user_id"
    ).collect()}
    assert out[100] == 10.0
    assert out[101] == 20.0  # end exclusive, next start inclusive
    assert out[102] == 30.0
    assert out[103] is None
    assert out[104] is None


def test_interval_enrich_at_most_one_version_per_fact(spark):
    t = lambda d: dt.datetime(2024, 1, d)
    versions = spark.createDataFrame(
        [(1, float(v), t(v), t(v + 1)) for v in range(1, 20)],
        "user_id bigint, value double, effective_start timestamp, effective_end timestamp",
    )
    facts = spark.createDataFrame(
        [(i, 1, t(i)) for i in range(1, 19)], "event_id bigint, user_id bigint, ts timestamp"
    )
    out = joins.scd2_interval_enrich(facts, versions, key="user_id")
    assert out.count() == 18  # no fan-out: intervals tile, one match each
