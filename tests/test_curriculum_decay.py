"""Wave-30: curriculum shards and time-decayed popularity."""

from datetime import datetime

import pytest

from rss_feed_etl_spark.operators import eventanalytics as ea
from rss_feed_etl_spark.operators import sampling


def test_curriculum_orders_easy_first_within_shard(spark):
    scores = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(40)], "doc_id bigint, logppl double"
    )
    out = sampling.curriculum_shards(scores, "logppl", n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["logppl"]))
    assert len(out) == 40
    for shard, rows in by_shard.items():
        rows.sort()
        ppl = [p for _, p in rows]
        assert ppl == sorted(ppl), f"shard {shard} not easy-first"
        assert [p for p, _ in rows] == list(range(1, len(rows) + 1))


def test_curriculum_layout_invariant_under_repartition(spark):
    scores = spark.createDataFrame(
        [(i, float((i * 7) % 13)) for i in range(50)], "doc_id bigint, logppl double"
    )
    a = sorted(map(tuple, sampling.curriculum_shards(scores, "logppl").collect()))
    b = sorted(
        map(tuple, sampling.curriculum_shards(scores.repartition(7), "logppl").collect())
    )
    assert a == b


def test_decayed_popularity_halves_per_half_life(spark):
    rows = [
        (1, datetime(2024, 1, 15), '{"k": 1}'),  # now: weight 1
        (2, datetime(2024, 1, 8), '{"k": 2}'),   # one half-life ago: 0.5
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp, props string")
    out = {r["item"]: r for r in ea.decayed_popularity(ev, half_life_days=7.0).collect()}
    assert out[1]["score"] == pytest.approx(1.0, abs=1e-6)
    assert out[2]["score"] == pytest.approx(0.5, abs=1e-6)


def test_decayed_popularity_sums_per_item(spark):
    rows = [
        (1, datetime(2024, 1, 15), '{"k": 9}'),
        (2, datetime(2024, 1, 15), '{"k": 9}'),
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp, props string")
    out = ea.decayed_popularity(ev).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 2
    assert out[0]["score"] == pytest.approx(2.0, abs=1e-6)
