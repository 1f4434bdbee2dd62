"""Wave 88: digit forensics and incremental join-view maintenance."""

from __future__ import annotations

import random

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling
from rss_feed_etl_spark.streaming.incremental import (
    incremental_join_view,
    incremental_join_view_right,
)


def test_digit_forensics_flags_fabricated_tail(spark):
    rnd = random.Random(17)
    rows = []
    # 'honest': uniform last cents
    for i in range(5000):
        rows.append(Row(event_id=i, event_type="honest",
                        value=rnd.randrange(100, 50000) / 100.0))
    # 'fab': someone typing numbers — last digit always 0 or 5
    for i in range(5000):
        v = rnd.randrange(100, 5000) * 10 + rnd.choice([0, 5])
        rows.append(Row(event_id=10_000 + i, event_type="fab", value=v / 100.0))
    out = {r["event_type"]: r for r in
           profiling.digit_forensics(spark.createDataFrame(rows)).collect()}
    assert out["honest"]["uniform_ok"] == 1
    assert out["fab"]["uniform_ok"] == 0
    assert out["fab"]["chi2_last_digit"] > out["honest"]["chi2_last_digit"]


def test_digit_forensics_nine_ending_rate(spark):
    rows = [Row(event_id=i, event_type="p", value=9.99) for i in range(8)]
    rows += [Row(event_id=100 + i, event_type="p", value=10.00) for i in range(2)]
    out = profiling.digit_forensics(spark.createDataFrame(rows)).collect()[0]
    assert out["frac_9_ending"] == 0.8


def test_incremental_join_fold_equals_batch(spark, tmp_path):
    lp, rp, op = (str(tmp_path / p) for p in ("L", "R", "OUT"))
    # seed both sides with empty-compatible bases
    spark.createDataFrame([], "k long, lv string").write.parquet(lp)
    spark.createDataFrame([], "k long, rv string").write.parquet(rp)
    spark.createDataFrame([], "k long, lv string, rv string").write.parquet(op)

    l1 = spark.createDataFrame([Row(k=1, lv="a"), Row(k=2, lv="b")])
    r1 = spark.createDataFrame([Row(k=1, rv="X")])
    l2 = spark.createDataFrame([Row(k=1, lv="a2"), Row(k=3, lv="c")])
    r2 = spark.createDataFrame([Row(k=2, rv="Y"), Row(k=3, rv="Z")])

    incremental_join_view(spark, l1, lp, rp, op, "k")      # ΔL1 ⋈ R(∅)
    incremental_join_view_right(spark, r1, lp, rp, op, "k")  # L ⋈ ΔR1
    incremental_join_view(spark, l2, lp, rp, op, "k")      # ΔL2 ⋈ R
    incremental_join_view_right(spark, r2, lp, rp, op, "k")  # L ⋈ ΔR2

    got = {(r["k"], r["lv"], r["rv"])
           for r in spark.read.parquet(op).collect()}
    full = {
        (r["k"], r["lv"], r["rv"])
        for r in spark.read.parquet(lp).join(spark.read.parquet(rp), "k").collect()
    }
    assert got == full
    # spot-check the expected pairs exist
    assert (1, "a", "X") in got and (1, "a2", "X") in got
    assert (2, "b", "Y") in got and (3, "c", "Z") in got
