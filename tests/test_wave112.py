"""Wave 112: zone-map skipping stats and the skew salting plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import layout


def _clustered(spark):
    # 4 synthetic files (span=2) whose key order tracks time exactly:
    # file i holds days 2i and 2i+1.  A trailing 2-day window touches
    # one file; zone maps skip the other three.
    base = dt.datetime(2025, 1, 1)
    rows = [
        Row(k=i, ts=base + dt.timedelta(days=i), v=float(i)) for i in range(8)
    ]
    return spark.createDataFrame(rows)


def _shuffled(spark):
    # Same row count but the write key is uncorrelated with time: every
    # file holds one max-day row, so every file straddles the window and
    # nothing skips.
    base = dt.datetime(2025, 1, 1)
    order = [0, 7, 1, 7, 2, 7, 3, 7]
    rows = [
        Row(k=i, ts=base + dt.timedelta(days=order[i]), v=float(i))
        for i in range(8)
    ]
    return spark.createDataFrame(rows)


def test_zonemap_clustered_layout_skips(spark):
    out = layout.zonemap_skip_stats(
        _clustered(spark), key_col="k", ts_col="ts",
        file_span=2, window_days=(1,),
    ).collect()[0]
    assert out["n_files"] == 4
    assert out["files_read"] == 1
    assert out["rows_read"] == 2
    assert out["rows_matching"] == 2  # days 6 and 7 within 1 day of max
    assert out["file_skip_ratio"] == 0.75
    assert out["read_amplification"] == 1.0


def test_zonemap_shuffled_layout_reads_everything(spark):
    out = layout.zonemap_skip_stats(
        _shuffled(spark), key_col="k", ts_col="ts",
        file_span=2, window_days=(1,),
    ).collect()[0]
    assert out["n_files"] == 4
    assert out["files_read"] == 4  # every file's max is in the window
    assert out["file_skip_ratio"] == 0.0
    assert out["rows_matching"] == 4  # the four day-7 rows
    assert out["read_amplification"] == 8 / 4


def test_salting_plan_caps_task_size(spark):
    rows = (
        [Row(key="hot", x=i) for i in range(10)]
        + [Row(key="warm", x=i) for i in range(4)]
        + [Row(key="cold", x=0)]
    )
    df = spark.createDataFrame(rows)
    out = {
        r["key"]: r
        for r in layout.skew_salting_plan(
            df, key_col="key", target_rows_per_task=3
        ).collect()
    }
    assert set(out) == {"hot", "warm"}  # cold is under the target
    assert out["hot"]["salt_factor"] == 4  # ceil(10/3)
    assert out["hot"]["salted_task_rows"] == 3  # ceil(10/4) <= target
    assert out["warm"]["salt_factor"] == 2
    assert out["warm"]["salted_task_rows"] == 2
    for r in out.values():
        assert r["salted_task_rows"] <= 3
    assert abs(out["hot"]["share"] - 10 / 15) < 1e-6  # rounded to 6 dp


def test_salting_plan_topn_is_deterministic(spark):
    rows = [Row(key=f"k{i:02d}", x=j) for i in range(6) for j in range(5)]
    df = spark.createDataFrame(rows)
    out = layout.skew_salting_plan(
        df, key_col="key", target_rows_per_task=2, top_n=3
    ).collect()
    # all keys tie at 5 rows -> the limit boundary falls back to key ASC
    assert [r["key"] for r in out] == ["k00", "k01", "k02"]
