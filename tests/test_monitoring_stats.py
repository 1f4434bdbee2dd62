"""Wave-29 monitoring stats: volume anomalies, chi-square drift cells,
distributed moment combination."""

import math
from datetime import datetime

import pytest

from rss_feed_etl_spark.operators import sketches, timeseries


def test_daily_count_anomalies_flags_spike_day(spark):
    rows = []
    eid = 0
    for day in range(1, 11):
        n = 100 if day != 7 else 200  # day 7 doubles
        for _ in range(n):
            rows.append((eid, datetime(2024, 1, day)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    out = {r["day"]: r for r in timeseries.daily_count_anomalies(ev, threshold=0.2).collect()}
    assert "2024-01-07" in out and out["2024-01-07"]["pct_dev"] > 0.2
    # steady days before the spike are not flagged
    assert "2024-01-05" not in out


def test_contingency_chi2_independent_table_is_zero(spark):
    # perfectly independent 2x2: every cell observed == expected
    rows = []
    i = 0
    for src in ("a", "b"):
        for lang in ("en", "de"):
            for _ in range(10):
                rows.append((i, src, lang))
                i += 1
    df = spark.createDataFrame(rows, "doc_id bigint, source string, lang string")
    out = sketches.contingency_chi2(df).collect()
    assert len(out) == 4
    for r in out:
        assert r["chi2_contrib"] == 0.0
        assert r["observed"] == 10 and r["expected"] == 10.0


def test_contingency_chi2_materializes_zero_cells(spark):
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "de")], "doc_id bigint, source string, lang string"
    )
    out = {(r["source"], r["lang"]): r for r in sketches.contingency_chi2(df).collect()}
    assert len(out) == 4  # full 2x2 grid including the two zero cells
    assert out[("a", "de")]["observed"] == 0
    assert out[("a", "de")]["expected"] == 0.5


def test_mergeable_moments_equal_direct(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id bigint, n_chars double"
    )
    out = sketches.mergeable_moments(df, shard_expr="doc_id % 3").collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    assert out["n_rows"] == n
    assert out["mean"] == pytest.approx(mean, abs=1e-6)
    assert out["stddev_pop"] == pytest.approx(math.sqrt(var), abs=1e-6)


def test_mergeable_moments_invariant_to_shard_count(spark):
    df = spark.range(100).selectExpr("id AS doc_id", "CAST(id * id % 97 AS DOUBLE) AS n_chars")
    a = sketches.mergeable_moments(df, shard_expr="doc_id % 2").collect()[0]
    b = sketches.mergeable_moments(df, shard_expr="doc_id % 16").collect()[0]
    assert a == b
