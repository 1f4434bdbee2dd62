"""Wave 118: shuffle partition advisor and conformal coverage."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import layout, timeseries


def test_shuffle_advisor_sizes_from_measured_widths(spark):
    wide = spark.createDataFrame(
        [Row(k=i, s="x" * 100) for i in range(1000)]
    )
    narrow = spark.createDataFrame([Row(k=i) for i in range(1000)])
    out = {
        r["table"]: r
        for r in layout.shuffle_partition_advisor(
            {"wide": wide, "narrow": narrow},
            target_partition_mb=0.05,  # 50 KB target so partitions > 1
        ).collect()
    }
    assert out["wide"]["est_row_bytes"] == 108.0   # 8 (bigint) + 100 chars
    assert out["narrow"]["est_row_bytes"] == 8.0
    # wide table: ~108 KB -> 3 partitions at 50 KB; narrow: 8 KB -> 1
    assert out["wide"]["recommended_partitions"] == 3
    assert out["narrow"]["recommended_partitions"] == 1
    assert (
        out["wide"]["est_rows_per_partition"]
        * out["wide"]["recommended_partitions"]
        >= out["wide"]["n_rows"]
    )


def test_shuffle_advisor_floors_at_one_partition(spark):
    tiny = spark.createDataFrame([Row(k=1)])
    out = layout.shuffle_partition_advisor({"tiny": tiny}).collect()[0]
    assert out["recommended_partitions"] == 1
    assert out["est_rows_per_partition"] == 1


def _noisy_weekly(spark, days=100):
    # dow-mean-predictable series with deterministic bounded "noise"
    base = dt.date(2024, 1, 1)
    rows = []
    for d in range(days):
        noise = ((d * 7919) % 11) - 5  # in [-5, 5], mean ~0
        rows.append(
            Row(
                day=base + dt.timedelta(days=d),
                total=100.0 + 10.0 * (d % 7) + float(noise),
            )
        )
    return spark.createDataFrame(rows)


def test_conformal_coverage_hits_target_on_exchangeable_noise(spark):
    out = timeseries.conformal_interval_coverage(
        _noisy_weekly(spark), alpha=0.1
    ).collect()[0]
    assert out["n_train"] == 60
    assert out["n_cal"] == 20
    assert out["n_test"] == 20
    assert out["target_coverage"] == 0.9
    # bounded noise: with q_hat from the same distribution, coverage
    # lands at or above target (conformal validity direction)
    assert out["coverage"] >= 0.85
    assert 0.0 < out["q_hat"] <= 11.0


def test_conformal_interval_widens_on_test_shift(spark):
    # shift the tail: coverage must DROP below target — the honest-eval
    # property (the metric detects broken exchangeability, not hides it)
    rows = _noisy_weekly(spark, days=100).collect()
    shifted = [
        Row(day=r["day"], total=r["total"] + (50.0 if i >= 80 else 0.0))
        for i, r in enumerate(sorted(rows, key=lambda r: r["day"]))
    ]
    out = timeseries.conformal_interval_coverage(
        spark.createDataFrame(shifted), alpha=0.1
    ).collect()[0]
    assert out["coverage"] < 0.5
