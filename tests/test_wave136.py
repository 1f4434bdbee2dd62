"""Wave 136 goldens: CUSUM changepoints and the k-NN hubness histogram."""

import datetime

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.similarity import knn_hub_degree_hist
from rss_feed_etl_spark.operators.timeseries import cusum_trajectory


def _events(spark, counts, etype="a"):
    """One event row per unit of the daily count series."""
    rows = []
    for day, n in enumerate(counts, start=1):
        for j in range(n):
            rows.append(
                Row(
                    ts=datetime.datetime(2024, 3, day, 12, 0, j % 60),
                    event_type=etype,
                )
            )
    return spark.createDataFrame(rows)


def test_cusum_trajectory_constant_series_dropped(spark):
    # std = 0 carries no signal: the series is dropped entirely (the
    # cusum_changepoints contract, shared arithmetic)
    assert cusum_trajectory(_events(spark, [5] * 6)).count() == 0


def test_cusum_trajectory_traces_regime_change(spark):
    # 6 days at 10, then 10 days at 40.  mu = 28.75, sigma ~ 14.524:
    # z_low ~ -1.291, z_high ~ 0.7746.  With k = 0.5, the low regime
    # drives S- up by 0.791/day (alarm h = 4 crossed on day 6) while
    # S+ pins at 0; after the shift S+ climbs 0.2746/day and S- decays.
    out = sorted(
        cusum_trajectory(_events(spark, [10] * 6 + [40] * 10)).collect(),
        key=lambda r: r["day"],
    )
    assert len(out) == 16
    pre, post = out[:6], out[6:]
    assert all(r["cusum_pos"] == 0.0 for r in pre)
    assert pre[0]["cusum_neg"] == pytest.approx(0.790994, abs=1e-5)
    assert not pre[4]["alarm"]  # 5 * 0.791 = 3.95 < 4
    assert pre[5]["alarm"]  # 6 * 0.791 = 4.75 > 4: latency = 6 days
    sps = [r["cusum_pos"] for r in post]
    assert all(b > a for a, b in zip(sps, sps[1:]))  # S+ climbs post-shift
    assert post[0]["cusum_pos"] == pytest.approx(0.274596, abs=1e-5)
    sns = [r["cusum_neg"] for r in post]
    assert all(b <= a for a, b in zip(sns, sns[1:]))  # S- resets


def test_cusum_trajectory_mirror_symmetry(spark):
    # reversing the series swaps the roles of S+ and S- day-for-day
    up = sorted(
        cusum_trajectory(_events(spark, [10] * 6 + [40] * 10)).collect(),
        key=lambda r: r["day"],
    )
    down = sorted(
        cusum_trajectory(_events(spark, [40] * 6 + [10] * 10)).collect(),
        key=lambda r: r["day"],
    )
    for u, d in zip(up, down):
        assert u["cusum_pos"] == pytest.approx(d["cusum_neg"], abs=1e-6)
        assert u["cusum_neg"] == pytest.approx(d["cusum_pos"], abs=1e-6)


def test_hubness_hand_computed(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 0.01]),
            Row(vec_id=2, embedding=[1.0, 0.02]),
            Row(vec_id=3, embedding=[0.0, 1.0]),
        ]
    )
    out = {
        r["in_degree"]: r["n_vectors"]
        for r in knn_hub_degree_hist(emb, n_queries=2, k=1).collect()
    }
    # v0 retrieves v1; v1 retrieves v0 (4dp cosine tie with v2 breaks to
    # the smaller id) -> two vectors at degree 1, two anti-hubs at 0
    assert out == {1: 2, 0: 2}


def test_hubness_mass_sums_to_corpus(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3) + 1.0, float(i % 5)]) for i in range(30)]
    )
    rows = knn_hub_degree_hist(emb, n_queries=5, k=3).collect()
    assert sum(r["n_vectors"] for r in rows) == 30
    total_edges = sum(r["in_degree"] * r["n_vectors"] for r in rows)
    assert total_edges == 5 * 3
