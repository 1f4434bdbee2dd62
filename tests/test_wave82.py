"""Wave 82: overdispersion check and histogram percentile error."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, sketches


def test_overdispersion_separates_uniform_from_clumped(spark):
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # 'uniform': 100 users x exactly 3 events -> var 0 -> dispersion 0
    for u in range(100):
        for _ in range(3):
            rows.append(Row(event_id=eid, user_id=u, event_type="uniform", ts=base))
            eid += 1
    # 'clumped': 5 whales with 50 events + 95 users with 1
    for u in range(5):
        for _ in range(50):
            rows.append(Row(event_id=eid, user_id=u, event_type="clumped", ts=base))
            eid += 1
    for u in range(5, 100):
        rows.append(Row(event_id=eid, user_id=u, event_type="clumped", ts=base))
        eid += 1
    out = {r["event_type"]: r for r in
           profiling.overdispersion_check(spark.createDataFrame(rows)).collect()}
    assert out["uniform"]["dispersion"] == 0.0
    assert out["uniform"]["nb_r_hat"] is None  # var < mean -> no NB fit
    assert out["clumped"]["dispersion"] > 10.0
    assert out["clumped"]["nb_r_hat"] is not None
    assert out["uniform"]["mean_per_user"] == 3.0


def test_histogram_percentile_within_one_bin(spark):
    import random

    rnd = random.Random(21)
    rows = [
        Row(event_id=i, event_type="t", value=rnd.uniform(0, 400))
        for i in range(5000)
    ]
    out = sketches.histogram_percentile_error(
        spark.createDataFrame(rows), lo=0.0, hi=500.0, n_bins=100
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["within_one_bin"] == 1
        assert r["abs_err"] <= 5.0
    # uniform 0..400: p50 near 200
    p50 = [r for r in out if r["p"] == 0.5][0]
    assert 180 < p50["est"] < 220


def test_histogram_is_mergeable_across_batches(spark):
    # the property the operator exists for: hist(A ∪ B) == hist(A)+hist(B)
    # -> estimate from the union equals estimate from merged bucket counts
    import random

    rnd = random.Random(4)
    a = [Row(event_id=i, event_type="t", value=rnd.uniform(0, 300)) for i in range(2000)]
    b = [Row(event_id=9000 + i, event_type="t", value=rnd.uniform(100, 500)) for i in range(2000)]
    full = sketches.histogram_percentile_error(
        spark.createDataFrame(a + b), lo=0.0, hi=500.0, n_bins=50
    ).collect()
    # recompute the union estimate from separately-built bucket counts
    def buckets(rows):
        out = {}
        for r in rows:
            v = r["value"]
            k = 0 if v < 0 else (51 if v >= 500 else int(v // 10) + 1)
            out[k] = out.get(k, 0) + 1
        return out
    ba, bb = buckets(a), buckets(b)
    merged = {k: ba.get(k, 0) + bb.get(k, 0) for k in set(ba) | set(bb)}
    n = sum(merged.values())
    import math
    for r in full:
        target = math.ceil(r["p"] * n)
        cum = 0
        for k in sorted(merged):
            cum += merged[k]
            if cum >= target:
                assert abs(r["est"] - (0.0 + (k - 1) * 10.0)) < 1e-9
                break
