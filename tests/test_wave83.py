"""Wave 83: language-ID entropy and Spearman rank correlation."""

from __future__ import annotations

import math

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, textstats


def test_langid_entropy_mono_vs_mixed(spark):
    mono = "the and of to in that it with as for the and of to in"
    mixed = "the and der die le la el los das und with avec para von"
    rows = [Row(doc_id=1, text=mono), Row(doc_id=2, text=mixed),
            Row(doc_id=3, text="zz qq xx")]  # no profile hits
    out = {r["doc_id"]: r for r in
           textstats.langid_entropy(spark.createDataFrame(rows)).collect()}
    assert out[1]["pred_lang"] == "en"
    assert out[1]["entropy"] < out[2]["entropy"]
    assert out[1]["margin"] > out[2]["margin"]
    assert 3 not in out  # zero hits dropped


def test_langid_entropy_bounds(spark):
    rows = [Row(doc_id=1, text="the and of with that it")]
    out = textstats.langid_entropy(spark.createDataFrame(rows)).collect()[0]
    # entropy of a 5-outcome distribution is within [0, ln 5]
    assert 0.0 <= out["entropy"] <= math.log(5) + 1e-9
    assert 0.0 <= out["margin"] <= 1.0


def test_spearman_perfect_monotone(spark):
    import datetime as dt

    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # user u has u+1 events each of value 10(u+1): count and spend are
    # perfectly co-monotone -> rho 1
    for u in range(30):
        for _ in range(u + 1):
            rows.append(Row(event_id=eid, user_id=u, value=10.0, ts=base))
            eid += 1
    out = profiling.spearman_rank_corr(spark.createDataFrame(rows)).collect()[0]
    assert out["n_units"] == 30
    assert out["rho"] == 1.0


def test_spearman_inverse_monotone(spark):
    import datetime as dt

    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # more events -> LOWER total spend (each event worth much less)
    for u in range(20):
        n = u + 1
        per = 1000.0 / (n * n)
        for _ in range(n):
            rows.append(Row(event_id=eid, user_id=u, value=per, ts=base))
            eid += 1
    out = profiling.spearman_rank_corr(spark.createDataFrame(rows)).collect()[0]
    assert out["rho"] < -0.95
