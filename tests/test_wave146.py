"""Wave 146: Ljung-Box whiteness + Hill tail-index estimator."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.textstats import hill_tail_index
from rss_feed_etl_spark.operators.timeseries import (
    daily_autocorrelation,
    ljung_box_q,
)


def _events(spark, daily_counts):
    rows = []
    eid = 0
    for d, n in enumerate(daily_counts):
        for _ in range(n):
            rows.append(Row(ts=datetime(2024, 1, 1 + d), event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def test_ljung_box_cumulates_registered_acf(spark):
    ev = _events(spark, [5, 9, 4, 10, 3, 11, 2, 12, 6, 8])
    acf = {r["lag"]: r["acf"] for r in daily_autocorrelation(ev, max_lag=4).collect()}
    out = {r["lag"]: r for r in ljung_box_q(ev, max_lag=4).collect()}
    n = 10
    cum = 0.0
    for k in sorted(out):
        assert out[k]["n_days"] == n
        assert out[k]["acf"] == acf[k]  # identical rounded r_k
        cum += round(acf[k] * acf[k] / (n - k), 9)
        assert out[k]["q_stat"] == pytest.approx(n * (n + 2) * cum, abs=1e-5)
    # an alternating series has strong lag-1 anticorrelation -> large Q
    assert out[1]["q_stat"] > 3.0


def test_ljung_box_monotone_in_lag(spark):
    ev = _events(spark, [5, 9, 4, 10, 3, 11, 2, 12])
    qs = [r["q_stat"] for r in sorted(ljung_box_q(ev, max_lag=3).collect(),
                                      key=lambda r: r["lag"])]
    assert qs == sorted(qs)  # Q cumulates squares, never decreases


def _docs_with_tail(spark):
    # trigram frequencies by construction: one hot trigram repeated, a
    # mid tier, and a long unique tail
    rows = []
    did = 0
    for _ in range(8):  # 'a b c' appears 8 times
        rows.append(Row(doc_id=did, text="a b c")); did += 1
    for i in range(4):  # 'd e f' x4
        rows.append(Row(doc_id=did, text="d e f")); did += 1
    for i in range(30):  # unique singleton trigrams
        rows.append(Row(doc_id=did, text=f"u{i} v{i} w{i}")); did += 1
    return spark.createDataFrame(rows)


def test_hill_hand_golden(spark):
    docs = _docs_with_tail(spark)
    # k=2: top-3 frequencies are 8, 4, 1 -> mean ln = (ln8+ln4)/2,
    # boundary ln1 = 0 -> alpha = 1 / ((ln8+ln4)/2)
    r = hill_tail_index(docs, k=2).collect()[0]
    assert r["n_types"] == 32
    assert r["f_k1"] == 1
    expected = 1.0 / ((round(math.log(8), 9) + round(math.log(4), 9)) / 2)
    assert r["hill_alpha"] == pytest.approx(expected, abs=1e-6)


def test_hill_flat_head_is_null(spark):
    # every trigram appears exactly once -> flat head -> guarded NULL
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"x{i} y{i} z{i}") for i in range(10)]
    )
    r = hill_tail_index(docs, k=3).collect()[0]
    assert r["hill_alpha"] is None


def test_hill_too_few_types_is_empty(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="a b c")])
    assert hill_tail_index(docs, k=5).collect() == []
