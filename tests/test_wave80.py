"""Wave 80: revenue bridge and FK readability."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import decision_support as ds
from rss_feed_etl_spark.operators import textstats


def test_revenue_bridge_effects_sum_to_delta(spark):
    d_old = dt.date(2024, 1, 5)
    d_new = dt.date(2024, 12, 20)
    # anchor rows pin the date range
    li = [
        # brand B1: volume doubles at same price 10 -> pure volume effect
        Row(l_partkey=1, l_quantity=10.0, l_extendedprice=100.0,
            l_discount=0.0, l_shipdate=d_old),
        Row(l_partkey=1, l_quantity=20.0, l_extendedprice=200.0,
            l_discount=0.0, l_shipdate=d_new),
        # brand B2: same volume, price 10 -> 15 -> pure price effect
        Row(l_partkey=2, l_quantity=10.0, l_extendedprice=100.0,
            l_discount=0.0, l_shipdate=d_old),
        Row(l_partkey=2, l_quantity=10.0, l_extendedprice=150.0,
            l_discount=0.0, l_shipdate=d_new),
    ]
    part = [Row(p_partkey=1, p_brand="B1"), Row(p_partkey=2, p_brand="B2")]
    out = {
        r["brand"]: r
        for r in ds.revenue_bridge(
            spark.createDataFrame(li), spark.createDataFrame(part)
        ).collect()
    }
    b1 = out["B1"]
    assert b1["volume_effect"] == 100.0 and b1["price_effect"] == 0.0
    b2 = out["B2"]
    assert b2["volume_effect"] == 0.0 and b2["price_effect"] == 50.0
    for r in out.values():
        assert abs(r["volume_effect"] + r["price_effect"] - r["delta"]) < 0.01
        assert abs(r["delta"] - (r["rev_new"] - r["rev_old"])) < 0.01


def test_fk_readability_known_text(spark):
    rows = [
        Row(doc_id=1, text="The cat sat. The dog ran!"),
        Row(doc_id=2, text="unpunctuated fragment of words"),
        Row(doc_id=3, text=""),
    ]
    out = {r["doc_id"]: r for r in
           textstats.fk_readability(spark.createDataFrame(rows)).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # syllable runs: e, a, a, e, o, a  -> 6
    assert r1["n_syllables"] == 6
    expect = 0.39 * (6 / 2) + 11.8 * (6 / 6) - 15.59
    assert abs(r1["fk_grade"] - round(expect, 4)) < 1e-4
    # fragment counts as one sentence
    assert out[2]["n_sentences"] == 1
    # blank doc dropped
    assert 3 not in out


def test_fk_grade_orders_simple_vs_complex(spark):
    simple = "The cat sat on a mat. It was fun. We ran home. " * 3
    complex_ = (
        "Extraordinarily convoluted administrative prioritization "
        "necessitates organizational recalibration. " * 3
    )
    rows = [Row(doc_id=1, text=simple), Row(doc_id=2, text=complex_)]
    out = {r["doc_id"]: r["fk_grade"] for r in
           textstats.fk_readability(spark.createDataFrame(rows)).collect()}
    assert out[1] < out[2]
