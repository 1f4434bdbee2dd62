"""Wave 145: bloom-filter sizing planner + truncation token-loss curve."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.packing import truncation_loss_curve
from rss_feed_etl_spark.operators.sketches import bloom_filter_plan


def test_bloom_plan_hand_golden(spark):
    # 3 distinct keys; r=8 -> k = round(8 ln2) = 6, m = 24 bits = 3 bytes,
    # fpr = (1 - e^(-6/8))^6
    ev = spark.createDataFrame(
        [Row(user_id=u) for u in (1, 2, 2, 3, 3, 3)]
    )
    out = {
        r["bits_per_key"]: r
        for r in bloom_filter_plan(ev, bits_per_key=(8, 16)).collect()
    }
    r8 = out[8]
    assert r8["n_keys"] == 3
    assert r8["k_hashes"] == 6
    assert r8["m_bits"] == 24
    assert r8["filter_bytes"] == 3
    base = round(1.0 - math.exp(-6 / 8), 9)
    assert r8["fpr"] == pytest.approx(base**6, abs=1e-6)
    # more bits -> strictly lower fpr
    assert out[16]["fpr"] < r8["fpr"]
    assert out[16]["k_hashes"] == 11  # round(16 ln2) = 11


def test_truncation_loss_hand_golden(spark):
    # lens 2, 5, 10; cutoff 4 -> docs 5 and 10 truncated, lost (1 + 6) = 7
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b"),
            Row(doc_id=1, text="a b c d e"),
            Row(doc_id=2, text=" ".join("x" * 1 for _ in range(10))),
        ]
    )
    out = {
        r["cutoff"]: r for r in truncation_loss_curve(docs, cutoffs=(4, 100)).collect()
    }
    r4 = out[4]
    assert r4["n_docs"] == 3 and r4["n_truncated"] == 2
    assert r4["tokens_total"] == 17 and r4["tokens_lost"] == 7
    assert r4["frac_tokens_lost"] == pytest.approx(7 / 17, abs=1e-6)
    # a cutoff beyond the longest doc loses nothing
    assert out[100]["tokens_lost"] == 0
    assert out[100]["frac_docs_truncated"] == 0.0


def test_truncation_counts_blank_docs(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=""), Row(doc_id=1, text="a b c")]
    )
    r = truncation_loss_curve(docs, cutoffs=(2,)).collect()[0]
    assert r["n_docs"] == 2  # blank doc included at length 0
    assert r["tokens_total"] == 3 and r["tokens_lost"] == 1
