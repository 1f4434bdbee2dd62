"""Wave 133: Chao1 vocabulary richness."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import textstats


def test_chao1_hand_checked_word_grain(spark):
    # types: a(3), b(2), c(2), d(1), e(1), f(1): V=6, N1=3, N2=2
    # chao1 = 6 + 3*2/(2*3) = 7; coverage = 1 - 3/10
    df = spark.createDataFrame([Row(doc_id=1, text="a a a b b c c d e f")])
    out = textstats.chao1_vocab_estimate(df, ngram=1).collect()[0]
    assert out["v_observed"] == 6
    assert out["n1"] == 3 and out["n2"] == 2
    assert abs(out["chao1"] - 7.0) < 1e-6
    assert abs(out["coverage"] - 0.7) < 1e-6


def test_chao1_saturated_corpus_adds_nothing(spark):
    # no singletons: the estimator believes the vocabulary is complete
    df = spark.createDataFrame([Row(doc_id=1, text="x x y y z z")])
    out = textstats.chao1_vocab_estimate(df, ngram=1).collect()[0]
    assert out["n1"] == 0
    assert out["chao1"] == float(out["v_observed"])
    assert out["coverage"] == 1.0


def test_chao1_all_singletons_bias_corrected_no_blowup(spark):
    # every type a singleton and N2=0: the bias-corrected form stays
    # finite (classic chao1 would divide by zero)
    df = spark.createDataFrame([Row(doc_id=1, text="p q r s")])
    out = textstats.chao1_vocab_estimate(df, ngram=1).collect()[0]
    assert out["n2"] == 0
    assert out["chao1"] == 4 + 4 * 3 / 2.0
    assert out["coverage"] == 0.0
