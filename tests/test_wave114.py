"""Wave 114: interpolated trigram LM and UTF-8 expansion stats."""

from __future__ import annotations

import math

from pyspark.sql import Row

from rss_feed_etl_spark.operators import textstats


def test_trigram_in_domain_beats_out_of_domain(spark):
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="the cat sat on the rug"),
        ]
    )
    score = spark.createDataFrame(
        [
            Row(doc_id=10, text="the cat sat on the mat"),   # seen verbatim
            Row(doc_id=11, text="zebra quark flux vortex omega"),  # all OOV
        ]
    )
    out = {
        r["doc_id"]: r
        for r in textstats.interp_trigram_logppl(score, model=train).collect()
    }
    assert out[10]["n_trigrams"] == 4
    assert out[11]["n_trigrams"] == 3
    assert out[10]["logppl"] < out[11]["logppl"]
    # the OOV doc still gets a finite score (add-one unigram floor)
    assert math.isfinite(out[11]["logppl"])


def test_trigram_interpolation_exact_value(spark):
    # one-doc self-scored corpus: "a b c" -> single trigram, every order
    # seen exactly once, so the probability is fully hand-computable.
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    out = textstats.interp_trigram_logppl(
        df, lambdas=(0.6, 0.3, 0.1)
    ).collect()[0]
    # C3(abc)/C2(ab)=1, C2(bc)/C1(b)=1, (C1(c)+1)/(T+V)=2/6
    p = 0.6 * 1.0 + 0.3 * 1.0 + 0.1 * (2.0 / 6.0)
    assert out["n_trigrams"] == 1
    assert abs(out["logppl"] - round(-math.log(p), 6)) < 1e-6


def test_trigram_short_docs_absent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="only two"), Row(doc_id=2, text="a b c d")]
    )
    ids = {r["doc_id"] for r in textstats.interp_trigram_logppl(df).collect()}
    assert ids == {2}


def test_utf8_expansion_separates_scripts(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="plain ascii text"),
            Row(doc_id=2, lang="en", text="more ascii"),
            Row(doc_id=3, lang="zh", text="中文"),        # 2 chars, 6 bytes
            Row(doc_id=4, lang="zh", text="ok"),          # ascii doc in zh
        ]
    )
    out = {r["lang"]: r for r in textstats.utf8_expansion_by_lang(df).collect()}
    assert out["en"]["bytes_per_char"] == 1.0
    assert out["en"]["ascii_doc_share"] == 1.0
    assert out["zh"]["n_chars"] == 4
    assert out["zh"]["n_bytes"] == 8
    assert out["zh"]["bytes_per_char"] == 2.0
    assert out["zh"]["ascii_doc_share"] == 0.5
