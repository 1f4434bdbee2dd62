"""Wave 139 goldens: Kneser-Ney bigram perplexity and term burstiness,
hand-computed on tiny frames."""

import math

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.textstats import (
    kneser_ney_bigram_ppl,
    term_burstiness_profile,
)


def test_kn_hand_computed_two_docs(spark):
    # corpus bigrams: doc1 "x y x y" -> (x,y),(y,x),(x,y); doc2 "x z"
    # c12: (x,y)=2, (y,x)=1, (x,z)=1
    # left: x: c1=3, fanout 2; y: c1=1, fanout 1
    # right: y: fanin 1; x: fanin 1; z: fanin 1; total bigram types = 3
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x y x y"), Row(doc_id=2, text="x z")]
    )
    out = {r["doc_id"]: r for r in kneser_ney_bigram_ppl(docs).collect()}
    d = 0.75

    def p(n2, c1, n1pl, n1pr, n1pt=3):
        return max(n2 - d, 0.0) / c1 + (d * n1pl / c1) * (n1pr / n1pt)

    p_xy = p(2, 3, 2, 1)
    p_yx = p(1, 1, 1, 1)
    p_xz = p(1, 3, 2, 1)
    want1 = (
        round(-math.log(p_xy), 9) * 2 + round(-math.log(p_yx), 9)
    ) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["kn_logppl"] == pytest.approx(want1, abs=1e-6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["kn_logppl"] == pytest.approx(round(-math.log(p_xz), 9), abs=1e-6)


def test_kn_short_docs_absent_and_probs_subunit(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="solo"), Row(doc_id=2, text="a b a b a")]
    )
    out = kneser_ney_bigram_ppl(docs).collect()
    assert {r["doc_id"] for r in out} == {2}
    assert out[0]["kn_logppl"] > 0  # -ln(p) with p < 1


def test_burstiness_hand_computed(spark):
    # "hot" appears 3x in doc1, 0 elsewhere (bursty);
    # "the" appears once in every doc (uniform)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the hot hot hot"),
            Row(doc_id=2, text="the calm words"),
            Row(doc_id=3, text="the other words"),
        ]
    )
    out = {r["term"]: r for r in term_burstiness_profile(docs, top=10).collect()}
    the = out["the"]
    assert (the["tf"], the["df_docs"]) == (3, 3)
    assert the["mean_per_doc"] == pytest.approx(1.0)
    assert the["vmr"] == pytest.approx(0.0)  # perfectly even
    assert the["mean_when_present"] == pytest.approx(1.0)
    hot = out["hot"]
    assert (hot["tf"], hot["df_docs"]) == (3, 1)
    # mean 1, E[x^2] = 9/3 = 3, var 2, vmr 2: bursty
    assert hot["vmr"] == pytest.approx(2.0)
    assert hot["mean_when_present"] == pytest.approx(3.0)


def test_burstiness_top_truncation_and_ties(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma") for i in range(3)]
    )
    out = term_burstiness_profile(docs, top=2).collect()
    # all tf equal -> ties break on the term: alpha, beta
    assert [r["term"] for r in sorted(out, key=lambda r: r["term"])] == [
        "alpha",
        "beta",
    ]
