"""Wave 138 goldens: query clarity and retrieval source entropy."""

import math

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.retrieval import (
    query_clarity_score,
    retrieval_source_entropy,
)


def _docs(spark):
    # 4 docs mentioning "query"; topical docs share a distinctive
    # trigram tail, background docs are generic
    rows = [
        Row(doc_id=1, source="a", text="query alpha beta gamma delta"),
        Row(doc_id=2, source="a", text="query alpha beta gamma epsilon"),
        Row(doc_id=3, source="b", text="query common filler words here"),
        Row(doc_id=4, source="b", text="other common filler words here"),
        Row(doc_id=5, source="c", text="unrelated background text body"),
    ]
    return spark.createDataFrame(rows)


def test_clarity_positive_and_bounded(spark):
    r = query_clarity_score(_docs(spark), ["query"], fb_docs=2).collect()[0]
    assert r["n_fb_docs"] == 2
    assert r["fb_types"] > 0 and r["fb_tokens"] > 0
    # KL >= 0 always; > 0 here because the feedback LM concentrates on
    # the alpha/beta/gamma trigrams absent from the background
    assert r["clarity_nats"] > 0.0


def test_clarity_zero_when_feedback_is_whole_corpus(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="one two three"),
            Row(doc_id=2, source="a", text="one two three"),
        ]
    )
    r = query_clarity_score(docs, ["one"], fb_docs=2).collect()[0]
    # feedback set == corpus -> identical LMs -> KL exactly 0
    assert r["clarity_nats"] == pytest.approx(0.0)


def test_source_entropy_hand_computed(spark):
    # "query" hits docs 1,2 (src a) and 3 (src b): shares 2/3, 1/3
    r = retrieval_source_entropy(_docs(spark), ["query"], topk=3).collect()[0]
    assert r["n_results"] == 3
    assert r["n_sources"] == 2
    assert r["majority_share"] == pytest.approx(2 / 3, abs=1e-6)
    want = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert r["source_entropy_nats"] == pytest.approx(want, abs=1e-6)


def test_source_entropy_single_source_zero(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="only", text="hit words here") for i in range(4)]
    )
    r = retrieval_source_entropy(docs, ["hit"], topk=4).collect()[0]
    assert r["source_entropy_nats"] == pytest.approx(0.0)
    assert r["majority_share"] == pytest.approx(1.0)
