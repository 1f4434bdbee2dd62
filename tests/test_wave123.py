"""Wave 123: query-likelihood retrieval and click position bias."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics, retrieval


def _corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark engine"),
            Row(doc_id=2, text="spark engine " + " ".join(["pad"] * 50)),
            Row(doc_id=3, text="vector index engine"),
            Row(doc_id=4, text="nothing relevant here at all"),
        ]
    )


def test_ql_prefers_concentrated_match(spark):
    out = retrieval.query_likelihood_topk(
        _corpus(spark), ["spark"], mu=10.0, topk=10
    ).collect()
    ids = [r["doc_id"] for r in out]
    # doc 4 has no query term -> not a candidate
    assert 4 not in ids
    # doc 1: tf 3 in dl 4 beats doc 2: tf 1 in dl 52
    assert ids[0] == 1
    assert ids.index(1) < ids.index(2)


def test_ql_smoothing_penalizes_missing_terms(spark):
    # two-term query: doc 3 matches only 'vector'; its missing-'spark'
    # term still contributes the collection prior (finite, negative)
    out = {
        r["doc_id"]: r["score"]
        for r in retrieval.query_likelihood_topk(
            _corpus(spark), ["spark", "vector"], mu=10.0, topk=10
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    # all scores finite (no -inf from the zero-tf terms)
    assert all(abs(v) < 100 for v in out.values())
    # the long doc with one weak hit ranks last: its 50 pad tokens
    # dilute both the tf term and the prior
    assert out[2] == min(out.values())


def test_position_bias_decays_with_planted_drop_rule(spark):
    rows = []
    eid = 0
    for pos in range(1, 6):
        for i in range(20):
            rows.append(Row(position=pos, event_type="view"))
            # keep clicks at rate (10 - pos)/10 deterministically
            if i % 10 < 10 - pos:
                rows.append(Row(position=pos, event_type="click"))
    df = spark.createDataFrame(rows)
    out = {
        r["position"]: r
        for r in eventanalytics.click_position_bias(df).collect()
    }
    assert out[1]["impressions"] == 20
    assert out[1]["bias_vs_top"] == 1.0
    # strictly decaying ctr and bias across positions
    ctrs = [out[p]["ctr"] for p in range(1, 6)]
    assert ctrs == sorted(ctrs, reverse=True)
    assert out[5]["bias_vs_top"] < out[2]["bias_vs_top"] < 1.0


def test_position_bias_zero_impressions_guarded(spark):
    df = spark.createDataFrame(
        [Row(position=1, event_type="view"),
         Row(position=1, event_type="click"),
         Row(position=2, event_type="click")]  # clicks but no views
    )
    out = {r["position"]: r for r in eventanalytics.click_position_bias(df).collect()}
    assert out[2]["ctr"] is None
    assert out[2]["bias_vs_top"] is None
    assert out[1]["ctr"] == 1.0
