"""Wave 134 goldens: rank-biased overlap and the Wasserstein-1 length
shift, both hand-computed on tiny frames."""

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.profiling import wasserstein_length_shift
from rss_feed_etl_spark.operators.retrieval import rank_biased_overlap


def test_rbo_hand_computed(spark):
    # A ranks ids [1,2,3,4]; B ranks [2,1,5,3].
    # prefix intersections: d=1: 0, d=2: 2, d=3: 2, d=4: 3
    # terms (weight 2^-d): 0, (2/2)/4, (2/3)/8, (3/4)/16
    a = spark.createDataFrame(
        [Row(doc_id=1, score=4.0), Row(doc_id=2, score=3.0),
         Row(doc_id=3, score=2.0), Row(doc_id=4, score=1.0)]
    )
    b = spark.createDataFrame(
        [Row(doc_id=2, score=4.0), Row(doc_id=1, score=3.0),
         Row(doc_id=5, score=2.0), Row(doc_id=3, score=1.0)]
    )
    r = rank_biased_overlap(a, b, depth=4).collect()[0]
    assert r["depth"] == 4
    assert r["n_common"] == 3
    assert r["agreement_at_k"] == pytest.approx(0.75)
    assert r["rbo"] == pytest.approx(0.25 + round(2 / 3 / 8, 9) + 3 / 4 / 16, abs=1e-6)


def test_rbo_identical_rankings_score(spark):
    # identical lists: inter_d = d, so RBO = sum 2^-d = 1 - 2^-depth
    a = spark.createDataFrame(
        [Row(doc_id=i, score=float(10 - i)) for i in range(1, 6)]
    )
    r = rank_biased_overlap(a, a, depth=5).collect()[0]
    assert r["rbo"] == pytest.approx(1 - 2**-5)
    assert r["agreement_at_k"] == pytest.approx(1.0)


def test_rbo_tie_breaks_on_id(spark):
    # equal scores rank by id asc on both sides -> identical rankings
    a = spark.createDataFrame([Row(doc_id=i, score=1.0) for i in range(4)])
    r = rank_biased_overlap(a, a, depth=4).collect()[0]
    assert r["n_common"] == 4


def test_rbo_depth_guard(spark):
    a = spark.createDataFrame([Row(doc_id=1, score=1.0)])
    with pytest.raises(ValueError, match="62"):
        rank_biased_overlap(a, a, depth=63)


def test_wasserstein_hand_computed(spark):
    # group a lengths [1,1,3], group b lengths [3]
    # pooled: v=1 count 2, v=3 count 2 (N=4); only span v=1 -> 3 (dv=2)
    # W1(a) = |2/3 - 2/4| * 2 = 1/3 ; W1(b) = |0 - 2/4| * 2 = 1.0
    docs = spark.createDataFrame(
        [
            Row(source="a", text="x"),
            Row(source="a", text="y"),
            Row(source="a", text="p q r"),
            Row(source="b", text="u v w"),
        ]
    )
    out = {r["source"]: r for r in wasserstein_length_shift(docs).collect()}
    assert out["a"]["n_docs"] == 3
    assert out["a"]["w1_tokens"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["b"]["n_docs"] == 1
    assert out["b"]["w1_tokens"] == pytest.approx(1.0)


def test_wasserstein_identical_distributions_zero(spark):
    docs = spark.createDataFrame(
        [Row(source=s, text=t) for s in ("a", "b") for t in ("one two", "x y z w")]
    )
    out = {r["source"]: r["w1_tokens"] for r in wasserstein_length_shift(docs).collect()}
    assert out == {"a": 0.0, "b": 0.0}
