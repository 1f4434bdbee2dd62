"""Wave 79: weighted percentiles and source Jaccard matrix."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import dedup, sketches


def test_weighted_percentiles_known_cdf(spark):
    # values 10 (weight 50), 20 (weight 30), 30 (weight 20): W=100
    # wp50 -> first v with cum >= 50 is 10; wp90 -> 30; wp99 -> 30
    rows = []
    i = 0
    for v, w in [(10.0, 50), (20.0, 30), (30.0, 20)]:
        rows.append(Row(l_orderkey=i, l_extendedprice=v, l_quantity=float(w)))
        i += 1
    out = sketches.weighted_percentiles(spark.createDataFrame(rows)).collect()[0]
    assert out["w_total"] == 100
    assert out["wp50"] == 10
    assert out["wp90"] == 30
    assert out["wp99"] == 30


def test_weighted_vs_unweighted_disagree(spark):
    # many cheap rows with huge weight vs few expensive rows with tiny
    # weight: unweighted median is high, weighted median stays low
    rows = [Row(l_orderkey=0, l_extendedprice=5.0, l_quantity=1000.0)]
    rows += [
        Row(l_orderkey=i, l_extendedprice=500.0, l_quantity=1.0)
        for i in range(1, 100)
    ]
    out = sketches.weighted_percentiles(spark.createDataFrame(rows)).collect()[0]
    assert out["wp50"] == 5  # weight mass sits on the cheap value
    assert out["wp99"] == 500


def test_source_jaccard_identical_vs_disjoint(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta " * 3
    rows = (
        [Row(doc_id=i, source="s1", text=shared) for i in range(3)]
        + [Row(doc_id=10 + i, source="s2", text=shared) for i in range(3)]
        + [Row(doc_id=20 + i, source="s3",
               text="one two three four five six seven eight " * 3)
           for i in range(3)]
    )
    out = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in dedup.source_jaccard_matrix(spark.createDataFrame(rows)).collect()
    }
    # identical shingle sets -> all signature components agree
    assert out[("s1", "s2")] == 1.0
    # disjoint vocabularies -> (near) zero agreement
    assert out[("s1", "s3")] < 0.2
    assert out[("s2", "s3")] < 0.2
    assert len(out) == 3  # each unordered pair once


def test_source_signature_is_merge_of_docs(spark):
    # source signature == elementwise min over per-doc signatures:
    # adding a doc can only LOWER agreement-relevant mins, never raise
    base = [Row(doc_id=1, source="s", text="a b c d e f g h i j")]
    more = base + [Row(doc_id=2, source="s", text="k l m n o p q r s t")]
    sig1 = dedup.source_jaccard_matrix(
        spark.createDataFrame(base + [Row(doc_id=9, source="z", text="a b c d e f g h i j")])
    ).collect()[0]
    sig2 = dedup.source_jaccard_matrix(
        spark.createDataFrame(more + [Row(doc_id=9, source="z", text="a b c d e f g h i j")])
    ).collect()[0]
    # s == z initially (1.0); adding disjoint docs to s dilutes the match
    assert sig1["est_jaccard"] == 1.0
    assert sig2["est_jaccard"] < 1.0
