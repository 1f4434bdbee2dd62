"""Wave-11 operators: hard-negative mining and MAD outliers."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import similarity, sketches


def test_hard_negatives_exclude_same_label(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0], label=0),
            Row(vec_id=1, embedding=[0.99, 0.1], label=0),   # same label — excluded
            Row(vec_id=2, embedding=[0.95, 0.2], label=1),   # hardest negative
            Row(vec_id=3, embedding=[0.0, 1.0], label=1),
            Row(vec_id=4, embedding=[-1.0, 0.0], label=2),
        ]
    )
    out = similarity.hard_negative_mining(
        emb, emb.filter(F.col("vec_id") == 0), k=2
    ).collect()
    assert [r["neighbor_id"] for r in out] == [2, 3]
    assert all(r["neighbor_label"] != 0 for r in out)
    assert out[0]["rank"] == 1 and out[0]["cosine_sim"] > out[1]["cosine_sim"]


def test_mad_outliers_flags_planted_spike(spark):
    rows = [Row(event_id=i, event_type="a", value=10.0 + (i % 5) * 0.1) for i in range(100)]
    rows += [Row(event_id=1000, event_type="a", value=500.0)]
    # group b is all-identical → MAD 0 → z undefined (null), never flagged
    rows += [Row(event_id=2000 + i, event_type="b", value=7.0) for i in range(10)]
    out = sketches.mad_outliers(spark.createDataFrame(rows)).collect()
    assert [r["event_id"] for r in out] == [1000]
    assert out[0]["robust_z"] > 100
