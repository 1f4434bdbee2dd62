"""Wave 140 goldens: triplet margins and filtered-ANN recall."""

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.similarity import (
    filtered_ann_recall,
    triplet_margin_stats,
)


def test_triplet_margin_hand_computed(spark):
    # anchor 0 (label A at [1,0]); same-label: 1 near [1,0.1], 2 far
    # [0.5,0.8]; diff-label: 3 at [0.9,0.3], 4 at [0,1].
    # hardest positive = 2 (farthest same), hardest negative = 3
    # (nearest diff).
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0], label="A"),
            Row(vec_id=1, embedding=[1.0, 0.1], label="A"),
            Row(vec_id=2, embedding=[0.5, 0.8], label="A"),
            Row(vec_id=3, embedding=[0.9, 0.3], label="B"),
            Row(vec_id=4, embedding=[0.0, 1.0], label="B"),
        ]
    )
    out = {r["query_id"]: r for r in triplet_margin_stats(emb, n_anchors=1).collect()}
    r = out[0]
    assert r["pos_id"] == 2
    assert r["neg_id"] == 3
    assert r["triplet_margin"] == pytest.approx(r["cos_pos"] - r["cos_neg"], abs=1e-4)
    # cos(0,2) ~ 0.53, cos(0,3) ~ 0.9487 -> margin negative -> violation
    assert r["triplet_margin"] < 0
    assert bool(r["violation"]) is True


def test_triplet_clean_clusters_no_violation(spark):
    rows = []
    for i in range(4):
        rows.append(Row(vec_id=i, embedding=[10.0, 0.1 * i], label="A"))
        rows.append(Row(vec_id=i + 4, embedding=[0.1 * i, 10.0], label="B"))
    emb = spark.createDataFrame(rows)
    out = triplet_margin_stats(emb, n_anchors=4).collect()
    assert len(out) == 4
    assert all(not r["violation"] for r in out)


def test_filtered_ann_recall_perfect_when_filter_unselective(spark):
    # all same label: post-filter == pre-filter -> recall 1 everywhere
    emb = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[1.0 + 0.01 * i, 0.5 * (i % 3)], label="A")
            for i in range(20)
        ]
    )
    out = filtered_ann_recall(emb, n_queries=3, k=3, prefetch=9).collect()
    assert len(out) == 3
    for r in out:
        assert r["recall_at_k"] == pytest.approx(1.0)
        assert r["n_postfilter"] == 3


def test_filtered_ann_recall_drops_when_filter_selective(spark):
    # query 0 is label A; its nearest neighbors are a wall of B vectors,
    # while the A vectors sit far away -> the unfiltered top-prefetch
    # contains few A rows and post-filtering misses exact results
    rows = [Row(vec_id=0, embedding=[1.0, 0.0], label="A")]
    for i in range(1, 12):
        rows.append(Row(vec_id=i, embedding=[1.0, 0.001 * i], label="B"))
    for i in range(12, 18):
        rows.append(Row(vec_id=i, embedding=[0.1 * (i - 11), 1.0], label="A"))
    emb = spark.createDataFrame(rows)
    out = {r["query_id"]: r for r in filtered_ann_recall(
        emb, n_queries=1, k=3, prefetch=5
    ).collect()}
    r = out[0]
    # top-5 unfiltered are all B -> zero A rows survive the post-filter
    assert r["n_postfilter"] == 0
    assert r["recall_at_k"] == pytest.approx(0.0)
