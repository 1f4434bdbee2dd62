"""Two-stage per-query top-k (VERDICT r7 #1): the partial-rank rewrite of
the ANN family must be BIT-IDENTICAL to the single-window formulation it
replaced, on every operator that adopted it, including under adversarial
input partitioning (many partitions, skewed partitions, one partition).
"""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators.similarity import (
    _per_query_topk,
    binary_sign_ann_topk,
    cosine_topk,
    hard_negative_mining,
    int8_dot_topk,
    label_knn_accuracy,
)


def _emb(spark, n, dim=8, seed=0, labels=False, parts=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        vec = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        rows.append((i, vec, f"l{i % 3}") if labels else (i, vec))
    schema = (
        "vec_id long, embedding array<double>, label string"
        if labels
        else "vec_id long, embedding array<double>"
    )
    return spark.createDataFrame(rows, schema).repartition(parts)


def _single_window_reference(scored, k, *order_cols):
    w = Window.partitionBy("query_id").orderBy(*order_cols)
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


@pytest.mark.parametrize("parts", [1, 4, 13])
def test_helper_matches_single_window(spark, parts):
    # coarse scores force ties ACROSS partition boundaries
    rows = [
        (q, n, float((q * 7 + n) % 5)) for q in range(4) for n in range(60)
    ]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cosine_sim double"
    ).repartition(parts)
    order = (F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    got = sorted(
        _per_query_topk(scored, 6, *order).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    want = sorted(
        _single_window_reference(scored, 6, *order).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_helper_handles_null_scores_like_desc_nulls_last(spark):
    rows = [(1, 10, None), (1, 11, 0.5), (1, 12, 0.9), (1, 13, None)]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cosine_sim double"
    ).repartition(3)
    order = (F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    got = [
        (r["neighbor_id"], r["rank"])
        for r in sorted(
            _per_query_topk(scored, 3, *order).collect(), key=lambda r: r["rank"]
        )
    ]
    # desc => nulls LAST; null ties break by neighbor_id asc
    assert got == [(12, 1), (11, 2), (10, 3)]


def test_cosine_topk_unchanged_output(spark):
    emb = _emb(spark, 30, seed=1)
    q = emb.filter(F.col("vec_id") < 3)
    out = cosine_topk(emb, q, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]
        sims = [r["cosine_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert qid not in {r["neighbor_id"] for r in rows}


def test_hard_negatives_exclude_same_label(spark):
    emb = _emb(spark, 30, seed=2, labels=True)
    q = emb.filter(F.col("vec_id") < 3)
    out = hard_negative_mining(emb, q, k=5).collect()
    assert len(out) == 15
    for r in out:
        assert r["neighbor_label"] != f"l{r['query_id'] % 3}"


def test_int8_topk_ranks_by_integer_dot(spark):
    emb = _emb(spark, 25, seed=3)
    q = emb.filter(F.col("vec_id") < 2)
    out = int8_dot_topk(emb, q, k=3).collect()
    assert len(out) == 6
    for r in out:
        assert isinstance(r["dot_q"], int)


def test_binary_sign_rerank_still_candidate_bounded(spark):
    emb = _emb(spark, 40, seed=4)
    q = emb.filter(F.col("vec_id") < 2)
    out = binary_sign_ann_topk(emb, q, k=3, candidates=10, dim=8).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        assert len(rows) == 3
        sims = [r["cosine_sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_label_knn_accuracy_golden(spark):
    # 3 tight clusters: every vector's neighbors share its label, so
    # leave-one-out accuracy is 1.0 for each label
    rows = []
    for i in range(12):
        c = i % 3
        base = [10.0 * (c == d) for d in range(4)]
        vec = [b + 0.01 * (i // 3) for b in base]
        rows.append((i, vec, f"l{c}"))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).repartition(5)
    out = {r["label"]: r for r in label_knn_accuracy(emb, k=3, n_queries=12).collect()}
    assert set(out) == {"l0", "l1", "l2"}
    for r in out.values():
        assert r["n_queries"] == 4
        assert r["n_correct"] == 4
        assert r["accuracy"] == 1.0
