"""Wave 115: erasure impact audit and simplified silhouette."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import clustering, profiling


def _tiny_tpch(spark):
    customer = spark.createDataFrame(
        [
            Row(c_custkey=97, c_nationkey=0),    # erased, has orders
            Row(c_custkey=194, c_nationkey=1),   # erased, NO orders
            Row(c_custkey=5, c_nationkey=0),     # kept
        ]
    )
    ts = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=97, o_orderdate=ts),
            Row(o_orderkey=2, o_custkey=97, o_orderdate=ts),
            Row(o_orderkey=3, o_custkey=5, o_orderdate=ts),
        ]
    )
    lineitem = spark.createDataFrame(
        [
            Row(l_orderkey=1, l_extendedprice=100.0, l_discount=0.1),
            Row(l_orderkey=1, l_extendedprice=50.0, l_discount=0.0),
            Row(l_orderkey=2, l_extendedprice=10.0, l_discount=0.5),
            Row(l_orderkey=3, l_extendedprice=999.0, l_discount=0.0),  # kept
        ]
    )
    nation = spark.createDataFrame(
        [
            Row(n_nationkey=0, n_name="ALPHA"),
            Row(n_nationkey=1, n_name="BETA"),
        ]
    )
    return customer, orders, lineitem, nation


def test_erasure_audit_counts_and_revenue(spark):
    customer, orders, lineitem, nation = _tiny_tpch(spark)
    out = {
        r["n_name"]: r
        for r in profiling.erasure_impact_audit(
            customer, orders, lineitem, nation, key_mod=97
        ).collect()
    }
    assert set(out) == {"ALPHA", "BETA"}
    a = out["ALPHA"]
    assert a["n_customers"] == 1
    assert a["n_orders"] == 2
    assert a["n_lineitems"] == 3
    assert abs(a["revenue_removed"] - (90.0 + 50.0 + 5.0)) < 1e-9
    # a customer with no orders still appears, zero-filled
    b = out["BETA"]
    assert (b["n_customers"], b["n_orders"], b["n_lineitems"]) == (1, 0, 0)
    assert b["revenue_removed"] == 0.0


def test_erasure_audit_explicit_key_list(spark):
    customer, orders, lineitem, nation = _tiny_tpch(spark)
    keys = spark.createDataFrame([Row(c_custkey=5)])
    out = {
        r["n_name"]: r
        for r in profiling.erasure_impact_audit(
            customer, orders, lineitem, nation, erase_keys=keys
        ).collect()
    }
    assert set(out) == {"ALPHA"}
    assert out["ALPHA"]["n_orders"] == 1
    assert out["ALPHA"]["revenue_removed"] == 999.0


def _two_blob_embeddings(spark, dim=4):
    # two tight, well-separated blobs around (0,...) and (10,...)
    rows = []
    for i in range(6):
        base = 0.0 if i % 2 == 0 else 10.0
        vec = [base + 0.01 * i] + [base] * (dim - 1)
        rows.append(Row(vec_id=i, embedding=[float(v) for v in vec]))
    return spark.createDataFrame(rows)


def test_silhouette_tight_separated_blobs_score_high(spark):
    emb = _two_blob_embeddings(spark)
    out = clustering.silhouette_by_cluster(emb, k=2, iters=1).collect()
    assert len(out) == 2
    assert sum(r["n_points"] for r in out) == 6
    for r in out:
        # far-apart tight blobs -> silhouette close to 1
        assert r["mean_silhouette"] > 0.95
        assert r["mean_a"] < 0.1


def test_silhouette_single_blob_scores_low(spark):
    # all points in one tiny blob: both centroids land inside it, so b/a
    # separation is weak and the mean silhouette stays far from 1
    rows = [
        Row(vec_id=i, embedding=[0.001 * i, 0.0, 0.0, 0.0]) for i in range(8)
    ]
    emb = spark.createDataFrame(rows)
    out = clustering.silhouette_by_cluster(emb, k=2, iters=1).collect()
    assert all(r["mean_silhouette"] < 0.9 for r in out)
