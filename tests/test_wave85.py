"""Wave 85: k-core membership via iterative peeling."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import graph


def test_kcore_keeps_clique_drops_pendant_chain(spark):
    # K4 clique {a,b,c,d} + pendant chain d-e-f: 3-core = the clique only
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),
    ]
    df = spark.createDataFrame([Row(a=x, b=y) for x, y in edges])
    out = {r["node"]: r["degree"] for r in graph.kcore_membership(df, k=3).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    # induced degree inside the core: each clique member keeps 3
    assert all(d == 3 for d in out.values())


def test_kcore_cascading_peel(spark):
    # triangle {a,b,c} where c also hangs off a path c-d, d-e:
    # 2-core peels e (deg 1), then d (deg 1 after e) -> triangle remains
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame([Row(a=x, b=y) for x, y in edges])
    out = {r["node"] for r in graph.kcore_membership(df, k=2).collect()}
    assert out == {"a", "b", "c"}


def test_kcore_empty_when_k_exceeds_density(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    df = spark.createDataFrame([Row(a=x, b=y) for x, y in edges])
    assert graph.kcore_membership(df, k=3).count() == 0


def test_kcore_duplicate_and_self_edges_ignored(spark):
    edges = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c"), ("a", "c")]
    df = spark.createDataFrame([Row(a=x, b=y) for x, y in edges])
    out = {r["node"] for r in graph.kcore_membership(df, k=2).collect()}
    assert out == {"a", "b", "c"}  # dedup: triangle; self-loop dropped


def test_kcore_skewed_star_peels_in_one_layer(spark):
    # hub with 5k leaves (degree skew 5000:1) + a K5 clique: the 3-core is
    # exactly the clique — the star strips in the first peel layer no
    # matter how hot the hub key is (the bench carries the 50k timing twin)
    from pyspark.sql import functions as F

    star = spark.range(5000).select(
        F.lit(0).cast("long").alias("a"), (F.col("id") + 10).alias("b")
    )
    clique = spark.createDataFrame(
        [(i, j) for i in range(1, 6) for j in range(1, 6) if i < j],
        "a long, b long",
    )
    out = {
        r["node"]: r["degree"]
        for r in graph.kcore_membership(star.unionAll(clique), k=3).collect()
    }
    assert out == {n: 4 for n in range(1, 6)}
