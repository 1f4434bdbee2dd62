"""Wave 54: duplicate-cluster size profile."""

from __future__ import annotations

from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import dedup


def test_cluster_size_histogram_from_pairs(spark):
    # components: {1,2,3} (chain), {10,11}, singletons don't appear
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    comp = dedup.neardup_components(pairs)
    sizes = comp.groupBy("component_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    hist = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["n_droppable"])
        for r in sizes.groupBy("cluster_size")
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            (F.count("*") * F.col("cluster_size")).cast("bigint").alias("n_docs"),
            (F.count("*") * (F.col("cluster_size") - 1))
            .cast("bigint")
            .alias("n_droppable"),
        )
        .collect()
    }
    assert hist[3] == (1, 3, 2)
    assert hist[2] == (1, 2, 1)
