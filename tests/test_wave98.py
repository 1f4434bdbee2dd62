"""Wave 98: incremental histogram fold and token Gini."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row

from rss_feed_etl_spark.operators import sketches, textstats


def test_histogram_fold_equals_one_shot(spark):
    schema = "event_id long, value double"
    old = spark.createDataFrame([(i, float(v)) for i, v in enumerate([5, 105, 499.99, 600])], schema)
    batch = spark.createDataFrame([(10, 5.005), (11, -3.0), (12, 105.0)], schema)
    old_hist = sketches.incremental_histogram_fold(
        spark.createDataFrame([], "bucket bigint, n bigint, total double"),
        old,
    )
    folded = {
        r.bucket: r
        for r in sketches.incremental_histogram_fold(old_hist, batch).collect()
    }
    want = {
        r.bucket: r
        for r in sketches.incremental_histogram_fold(
            spark.createDataFrame([], "bucket bigint, n bigint, total double"),
            old.unionAll(batch),
        ).collect()
    }
    assert set(folded) == set(want)
    for b in want:
        assert folded[b].n == want[b].n
        assert folded[b].total == want[b].total
        assert folded[b].total_exact == want[b].total_exact
    # structural expectations: underflow bucket 0 (-3), overflow 21 (600)
    assert folded[0].n == 1 and folded[21].n == 1
    # 2dp-boundary value folded exactly (decimal accumulator, not display)
    assert folded[1].total_exact == Decimal("10.0050000000")


def test_token_gini_uniform_vs_concentrated(spark):
    # uniform source: 4 types x 1 occurrence -> G = (2*(1+2+3+4))/(4*4) - 5/4 = 0
    # concentrated: counts [1, 9]: G = (2*(1*1 + 2*9))/(2*10) - 3/2 = 0.4
    docs = [
        Row(doc_id=1, source="uni", text="a b c d"),
        Row(doc_id=2, source="conc", text=" ".join(["x"] * 9 + ["y"])),
    ]
    out = {
        r.source: r
        for r in textstats.token_gini_by_source(spark.createDataFrame(docs)).collect()
    }
    assert out["uni"].n_types == 4 and out["uni"].n_tokens == 4
    assert out["uni"].gini == 0.0
    assert out["conc"].n_types == 2 and out["conc"].n_tokens == 10
    assert out["conc"].gini == 0.4
