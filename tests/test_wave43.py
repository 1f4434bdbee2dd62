"""Wave 43: golden-record survivorship, incremental aggregate maintenance,
join cardinality estimation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import merges, profiling, sketches


# --- golden_record ----------------------------------------------------------


def _members(spark, rows):
    return spark.createDataFrame(
        rows, "component_id bigint, id bigint, priority int, title string, body string"
    )


def test_golden_record_picks_best_non_null_per_field(spark):
    rows = [
        # component 1: best-priority member has null title -> title comes
        # from the next-priority member; body comes from the best member
        (1, 10, 0, None, "body-curated"),
        (1, 11, 1, "title-crawl", "body-crawl"),
        (1, 12, 2, "title-old", None),
        # component 2: single member
        (2, 20, 3, "only", None),
    ]
    out = {r["component_id"]: r for r in merges.golden_record(_members(spark, rows)).collect()}
    assert out[1]["title"] == "title-crawl"
    assert out[1]["body"] == "body-curated"
    assert out[1]["n_members"] == 3
    assert out[2]["title"] == "only" and out[2]["body"] is None


def test_golden_record_tie_breaks_by_id(spark):
    rows = [(5, 51, 1, "b", "x"), (5, 50, 1, "a", "y")]
    r = merges.golden_record(_members(spark, rows)).collect()[0]
    assert r["title"] == "a"  # same priority -> smaller id wins


# --- combine_aggregates -----------------------------------------------------


def test_combine_aggregates_equals_full_recompute(spark):
    import random

    rng = random.Random(5)
    rows = [(i, f"k{i % 7}", round(rng.uniform(-10, 100), 2)) for i in range(500)]
    df = spark.createDataFrame(rows, "i bigint, k string, v double")
    old = df.filter(F.col("i") < 300)
    batch = df.filter(F.col("i") >= 300)
    old_agg = old.groupBy("k").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    got = {
        r["k"]: r
        for r in sketches.combine_aggregates(old_agg, batch, "k", "v").collect()
    }
    want = {
        r["k"]: r
        for r in df.groupBy("k").agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("v"), 2).alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.round(F.sum("v") / F.count("*"), 6).alias("mean"),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert math.isclose(got[k]["total"], want[k]["total"], abs_tol=0.02)
        assert got[k]["vmin"] == want[k]["vmin"]
        assert got[k]["vmax"] == want[k]["vmax"]


def test_combine_aggregates_new_and_stale_keys(spark):
    old_agg = spark.createDataFrame(
        [("a", 2, 10.0, 1.0, 9.0)], "k string, n bigint, total double, vmin double, vmax double"
    )
    batch = spark.createDataFrame([("b", 5.0)], "k string, v double")
    out = {r["k"]: r for r in sketches.combine_aggregates(old_agg, batch, "k", "v").collect()}
    # stale key untouched, new key appears
    assert out["a"]["n"] == 2 and out["a"]["vmax"] == 9.0
    assert out["b"]["n"] == 1 and out["b"]["vmin"] == 5.0


# --- join_cardinality_estimate ---------------------------------------------


def test_join_cardinality_exact_on_known_histogram(spark):
    # left: key 1 x3, key 2 x2; right: key 1 x4, key 3 x5
    left = spark.createDataFrame([(1,)] * 3 + [(2,)] * 2, "k bigint")
    right = spark.createDataFrame([(1,)] * 4 + [(3,)] * 5, "j bigint")
    r = profiling.join_cardinality_estimate(left, right, "k", "j").collect()[0]
    assert r["n_matching_keys"] == 1
    assert r["est_rows"] == 12  # 3*4
    assert r["max_key_rows"] == 12
    assert r["top_share"] == 1.0
    # the estimate equals the actual join size
    assert left.join(right, left.k == right.j).count() == 12
