"""Wave 70: z-order clustering depth and Neyman allocation."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import layout, sampling


def test_depth_perfect_for_zorder_full_for_random_natural(spark):
    rnd = random.Random(11)
    rows = [
        Row(k=i, x=rnd.randrange(5_000), y=rnd.randrange(5_000))
        for i in range(10_000)
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["layout"]: r
        for r in layout.zorder_clustering_depth(
            df, "x", "y", "k", n_files=16, grid_bits=8
        ).collect()
    }
    # z-order files hold contiguous disjoint z-ranges -> depth exactly 1
    assert out["zorder"]["avg_depth"] == 1.0
    assert out["zorder"]["max_depth"] == 1
    # random natural order: every file spans ~the whole z-space
    assert out["natural"]["avg_depth"] > 12.0
    assert out["natural"]["max_depth"] == 16


def test_depth_clustered_natural_is_shallow(spark):
    # natural key == x and y follows x: natural order is ALREADY well
    # clustered on the z-curve -> depth far below the random case
    rows = [Row(k=i, x=i, y=i) for i in range(4_096)]
    df = spark.createDataFrame(rows)
    out = {
        r["layout"]: r
        for r in layout.zorder_clustering_depth(
            df, "x", "y", "k", n_files=16, grid_bits=8
        ).collect()
    }
    assert out["natural"]["avg_depth"] <= 3.0


def test_neyman_shifts_budget_to_variable_strata(spark):
    rnd = random.Random(5)
    rows = []
    # stratum 'wide': uniform 0..1000 (high sd); 'narrow': all ~500
    for i in range(500):
        rows.append(Row(doc_id=i, stratum="wide", w=rnd.randrange(1000)))
        rows.append(Row(doc_id=10_000 + i, stratum="narrow", w=500 + (i % 3)))
    df = spark.createDataFrame(rows)
    out = {
        r["stratum"]: r
        for r in sampling.neyman_allocation(
            df, "stratum", F.col("w").cast("long"), budget=100
        ).collect()
    }
    # equal sizes -> proportional split 50/50, Neyman follows sd
    assert out["wide"]["alloc_proportional"] == 50
    assert out["narrow"]["alloc_proportional"] == 50
    assert out["wide"]["alloc_neyman"] > 95
    assert out["narrow"]["alloc_neyman"] < 5
    assert out["wide"]["sd"] > 100 * out["narrow"]["sd"] / 10


def test_neyman_allocations_sum_close_to_budget(spark):
    rnd = random.Random(9)
    rows = [
        Row(doc_id=i, stratum=f"s{i % 7}", w=rnd.randrange(10, 500))
        for i in range(2_000)
    ]
    df = spark.createDataFrame(rows)
    out = sampling.neyman_allocation(
        df, "stratum", F.col("w").cast("long"), budget=1000
    ).collect()
    total = sum(r["alloc_neyman"] for r in out)
    # per-stratum rounding drifts by at most one unit per stratum
    assert abs(total - 1000) <= len(out)
    prop = sum(r["alloc_proportional"] for r in out)
    assert abs(prop - 1000) <= len(out)
