"""Round-8 ADVICE regression tests: hits_bipartite(iters=0) guard,
click_position_bias without a position-1 anchor, shingle-less eval docs
in contamination_overlap_fraction, and the risk_coverage_curve ntile
reconstruction (grain-level arithmetic must be bit-identical to the
per-row ntile it replaced).
"""

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators.eventanalytics import click_position_bias
from rss_feed_etl_spark.operators.graph import hits_bipartite
from rss_feed_etl_spark.operators.profiling import risk_coverage_curve
from rss_feed_etl_spark.operators.sampling import contamination_overlap_fraction


def test_hits_bipartite_zero_iters_raises(spark):
    edges = spark.createDataFrame([Row(src=1, dst=2)])
    with pytest.raises(ValueError, match="iters >= 1"):
        hits_bipartite(edges, iters=0)


def test_hits_bipartite_one_iter_runs(spark):
    edges = spark.createDataFrame(
        [Row(src=1, dst=10), Row(src=1, dst=11), Row(src=2, dst=10)]
    )
    rows = {r["node"]: r["authority"] for r in hits_bipartite(edges, iters=1).collect()}
    assert set(rows) == {10, 11}
    # dst 10 receives two hubs' mass, dst 11 one: 2/3 vs 1/3 after L1 norm
    assert rows[10] == pytest.approx(2 / 3, abs=1e-6)
    assert rows[11] == pytest.approx(1 / 3, abs=1e-6)


def test_click_position_bias_no_position_one_keeps_rows(spark):
    # 0-indexed positions: no row has position 1 except... none at all
    ev = spark.createDataFrame(
        [
            Row(position=0, event_type="view"),
            Row(position=0, event_type="click"),
            Row(position=2, event_type="view"),
        ]
    )
    out = {r["position"]: r for r in click_position_bias(ev).collect()}
    assert set(out) == {0, 2}  # nothing silently erased
    assert out[0]["ctr"] == pytest.approx(1.0)
    assert out[0]["bias_vs_top"] is None
    assert out[2]["bias_vs_top"] is None


def test_click_position_bias_with_anchor_unchanged(spark):
    ev = spark.createDataFrame(
        [
            Row(position=1, event_type="view"),
            Row(position=1, event_type="view"),
            Row(position=1, event_type="click"),
            Row(position=2, event_type="view"),
            Row(position=2, event_type="view"),
            Row(position=2, event_type="view"),
            Row(position=2, event_type="view"),
            Row(position=2, event_type="click"),
        ]
    )
    out = {r["position"]: r for r in click_position_bias(ev).collect()}
    assert out[1]["ctr"] == pytest.approx(0.5)
    assert out[1]["bias_vs_top"] == pytest.approx(1.0)
    assert out[2]["ctr"] == pytest.approx(0.25)
    assert out[2]["bias_vs_top"] == pytest.approx(0.5)


def test_contamination_keeps_short_eval_docs(spark):
    # doc 0 is eval (id % 10 == 0) with only 2 words < n=3: the house
    # shingle rule reduces it to ONE whole-text shingle, and it must
    # still appear in the per-eval-doc output (clean, not dropped).
    # doc 10 is eval with a leaked trigram; docs 1..3 are train.
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="too short"),
            Row(doc_id=10, text="alpha beta gamma delta"),
            Row(doc_id=1, text="alpha beta gamma unrelated tail"),
            Row(doc_id=2, text="completely different train text here"),
            Row(doc_id=3, text="x"),
        ]
    )
    out = {r["doc_id"]: r for r in contamination_overlap_fraction(docs).collect()}
    assert set(out) == {0, 10}
    z = out[0]
    assert (z["n_shingles"], z["n_hit"], z["dirty_frac"], z["is_dirty"]) == (
        1,  # the whole-text shingle "too short"
        0,
        0.0,
        False,
    )
    hit = out[10]
    assert hit["n_shingles"] == 2  # two trigrams in a 4-word doc
    assert hit["n_hit"] == 1  # "alpha beta gamma" leaks from doc 1
    assert hit["dirty_frac"] == pytest.approx(0.5)
    assert bool(hit["is_dirty"]) is True


def _ntile_reference(spark, rows, q):
    """The exact per-row ntile formulation the operator replaced."""
    df = spark.createDataFrame(rows, "confidence double, correct boolean")
    w = Window.orderBy(F.col("confidence").desc(), F.col("correct").asc())
    b = (
        df.select(
            F.ntile(q).over(w).alias("bucket"),
            (~F.col("correct")).cast("long").alias("err"),
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("m"), F.sum("err").cast("long").alias("e"))
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return b.select(
        F.round(F.col("bucket") / F.lit(float(q)), 6).alias("coverage"),
        F.sum("m").over(wc).cast("bigint").alias("n_served"),
        F.sum("e").over(wc).cast("bigint").alias("n_errors"),
        F.round(
            F.sum("e").over(wc).cast("double") / F.sum("m").over(wc).cast("double"), 6
        ).alias("selective_risk"),
    )


@pytest.mark.parametrize(
    "n,q,seed",
    [
        (100, 10, 0),  # even split
        (103, 10, 1),  # remainder buckets
        (7, 10, 2),  # fewer rows than buckets
        (250, 7, 3),  # ties spanning buckets (coarse confidence grid)
        (10, 10, 4),  # one row per bucket
    ],
)
def test_risk_coverage_matches_ntile(spark, n, q, seed):
    rng = random.Random(seed)
    # a COARSE confidence grid so tie groups span bucket boundaries
    rows = [
        (round(rng.randrange(0, 5) / 4.0, 6), rng.random() < 0.7) for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "confidence double, correct boolean")
    got = sorted(
        risk_coverage_curve(df, n_buckets=q).collect(), key=lambda r: r["coverage"]
    )
    want = sorted(_ntile_reference(spark, rows, q).collect(), key=lambda r: r["coverage"])
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_risk_coverage_no_global_per_row_window(spark):
    df = spark.createDataFrame(
        [(i / 100.0, i % 3 != 0) for i in range(100)],
        "confidence double, correct boolean",
    )
    plan = risk_coverage_curve(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "ntile" not in plan.lower()
