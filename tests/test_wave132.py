"""Wave 132: Bradley-Terry strength ranking."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import eventanalytics


def _comps(spark, rows):
    return spark.createDataFrame([Row(winner=w, loser=l) for w, l in rows])


def test_bt_transitive_chain_orders_correctly(spark):
    # A beats B 4-0, B beats C 4-0: strength A > B > C without A ever
    # meeting C
    rows = [(1, 2)] * 4 + [(2, 3)] * 4
    out = {
        r["item"]: r
        for r in eventanalytics.bradley_terry_ranks(
            _comps(spark, rows), iters=3
        ).collect()
    }
    assert out[1]["strength"] > out[2]["strength"] > out[3]["strength"]
    assert out[1]["n_wins"] == 4 and out[1]["n_matches"] == 4
    assert out[2]["n_wins"] == 4 and out[2]["n_matches"] == 8
    assert out[3]["n_wins"] == 0


def test_bt_credits_opponent_strength_over_win_rate(spark):
    # D: 2-1 against the doormat C only (67% vs weak opposition)
    # B: 6-3 against the champion A (67% vs strong opposition)
    # (D must not be undefeated: the BT MLE for an all-wins item
    # diverges, so the scenario would be ill-posed)
    rows = (
        [(2, 1)] * 6 + [(1, 2)] * 3   # B vs A
        + [(4, 3)] * 2 + [(3, 4)]      # D vs C
        + [(1, 3)] * 5                 # A crushes C (C is weak)
        + [(2, 3)] * 5                 # B crushes C too
    )
    out = {
        r["item"]: r["strength"]
        for r in eventanalytics.bradley_terry_ranks(
            _comps(spark, rows), iters=3
        ).collect()
    }
    # B beat the field's best repeatedly; D only beat the doormat.
    assert out[2] > out[4]


def test_bt_symmetric_record_equal_strength(spark):
    rows = [(1, 2)] * 5 + [(2, 1)] * 5
    out = {
        r["item"]: r["strength"]
        for r in eventanalytics.bradley_terry_ranks(_comps(spark, rows)).collect()
    }
    assert abs(out[1] - out[2]) < 1e-6
    # sum-normalized to the item count
    assert abs(sum(out.values()) - 2.0) < 1e-5


def test_bt_self_comparisons_dropped(spark):
    rows = [(1, 1)] * 10 + [(1, 2)] * 2
    out = {
        r["item"]: r
        for r in eventanalytics.bradley_terry_ranks(_comps(spark, rows)).collect()
    }
    assert out[1]["n_matches"] == 2  # the ten self-pairs never count
