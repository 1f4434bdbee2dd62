"""Wave 113: DoReMi mixture step and the data-constrained epoch planner."""

from __future__ import annotations

import math

from pyspark.sql import Row

from rss_feed_etl_spark.operators import sampling


def _mixture_corpus(spark):
    # "hard" uses 8 distinct tokens uniformly (max entropy for its size);
    # "easy" repeats one token; "mid" sits between.  Same token count per
    # domain so shares are equal and only difficulty moves the weights.
    hard = " ".join(f"w{i}" for i in range(8))
    easy = " ".join(["the"] * 8)
    mid = "a a a a b b c d"
    return spark.createDataFrame(
        [
            Row(doc_id=1, source="hard", text=hard),
            Row(doc_id=2, source="easy", text=easy),
            Row(doc_id=3, source="mid", text=mid),
        ]
    )


def test_doremi_upweights_hard_domains(spark):
    out = {
        r["source"]: r
        for r in sampling.doremi_mixture_step(
            _mixture_corpus(spark), eta=1.0, smoothing=0.1
        ).collect()
    }
    assert set(out) == {"hard", "easy", "mid"}
    # equal token counts -> equal shares
    for r in out.values():
        assert abs(r["token_share"] - 1 / 3) < 1e-6
    assert out["hard"]["entropy"] > out["mid"]["entropy"] > out["easy"]["entropy"]
    assert abs(out["hard"]["entropy"] - math.log(8)) < 1e-5
    assert out["easy"]["entropy"] == 0.0
    # only above-reference domains carry excess
    assert out["hard"]["excess"] > 0
    assert out["easy"]["excess"] == 0.0
    # the update moves weight toward the hard domain
    assert out["hard"]["weight"] > out["mid"]["weight"] >= out["easy"]["weight"]
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-4


def test_doremi_weights_are_smoothed_above_floor(spark):
    out = sampling.doremi_mixture_step(
        _mixture_corpus(spark), eta=5.0, smoothing=0.3
    ).collect()
    # smoothing/k is a hard floor no matter how extreme eta gets
    for r in out:
        assert r["weight"] >= 0.3 / 3 - 1e-6


def _budget_corpus(spark):
    # big: 64 tokens, small: 4 tokens.  sqrt-temperature gives small a
    # far larger weight than its token share, so small hits the epoch
    # cap and hands budget back to big.
    big = " ".join(f"t{i}" for i in range(64))
    small = "a b c d"
    return spark.createDataFrame(
        [
            Row(doc_id=1, source="big", text=big),
            Row(doc_id=2, source="small", text=small),
        ]
    )


def test_epoch_budget_caps_and_redistributes(spark):
    out = {
        r["source"]: r
        for r in sampling.epoch_budget_plan(
            _budget_corpus(spark), budget_multiplier=2.0, max_epochs=4.0
        ).collect()
    }
    # budget = 2 * 68 = 136 tokens; sqrt weights = 8 / (8+2), 2 / (8+2)
    assert abs(out["big"]["weight"] - 0.8) < 1e-6
    assert abs(out["small"]["weight"] - 0.2) < 1e-6
    # small desires 27.2 tokens but caps at 4 epochs * 4 tokens = 16
    assert out["small"]["capped"] is True
    assert out["small"]["realized_tokens"] == 16.0
    assert out["small"]["epochs"] == 4.0
    # big absorbs the leftover: 136 - 16 = 120, still under its cap
    assert out["big"]["capped"] is False
    assert abs(out["big"]["realized_tokens"] - 120.0) < 0.01
    assert abs(out["big"]["epochs"] - 120.0 / 64) < 1e-3
    # the plan spends the whole budget when caps allow
    total = sum(r["realized_tokens"] for r in out.values())
    assert abs(total - 136.0) < 0.01


def test_epoch_budget_all_capped_leaves_budget_unspent(spark):
    out = {
        r["source"]: r
        for r in sampling.epoch_budget_plan(
            _budget_corpus(spark), budget_multiplier=10.0, max_epochs=2.0
        ).collect()
    }
    # budget 680 >> 2-epoch capacity 136: everyone caps, nothing blows up
    for r in out.values():
        assert r["capped"] is True
        assert r["epochs"] == 2.0
