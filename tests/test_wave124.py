"""Wave 124: temperature scaling fit and length-matched pairs."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, sampling


def test_temperature_fit_recovers_overconfidence(spark):
    # logits are 3x too large for the true probabilities: labels flip
    # deterministically often near the boundary, so T>1 must win over T=1
    rows = []
    for i in range(200):
        z_true = -2.0 + 4.0 * (i / 199.0)       # true logit in [-2, 2]
        y = 1 if (z_true > 0) == (i % 10 != 0) else 0  # 10% label noise
        rows.append(Row(logit=3.0 * z_true, label=y))
    out = {r["temperature"]: r for r in profiling.temperature_scaling_fit(
        spark.createDataFrame(rows), temperatures=(0.5, 1.0, 2.0, 2.8, 4.0)
    ).collect()}
    best = [t for t, r in out.items() if r["is_best"]]
    assert len(best) == 1
    assert best[0] >= 2.0  # the fit undoes the 3x inflation
    assert out[best[0]]["nll"] <= out[1.0]["nll"]


def test_temperature_fit_extreme_logits_stay_finite(spark):
    rows = [Row(logit=100.0, label=1), Row(logit=-100.0, label=0)] * 5
    out = profiling.temperature_scaling_fit(
        spark.createDataFrame(rows), temperatures=(0.25, 1.0)
    ).collect()
    for r in out:
        assert r["nll"] is not None and r["nll"] < 25.0  # clamped, no inf/NaN


def _match_docs(spark):
    def doc(i, lang, n_tokens, ev):
        # eval iff doc_id % 10 == 0 -> choose ids accordingly
        did = i * 10 if ev else i * 10 + 1
        return Row(doc_id=did, lang=lang, text=" ".join(["w"] * n_tokens))

    return spark.createDataFrame(
        [
            doc(1, "en", 10, True),    # eval len 10
            doc(2, "en", 9, False),    # train len 9  (diff 1)
            doc(3, "en", 14, False),   # train len 14 (diff 4)
            doc(4, "en", 30, True),    # eval len 30 -> nearest 14
            doc(5, "fr", 7, True),     # eval in fr with no train -> dropped
            doc(6, "de", 5, False),    # train only, never emitted
        ]
    )


def test_length_match_picks_nearest_within_group(spark):
    out = {
        r["eval_id"]: r
        for r in sampling.length_matched_pairs(
            _match_docs(spark), group_col="lang"
        ).collect()
    }
    assert set(out) == {10, 40}  # fr eval dropped (no fr train)
    assert out[10]["train_id"] == 21     # len 9, diff 1 beats len 14 diff 4
    assert out[10]["len_diff"] == 1
    assert out[40]["train_id"] == 31     # only train at-or-below/above: 14
    assert out[40]["train_len"] == 14
    assert out[40]["len_diff"] == 16


def test_length_match_equal_distance_prefers_shorter(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=10, lang="en", text=" ".join(["w"] * 10)),  # eval
            Row(doc_id=1, lang="en", text=" ".join(["w"] * 8)),    # diff 2
            Row(doc_id=2, lang="en", text=" ".join(["w"] * 12)),   # diff 2
        ]
    )
    out = sampling.length_matched_pairs(df, group_col="lang").collect()[0]
    assert out["train_id"] == 1  # tie -> the prev (shorter) side
    assert out["len_diff"] == 2
