"""Wave 97: embedding dim stats, char-class mix, mixture repeat factors."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, sampling, textstats


def test_embedding_dim_stats_known_values(spark):
    # dim 0: values 1..4 -> mean 2.5, p25=1 (ceil(1)), p50=2, p75=3
    # dim 1: constant 7 -> std 0, all quartiles 7
    rows = [
        Row(vec_id=i, embedding=[float(i + 1), 7.0]) for i in range(4)
    ]
    out = {r.pos: r for r in profiling.embedding_dim_stats(spark.createDataFrame(rows)).collect()}
    d0 = out[0]
    assert d0.n == 4 and d0.mean == 2.5
    assert (d0.p25, d0.p50, d0.p75) == (1.0, 2.0, 3.0)
    assert abs(d0.std - 1.118034) < 1e-6  # population std of 1..4
    d1 = out[1]
    assert d1.std == 0.0 and (d1.p25, d1.p50, d1.p75) == (7.0, 7.0, 7.0)


def test_char_class_mix_known_ratios(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="ab 12!"),   # 2 letters, 2 digits, 1 space, 1 punct
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="日本語"),    # all non-ASCII -> other
        ]
    )
    out = {r.doc_id: r for r in textstats.char_class_mix(docs).collect()}
    r1 = out[1]
    assert r1.n_chars == 6
    assert (r1.letter_ratio, r1.digit_ratio) == (round(2 / 6, 4), round(2 / 6, 4))
    assert (r1.space_ratio, r1.punct_ratio) == (round(1 / 6, 4), round(1 / 6, 4))
    assert r1.other_ratio == 0.0
    assert out[2].n_chars == 0 and out[2].letter_ratio == 0.0
    assert out[3].other_ratio == 1.0


def test_mixture_repeat_factors_flags_scarce_cells(spark):
    # source a is huge (many tokens), source b tiny: after raking to
    # uniform marginals, b's expected tokens exceed its actual tokens ->
    # repeat_factor > 1; a's is < 1
    rows = [Row(doc_id=i, source="a", lang="en", text="w " * 200) for i in range(50)]
    rows += [Row(doc_id=100 + i, source="b", lang="en", text="w w w") for i in range(5)]
    out = {
        r.source: r
        for r in sampling.mixture_repeat_factors(
            spark.createDataFrame(rows), budget_tokens=10_000
        ).collect()
    }
    assert out["a"].actual_tokens == 50 * 200
    assert out["b"].actual_tokens == 15
    assert out["b"].repeat_factor > 1.0 > out["a"].repeat_factor
    for r in out.values():
        assert abs(r.expected_tokens - r.repeat_factor * r.actual_tokens) < max(
            0.01 * r.expected_tokens, 2.0
        )
