"""Wave 81: Heaps'-law curve and A/B sample-size table."""

from __future__ import annotations

import random

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, textstats


def test_heaps_curve_monotone_and_sublinear(spark):
    rnd = random.Random(13)
    vocab = [f"w{i}" for i in range(800)]
    rows = [
        Row(doc_id=i, text=" ".join(rnd.choices(vocab, k=60)))
        for i in range(200)
    ]
    out = sorted(
        textstats.heaps_law_curve(spark.createDataFrame(rows), n_buckets=10).collect(),
        key=lambda r: r["bucket"],
    )
    toks = [r["n_tokens_cum"] for r in out]
    vocs = [r["vocab_cum"] for r in out]
    assert toks == sorted(toks) and vocs == sorted(vocs)
    assert toks[-1] == 200 * 60
    assert vocs[-1] <= 800
    # vocabulary growth decelerates: second-half gain < first-half gain
    assert vocs[-1] - vocs[4] < vocs[4] - 0
    # sampling with replacement from a finite vocab: beta < 1
    b = out[0]["beta_hat"]
    assert 0 < b < 1
    assert all(r["beta_hat"] == b for r in out)


def test_heaps_vocab_counts_new_terms_once(spark):
    rows = [
        Row(doc_id=0, text="a b c"),
        Row(doc_id=1, text="a b d"),
        Row(doc_id=2, text="a e"),
        Row(doc_id=3, text="e e e"),
    ]
    out = sorted(
        textstats.heaps_law_curve(spark.createDataFrame(rows), n_buckets=4).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["vocab_cum"] for r in out] == [3, 4, 5, 5]
    assert [r["n_tokens_cum"] for r in out] == [3, 6, 8, 11]


def test_sample_size_table_scales_inverse_square(spark):
    import datetime as dt

    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for u in range(1000):
        typ = "purchase" if u % 10 == 0 else "view"  # 10% baseline
        rows.append(Row(event_id=eid, user_id=u, event_type=typ, ts=base))
        eid += 1
    out = {r["mde"]: r for r in
           profiling.ab_sample_size_table(spark.createDataFrame(rows)).collect()}
    assert abs(out[0.01]["baseline_rate"] - 0.1) < 1e-9
    # n ~ 1/mde^2: halving the MDE quadruples the requirement (ceil noise aside)
    assert abs(out[0.01]["n_per_arm"] / out[0.02]["n_per_arm"] - 4.0) < 0.01
    # closed form: 2*(1.96+0.8416)^2 * 0.09 / mde^2
    z2 = 2.0 * (1.96 + 0.8416) ** 2
    import math
    assert out[0.05]["n_per_arm"] == math.ceil(z2 * 0.1 * 0.9 / 0.0025)
    # 1000 users can't power a 1% MDE at 10% baseline; 10% MDE they can
    assert out[0.01]["feasible_now"] == 0
    assert out[0.10]["feasible_now"] == 1
