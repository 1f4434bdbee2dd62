"""Wave 100: negative-sampling table and MMR diversification."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import similarity, textstats


def test_negative_sampling_table_known_distribution(spark):
    # counts: a=16, b=1 -> weights 16^0.75=8, 1 -> probs 8/9, 1/9
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(["a"] * 16 + ["b"]))]
    )
    out = {
        r.term: r
        for r in textstats.negative_sampling_table(docs, vocab_size=10).collect()
    }
    assert out["a"].rank == 1 and out["a"].n == 16
    assert abs(out["a"].prob - 8 / 9) < 1e-9
    assert abs(out["b"].prob - 1 / 9) < 1e-9
    assert abs(out["b"].cum_prob - 1.0) < 1e-9
    assert out["a"].cum_prob == out["a"].prob


def test_mmr_prefers_diverse_over_redundant(spark):
    # query q; candidates: x1, x2 nearly identical to each other and very
    # relevant; y somewhat relevant but orthogonal to x1/x2.  Top-2 by
    # relevance alone = {x1, x2}; MMR must pick y second.
    def vec(a, b):
        return [float(a), float(b)] + [0.0] * 62

    rows = [
        Row(vec_id=0, embedding=vec(1.0, 0.0)),       # query
        Row(vec_id=1, embedding=vec(0.9, 0.1)),       # x1 (most relevant)
        Row(vec_id=2, embedding=vec(0.9, 0.1)),       # x2 (exact duplicate of x1)
        Row(vec_id=3, embedding=vec(0.6, -0.6)),      # y (relevant AND diverse)
    ]
    out = similarity.mmr_diversified_topk(
        spark.createDataFrame(rows), query_id=0, k=3, candidates=3, lam=0.5
    ).collect()
    order = [r.vec_id for r in sorted(out, key=lambda r: r.mmr_rank)]
    assert order[0] == 1          # pure relevance first
    assert order[1] == 3          # diversity beats the near-duplicate
    assert order[2] == 2
    ranks = sorted(r.mmr_rank for r in out)
    assert ranks == [1, 2, 3]
