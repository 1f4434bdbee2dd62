"""Wave 120: NPMI topic coherence and vocab-prune impact."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import textstats


def test_coherence_separates_topical_from_scattered(spark):
    # coherent: the same 3 terms travel together in every doc
    coherent = [
        Row(doc_id=i, source="topic", text=f"alpha beta gamma filler{i}")
        for i in range(6)
    ]
    # scattered: three terms that NEVER co-occur
    scattered = []
    for i in range(6):
        term = ["alpha", "beta", "gamma"][i % 3]
        scattered.append(
            Row(doc_id=100 + i, source="noise",
                text=f"{term} filler{i} extra{i}")
        )
    df = spark.createDataFrame(coherent + scattered)
    out = {
        r["source"]: r
        for r in textstats.npmi_topic_coherence(df, top_terms=3).collect()
    }
    # in 'topic', the top-3 terms are alpha/beta/gamma (df=6 each), all
    # pairs co-occur in every doc -> +1 by the degenerate-pole convention
    assert out["topic"]["coherence"] == 1.0
    assert out["topic"]["n_pairs"] == 3
    # in 'noise', top terms never co-occur -> every pair is -1
    assert out["noise"]["coherence"] == -1.0


def test_coherence_middle_ground_is_bounded(spark):
    rows = [
        Row(doc_id=1, source="s", text="a b x1 pad"),
        Row(doc_id=2, source="s", text="a b x2 pad"),
        Row(doc_id=3, source="s", text="a x3 pad filler"),
        Row(doc_id=4, source="s", text="b x4 pad filler"),
    ]
    out = textstats.npmi_topic_coherence(
        spark.createDataFrame(rows), top_terms=3
    ).collect()[0]
    assert -1.0 <= out["coherence"] <= 1.0


def test_vocab_prune_monotone_in_threshold(spark):
    rows = [
        Row(doc_id=i, text="common common rare" + str(i)) for i in range(10)
    ]
    out = {
        r["min_count"]: r
        for r in textstats.vocab_prune_impact(
            spark.createDataFrame(rows), min_counts=(2, 5, 100)
        ).collect()
    }
    # 'common' appears 20x; each 'rareN' once -> 11 types
    assert out[2]["vocab_before"] == 11
    assert out[2]["vocab_after"] == 1
    assert out[100]["vocab_after"] == 0
    # tightening the threshold can only shrink the vocab and grow the cost
    assert (
        out[2]["vocab_after"] >= out[5]["vocab_after"] >= out[100]["vocab_after"]
    )
    assert (
        out[2]["pruned_token_share"]
        <= out[5]["pruned_token_share"]
        <= out[100]["pruned_token_share"]
    )
    assert (
        out[2]["length_inflation"]
        <= out[5]["length_inflation"]
        <= out[100]["length_inflation"]
    )
    # keeping everything above count-2: 20 kept occurrences + 10 pruned
    # singletons re-tokenized to ~5-6 chars each
    assert out[2]["length_inflation"] > 1.0


def test_vocab_prune_no_pruning_is_identity(spark):
    rows = [Row(doc_id=1, text="a b c a")]
    out = textstats.vocab_prune_impact(
        spark.createDataFrame(rows), min_counts=(1,)
    ).collect()[0]
    assert out["pruned_token_share"] == 0.0
    assert out["length_inflation"] == 1.0
    assert out["vocab_before"] == out["vocab_after"] == 3
