"""Wave 61: bitext mining and k-anonymity audit."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling, similarity


def test_bitext_mining_finds_planted_translation(spark):
    # group 0 vector 1 has an exact copy in group 1 (vector 101); other
    # group-1 vectors are near-orthogonal noise
    base = [1.0, 0.0, 0.5, 0.2]
    rows = (
        [Row(vec_id=1, embedding=base, label=0)]
        + [Row(vec_id=2, embedding=[0.0, 1.0, -0.5, 0.1], label=0)]
        + [Row(vec_id=101, embedding=base, label=1)]
        + [
            Row(vec_id=102 + i, embedding=[0.1 * i, -1.0, 0.3, 0.9], label=1)
            for i in range(4)
        ]
    )
    out = {
        r["a_id"]: r
        for r in similarity.bitext_mining_pairs(
            spark.createDataFrame(rows), label_a=0, label_b=1, k=2,
            margin_threshold=1.0,
        ).collect()
    }
    assert out[1]["b_id"] == 101  # the planted copy wins for vector 1
    assert out[1]["margin"] > 1.0


def test_k_anonymity_flags_small_groups_only(spark):
    rows = [Row(qa="a", qb=1) for _ in range(10)] + [
        Row(qa="b", qb=2),
        Row(qa="b", qb=2),
        Row(qa="c", qb=3),
    ]
    out = {
        (r["qa"], r["qb"]): r["group_size"]
        for r in profiling.k_anonymity_violations(
            spark.createDataFrame(rows), ["qa", "qb"], k=5
        ).collect()
    }
    assert out == {("b", 2): 2, ("c", 3): 1}


def test_ccnet_buckets_tiers_by_language(spark):
    from pyspark.sql import Row

    from rss_feed_etl_spark.operators import textstats

    # language A: three docs with increasingly rare vocabulary; language B:
    # one doc (degenerate partition -> percent_rank 0 -> head)
    rows = [
        Row(doc_id=1, lang="en", text="common common common common"),
        Row(doc_id=2, lang="en", text="common common rare1 rare2"),
        Row(doc_id=3, lang="en", text="rare3 rare4 rare5 rare6"),
        Row(doc_id=4, lang="de", text="einzig artig"),
    ]
    out = {r["doc_id"]: r for r in textstats.ccnet_ppl_buckets(spark.createDataFrame(rows)).collect()}
    assert out[1]["bucket"] == "head"      # most common vocabulary
    assert out[2]["bucket"] == "middle"
    assert out[3]["bucket"] == "tail"      # rarest vocabulary
    assert out[4]["bucket"] == "head"      # singleton language partition
    assert out[1]["logppl"] < out[3]["logppl"]
