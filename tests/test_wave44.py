"""Wave 44: retrieve→rerank, bag-of-words dedup, compaction planning."""

from __future__ import annotations

from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import dedup, similarity
from rss_feed_etl_spark.sources import parquet as pq


def _emb(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=16)]) for i in range(80)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_rerank_restores_exact_order_when_candidates_cover(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 3)
    # candidate set = the WHOLE corpus -> rerank must equal exact brute force
    cands = similarity.int8_dot_topk(emb, queries, k=79)
    got = similarity.rerank_exact(emb, cands, k=5, decimals=4).collect()
    want = similarity.cosine_topk(emb, queries, k=5).collect()
    g = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got}
    w = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want}
    assert g == w


def test_rerank_output_is_candidate_subset(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 2)
    cands = similarity.int8_dot_topk(emb, queries, k=10)
    out = similarity.rerank_exact(emb, cands, k=5)
    cand_set = {(r["query_id"], r["neighbor_id"]) for r in cands.collect()}
    for r in out.collect():
        assert (r["query_id"], r["neighbor_id"]) in cand_set
    assert out.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] == 5


def test_bow_dedup_catches_word_order_shuffles(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "gamma alpha beta"),   # same multiset, different order
            (3, "alpha beta beta"),    # different multiset
            (4, "Alpha  beta   gamma"),  # case/whitespace normalize
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["n_dups"] for r in dedup.bow_fingerprint_dedup(df).collect()}
    assert out == {1: 3, 3: 1}


def test_compaction_plan_bins_respect_target(spark):
    files = spark.createDataFrame(
        [("p", f"f{i}", b) for i, b in enumerate([900, 800, 300, 250, 200, 100, 50])],
        "part string, file_id string, bytes bigint",
    )
    out = pq.plan_compaction(
        files, partition_col="part", file_col="file_id",
        bytes_col="bytes", target_bytes=1000,
    ).collect()
    bins = {}
    for r in out:
        bins.setdefault(r["bin"], []).append(r["bytes"])
    # every file assigned exactly once, bins contiguous from 0
    assert sum(len(v) for v in bins.values()) == 7
    assert set(bins) == set(range(len(bins)))
    # next-fit bound: each bin except possibly the last holds < target +
    # its largest member (the cumsum split can't overshoot by more)
    for b, sizes in bins.items():
        assert sum(sizes) < 1000 + max(sizes)
    # bin_bytes/n_bin_files agree with the grouping
    for r in out:
        assert r["bin_bytes"] == sum(bins[r["bin"]])
        assert r["n_bin_files"] == len(bins[r["bin"]])
