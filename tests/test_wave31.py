"""Wave-31: DSIR importance weights, int8-quantized ANN, SCD2 point-in-time
snapshot, and length-bucketed batching."""

from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import merges, packing, sampling, similarity


def test_importance_weights_prefer_target_vocabulary(spark):
    # target docs speak "alpha beta", raw-only docs speak "gamma delta":
    # a new doc in target vocabulary must outscore one in raw vocabulary
    rows = (
        [(i, "alpha beta alpha beta", 1) for i in range(10)]
        + [(100 + i, "gamma delta gamma delta", 0) for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    out = {
        r["doc_id"]: r["weight"]
        for r in sampling.importance_weights(
            docs, target_pred=F.col("tgt") == 1
        ).collect()
    }
    assert out[0] > out[100]
    assert all(out[i] == out[0] for i in range(10))


def test_importance_weights_returns_all_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x y z", 1), (2, "", 0)], "doc_id long, text string, tgt int"
    )
    out = sampling.importance_weights(docs, target_pred=F.col("tgt") == 1)
    assert out.count() == 2  # blank text still yields its '' token


def test_int8_quantize_bounds_and_scale(spark):
    emb = spark.createDataFrame(
        [(1, [0.5, -2.0]), (2, [1.0, 0.25])], "vec_id long, embedding array<float>"
    )
    rows = similarity.int8_quantize(emb).collect()
    assert all(abs(q) <= 127 for r in rows for q in r["qvec"])
    assert all(r["scale"] == 2.0 for r in rows)
    by_id = {r["vec_id"]: r["qvec"] for r in rows}
    assert by_id[1] == [32, -127]  # round(0.5/2*127)=32, round(-2/2*127)=-127


def test_int8_dot_topk_matches_exact_order_on_separated_data(spark):
    # three well-separated directions: quantized dot must rank the
    # same-direction vector first for each query
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),
        (4, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.int8_dot_topk(emb, emb.filter(F.col("vec_id").isin(0, 2)), k=1)
    top = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    assert top == {0: 1, 2: 3}


def test_scd2_snapshot_picks_interval_covering_version(spark):
    hist = spark.createDataFrame(
        [
            ("a", "v1", "2024-01-01 00:00:00", "2024-01-10 00:00:00", 0),
            ("a", "v2", "2024-01-10 00:00:00", None, 1),
            ("b", "v1", "2024-01-05 00:00:00", None, 1),
            ("c", "v1", "2024-01-01 00:00:00", "2024-01-03 00:00:00", 0),
        ],
        "link string, summary string, effective_start string, effective_end string, current_flag int",
    ).select(
        "link",
        "summary",
        F.to_timestamp("effective_start").alias("effective_start"),
        F.to_timestamp("effective_end").alias("effective_end"),
        "current_flag",
    )
    snap = {
        r["link"]: r["summary"]
        for r in merges.scd2_snapshot_at(hist, "2024-01-07 00:00:00").collect()
    }
    # a: v1 interval covers 01-07; b: open row; c: expired before 01-07
    assert snap == {"a": "v1", "b": "v1"}
    # at-most-one version per key at any instant
    for at in ["2024-01-02 00:00:00", "2024-01-10 00:00:00", "2024-02-01 00:00:00"]:
        counts = (
            merges.scd2_snapshot_at(hist, at).groupBy("link").count().collect()
        )
        assert all(r["count"] == 1 for r in counts)


def test_length_bucket_batches_layout(spark):
    docs = spark.createDataFrame(
        [(i, 10 + (i % 3)) for i in range(50)] + [(100, 1000)],
        "doc_id long, n_tokens long",
    )
    out = packing.length_bucket_batches(
        docs, token_col="n_tokens", batch_size=8
    ).collect()
    assert sum(r["n_docs"] for r in out) == 51
    assert all(r["n_docs"] <= 8 for r in out)
    assert all(0.0 <= r["pad_frac"] < 1.0 for r in out)
    assert all(r["sum_tokens"] <= r["n_docs"] * r["max_tokens"] for r in out)
    # the 1000-token doc lands alone in its own bucket with zero padding
    big = [r for r in out if r["max_tokens"] == 1000]
    assert len(big) == 1 and big[0]["n_docs"] == 1 and big[0]["pad_frac"] == 0.0


def test_length_bucket_batches_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, 5 + (i * 7) % 40) for i in range(64)], "doc_id long, n_tokens long"
    )
    a = sorted(
        map(
            tuple,
            packing.length_bucket_batches(docs, "n_tokens", batch_size=4).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            packing.length_bucket_batches(
                docs.repartition(13), "n_tokens", batch_size=4
            ).collect(),
        )
    )
    assert a == b
