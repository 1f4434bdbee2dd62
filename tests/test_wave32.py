"""Wave-32: count-min estimates, winnowing fingerprints, tf-idf keywords,
reciprocal-rank fusion."""

from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import retrieval, sketches, textstats


def test_countmin_never_undercounts(spark):
    rows = [(i % 7,) for i in range(200)] + [(99,)] * 50
    df = spark.createDataFrame(rows, "k long")
    out = sketches.countmin_estimates(df, "k", depth=4, width=64).collect()
    assert len(out) == 8
    assert all(r["est_n"] >= r["exact_n"] for r in out)


def test_countmin_tight_with_wide_sketch(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    out = sketches.countmin_estimates(df, "k", depth=4, width=1024).collect()
    # 5 keys in 1024 buckets × 4 rows: collision in every row is (~5/1024)^4
    assert all(r["est_n"] == r["exact_n"] for r in out)


def test_countmin_sketch_is_fixed_size(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    sk = sketches.countmin_sketch(df, "k", depth=3, width=16)
    assert sk.count() <= 3 * 16
    total = sk.agg(F.sum("n")).collect()[0][0]
    assert total == 500 * 3  # every key lands once per row


def test_winnow_shared_run_guarantees_shared_fingerprint(spark):
    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = w+k-1
    docs = spark.createDataFrame(
        [
            (1, "x1 y1 z1 " + run + " p1 q1"),
            (2, "a2 b2 c2 d2 " + run + " r2"),
            (3, "m3 n3 o3 p3 q3 r3 s3 t3 u3 v3 w3"),
        ],
        "doc_id long, text string",
    )
    fps = textstats.winnow_fingerprints(docs, k=4, w=5)
    by_doc = {
        d: {r["fp"] for r in rows}
        for d, rows in [
            (d, fps.filter(F.col("doc_id") == d).collect()) for d in (1, 2, 3)
        ]
    }
    assert by_doc[1] & by_doc[2]  # ≥ w+k-1 shared tokens ⇒ shared fingerprint
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_doc_keywords_pick_distinctive_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common quantum quantum quantum"),
            (2, "common common tensor tensor"),
            (3, "common quantum tensor filler"),
        ],
        "doc_id long, text string",
    )
    out = textstats.doc_keywords(docs, top=1, min_df=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in every doc (idf=0) so never wins
    assert top[1] == "quantum" and top[2] == "tensor"


def test_rrf_fusion_rewards_agreement(spark):
    a = spark.createDataFrame(
        [(10, 0.9), (11, 0.8), (12, 0.7)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(10, 0.5), (12, 0.6), (13, 0.4)], "doc_id long, score double"
    )
    out = retrieval.rrf_fusion([a, b], k=60, top=10).collect()
    assert out[0]["doc_id"] == 10  # rank 1 in both lists
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[10]["n_lists"] == 2 and by_id[11]["n_lists"] == 1
    assert by_id[10]["rrf_score"] > by_id[13]["rrf_score"]
