"""Wave-37: winsorized means, n-gram diversity, FK profiling."""

from rss_feed_etl_spark.operators import joins, sketches, textstats


def test_winsorized_mean_resists_outlier(spark):
    rows = [(i, "g", 10.0) for i in range(99)] + [(99, "g", 10_000.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = sketches.winsorized_means(df).collect()[0]
    assert r["raw_mean"] > 100  # outlier wrecks the raw mean
    assert r["winsorized_mean"] < 20  # clipped mean barely moves
    assert r["n"] == 100


def test_ngram_diversity_separates_template_from_fresh(spark):
    fresh = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, "tmpl", "buy now limited offer buy now limited offer") for i in range(5)]
        + [(10 + i, "fresh", fresh) for i in range(5)],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in textstats.ngram_diversity(docs).collect()}
    assert out["fresh"]["distinct_1"] > out["tmpl"]["distinct_1"]
    assert out["fresh"]["distinct_2"] > out["tmpl"]["distinct_2"]
    assert out["tmpl"]["n_tokens"] == 40


def test_fk_profile_counts_orphans_and_fanout(spark):
    fact = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (99,)], "l_orderkey long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "o_orderkey long")
    r = joins.fk_profile(fact, dim, fk="l_orderkey", pk="o_orderkey").collect()[0]
    assert r["n_fact"] == 5 and r["n_dim"] == 3
    assert r["n_distinct_fk"] == 3
    assert r["n_orphan_facts"] == 1  # key 99 absent from dim
    assert r["max_fanout"] == 3
