"""Wave 119: contamination overlap fraction and host crawl scorecard."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import sampling, textstats


def test_contamination_fraction_detects_partial_leak(spark):
    body = " ".join(f"w{i}" for i in range(12))       # 10 trigram shingles
    half_leak = " ".join(f"w{i}" for i in range(6)) + " q1 q2 q3 q4 q5 q6"
    clean = " ".join(f"z{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            Row(doc_id=10, text=body),        # eval: fully contained in train
            Row(doc_id=20, text=half_leak),   # eval: partial overlap
            Row(doc_id=30, text=clean),       # eval: disjoint
            Row(doc_id=1, text=body),         # train copy
            Row(doc_id=3, text="other train text entirely"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in sampling.contamination_overlap_fraction(
            df, eval_mod=10, dirty_threshold=0.2
        ).collect()
    }
    assert set(out) == {10, 20, 30}
    assert out[10]["dirty_frac"] == 1.0 and out[10]["is_dirty"] is True
    assert 0.0 < out[20]["dirty_frac"] < 1.0
    assert out[30]["dirty_frac"] == 0.0 and out[30]["is_dirty"] is False
    # shingle counts: len(tokens) - 2 distinct trigrams
    assert out[10]["n_shingles"] == 10
    assert out[10]["n_hit"] == 10


def test_contamination_threshold_splits_dirty_flag(spark):
    # eval doc shares exactly 1 of its 4 shingles with train -> 0.25
    df = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b c x y z"),   # shingles: abc bcx cxy xyz
            Row(doc_id=1, text="a b c unrelated tail words"),
        ]
    )
    lo = sampling.contamination_overlap_fraction(
        df, eval_mod=10, dirty_threshold=0.3
    ).collect()[0]
    hi = sampling.contamination_overlap_fraction(
        df, eval_mod=10, dirty_threshold=0.2
    ).collect()[0]
    assert lo["dirty_frac"] == 0.25
    assert lo["is_dirty"] is False
    assert hi["is_dirty"] is True


def test_host_scorecard_dup_and_share(spark):
    df = spark.createDataFrame(
        [
            Row(url="https://A.example.com/1", text="same body"),
            Row(url="https://a.example.com/2", text="same body"),   # dup, case-host
            Row(url="https://a.example.com/3", text="unique body here"),
            Row(url="https://b.example.com/1", text="b page"),
        ]
    )
    out = {
        r["host"]: r for r in textstats.host_crawl_scorecard(df).collect()
    }
    assert set(out) == {"a.example.com", "b.example.com"}  # host lowercased
    a = out["a.example.com"]
    assert a["n_docs"] == 3
    assert a["n_unique_texts"] == 2
    assert abs(a["dup_rate"] - (1 - 2 / 3)) < 1e-6
    assert abs(a["corpus_share"] - 0.75) < 1e-6
    b = out["b.example.com"]
    assert b["dup_rate"] == 0.0
    assert b["n_tokens"] == 2
