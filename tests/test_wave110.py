"""Wave 110: near-dedup decision analytics."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import dedup


def _clone_corpus(spark):
    body = " ".join(f"tok{i}" for i in range(30))
    truncated = " ".join(f"tok{i}" for i in range(24))  # 80% prefix
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=body, source="a"),
            Row(doc_id=2, text=truncated, source="b"),   # near dup of 1
            Row(doc_id=3, text=body, source="a"),        # exact clone of 1
            Row(doc_id=4, text="entirely different words " + " ".join(f"z{i}" for i in range(26)), source="c"),
        ]
    )


def test_threshold_sweep_is_monotone_nonincreasing(spark):
    df = _clone_corpus(spark)
    out = {
        r["threshold"]: r["n_pairs"]
        for r in dedup.minhash_threshold_sweep(
            df, thresholds=(0.25, 0.5, 0.9, 1.0)
        ).collect()
    }
    assert list(out) and sorted(out) == list(sorted(out))
    vals = [out[t] for t in sorted(out)]
    assert vals == sorted(vals, reverse=True), vals  # fewer pairs at higher cutoffs
    assert out[1.0] >= 1  # the exact clone agrees on every minhash
    assert out[0.25] >= out[1.0]


def test_cross_source_matrix_cells(spark):
    df = _clone_corpus(spark)
    out = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in dedup.cross_source_dup_matrix(df, threshold=0.25).collect()
    }
    assert out.get(("a", "a"), 0) >= 1       # the exact clone: diagonal
    assert out.get(("a", "b"), 0) >= 1       # the truncated mirror: off-diagonal
    assert ("c", "c") not in out and ("a", "c") not in out
    # cells are unordered: never both (a,b) and (b,a)
    assert ("b", "a") not in out
