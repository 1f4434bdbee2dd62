"""Wave 111: per-source PII density and quality-selection cutoffs."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import sampling, textstats


def test_pii_density_counts_each_pattern(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="a",
                text="mail me at bob@example.com or sue@test.org thanks"),
            Row(doc_id=2, source="a", text="call (312) 555-0123 now"),
            Row(doc_id=3, source="b", text="ssn 123-45-6789 on file"),
            Row(doc_id=4, source="b", text="nothing sensitive here at all"),
            Row(doc_id=5, source="c", text=""),
        ]
    )
    out = {r["source"]: r for r in textstats.pii_density(df).collect()}
    assert out["a"]["n_emails"] == 2 and out["a"]["n_phones"] == 1
    assert out["a"]["n_ssns"] == 0
    assert out["b"]["n_ssns"] == 1 and out["b"]["n_emails"] == 0
    # a: 3 hits over 7+4=11 tokens
    assert out["a"]["pii_per_1k_tokens"] == round(3000.0 / 11, 6)
    assert out["c"]["n_tokens"] == 0 and out["c"]["pii_per_1k_tokens"] is None


def test_quality_cutoffs_exact_rank_semantics(spark):
    # source a: scores 0.9, 0.8, 0.7, 0.6 (n=4)
    rows = [
        Row(doc_id=i, source="a", quality=q)
        for i, q in enumerate([0.9, 0.8, 0.7, 0.6])
    ] + [Row(doc_id=10, source="b", quality=0.5)]
    df = spark.createDataFrame(rows)
    out = {
        (r["source"], r["keep_permille"]): r
        for r in sampling.quality_select_cutoffs(
            df, keep_permille=(500, 750, 1000)
        ).collect()
    }
    # ceil(4*0.5)=2 -> 2nd best = 0.8; ceil(4*0.75)=3 -> 0.7; all -> 0.6
    assert out[("a", 500)]["cutoff"] == 0.8
    assert out[("a", 750)]["cutoff"] == 0.7
    assert out[("a", 1000)]["cutoff"] == 0.6
    assert out[("a", 500)]["n_docs"] == 4
    # singleton source: every fraction keeps its only doc
    for pm in (500, 750, 1000):
        assert out[("b", pm)]["cutoff"] == 0.5


def test_quality_cutoffs_keep_at_least_fraction(spark):
    # thresholding at the cutoff keeps >= the requested fraction
    rows = [Row(doc_id=i, source="s", quality=float(i % 7) / 10) for i in range(53)]
    df = spark.createDataFrame(rows)
    out = {
        r["keep_permille"]: r["cutoff"]
        for r in sampling.quality_select_cutoffs(df, keep_permille=(300, 800)).collect()
    }
    vals = [r["quality"] for r in rows]
    for pm, cut in out.items():
        kept = sum(1 for v in vals if round(v, 6) >= cut)
        assert kept >= -(-53 * pm // 1000)  # ceil
