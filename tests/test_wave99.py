"""Wave 99: quality keep thresholds and PRF query expansion."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import retrieval, textstats


def _doc(i, source, text):
    return Row(doc_id=i, source=source, text=text)


def test_quality_keep_threshold_budget(spark):
    # source "junk": 10 docs with strictly increasing quality (longer ->
    # higher); keep_frac=0.5 must keep the top half and report the cutoff
    docs = [
        _doc(i, "junk", "the of and to in is " * (i + 1)) for i in range(10)
    ]
    docs += [_doc(100 + i, "same", "identical words here") for i in range(4)]
    out = {
        r.source: r
        for r in textstats.quality_keep_threshold(
            spark.createDataFrame(docs), keep_frac=0.5
        ).collect()
    }
    j = out["junk"]
    assert j.n_docs == 10
    assert j.n_kept == 5 and j.kept_frac == 0.5
    # all-identical source: threshold = the single score, everything kept
    s = out["same"]
    assert s.n_docs == 4 and s.n_kept == 4 and s.kept_frac == 1.0


def test_prf_expands_with_cooccurring_terms(spark):
    # docs about "spark" consistently co-mention "shuffle"; unrelated docs
    # mention "banana".  PRF on query [spark] must surface shuffle, never
    # banana, never the query term itself, never stopwords.
    docs = [
        _doc(i, "s", f"spark shuffle executor{i % 2} the of") for i in range(8)
    ]
    docs += [_doc(100 + i, "s", "banana fruit salad bowl") for i in range(20)]
    out = retrieval.prf_query_expansion(
        spark.createDataFrame(docs), ["spark"], fb_docs=5, fb_terms=3
    ).collect()
    terms = [r.term for r in out]
    assert "shuffle" in terms
    assert "banana" not in terms and "spark" not in terms
    assert "the" not in terms and "of" not in terms
    ranks = sorted(r.rank for r in out)
    assert ranks == list(range(1, len(out) + 1))
    # scores ordered desc with deterministic term tie-break
    scores = [r.score for r in sorted(out, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)


def test_quality_keep_threshold_single_doc_source_keeps_its_doc(spark):
    """ADVICE r5: for a single-doc source any keep_frac < 1 rounded the
    drop budget up to n, so no code had cum > budget, tcode was NULL, and
    the source vanished from the output (keeping 0 docs).  The budget is
    clamped to n-1: every source emits a row and keeps >= its top doc."""
    from pyspark.sql import Row

    from rss_feed_etl_spark.operators import textstats

    rows = [
        Row(doc_id=1, source="lonely", text="a perfectly ordinary document " * 10),
    ] + [
        Row(doc_id=10 + i, source="busy", text=f"document number {i} " * (5 + i))
        for i in range(10)
    ]
    out = {
        r["source"]: r
        for r in textstats.quality_keep_threshold(
            spark.createDataFrame(rows), keep_frac=0.7
        ).collect()
    }
    assert "lonely" in out, "single-doc source dropped from the output"
    assert out["lonely"]["n_docs"] == 1
    assert out["lonely"]["n_kept"] == 1
    assert out["lonely"]["kept_frac"] == 1.0
    # IEEE 1.0-0.7 = 0.30000000000000004, so ceil(drop*10) = 4 -> 6 kept;
    # the multi-doc source is untouched by the n-1 clamp either way
    assert out["busy"]["n_kept"] == 6
