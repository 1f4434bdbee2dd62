"""Wave 95: code-switch ratio, per-source ppl z-scores, padding stats."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import packing, textstats


def test_code_switch_ratio_mixed_doc(spark):
    docs = spark.createDataFrame(
        [
            # pure English evidence: the/of/and are en-only
            Row(doc_id=1, text="the cat of the house and dog"),
            # mixed: en 'the' + de der/ist/nicht
            Row(doc_id=2, text="the der ist nicht"),
            # no lexicon evidence at all
            Row(doc_id=3, text="zzz qqq"),
        ]
    )
    out = {r.doc_id: r for r in textstats.code_switch_ratio(docs).collect()}
    assert out[1].primary_lang == "en" and out[1].other_hits == 0
    assert out[1].switch_ratio == 0.0
    assert out[2].primary_lang == "de"
    assert out[2].primary_hits == 3 and out[2].other_hits == 1
    assert out[2].switch_ratio == 0.25
    assert out[3].primary_lang == "und" and out[3].switch_ratio == 0.0


def test_logppl_zscore_flags_within_source(spark):
    # source A: nine docs of common tokens + one rare-token doc -> the
    # rare doc is A's outlier.  Source B all identical -> zero variance,
    # z pinned to 0, nothing flagged.
    rows = [Row(doc_id=i, source="A", text="common words here") for i in range(9)]
    rows.append(Row(doc_id=99, source="A", text="xylophone quixotic zephyr"))
    rows += [Row(doc_id=100 + i, source="B", text="same text") for i in range(5)]
    out = {
        r.doc_id: r
        for r in textstats.logppl_zscore_by_source(spark.createDataFrame(rows)).collect()
    }
    assert out[99].flag_outlier == 1 and out[99].z > 2.0
    assert all(out[i].flag_outlier == 0 for i in range(9))
    assert all(out[100 + i].z == 0.0 for i in range(5))


def test_context_overflow_stats_known_chunks(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s", text=" ".join(["w"] * 5)),   # 1 chunk, 3 pad
            Row(doc_id=2, source="s", text=" ".join(["w"] * 9)),   # 2 chunks, 7 pad
            Row(doc_id=3, source="s", text=""),                    # 0 chunks
            Row(doc_id=4, source="t", text=" ".join(["w"] * 8)),   # 1 chunk, 0 pad
        ]
    )
    out = {
        r.source: r
        for r in packing.context_overflow_stats(docs, seq_len=8).collect()
    }
    s = out["s"]
    assert (s.n_docs, s.n_tokens, s.n_chunks, s.pad_tokens) == (3, 14, 3, 10)
    assert s.pad_ratio == round(10 / 24, 6)
    t = out["t"]
    assert (t.n_chunks, t.pad_tokens, t.pad_ratio) == (1, 0, 0.0)
