"""Wave 128: posting-list compression plan and LSH parameter plan."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import dedup, retrieval


def test_postinglist_dense_term_prefers_bitmap(spark):
    # 'common' is in every doc (gap 1 postings); 'rare' in one doc
    rows = [
        Row(doc_id=i, text="common" + (" rare" if i == 0 else ""))
        for i in range(64)
    ]
    out = retrieval.postinglist_compression_plan(
        spark.createDataFrame(rows), n_buckets=2
    ).collect()
    by_bucket = {r["df_bucket"]: r for r in out}
    assert len(by_bucket) == 2
    lo, hi = by_bucket[1], by_bucket[2]
    # the rare bucket: one posting for the universe of 64 -> bitmap awful
    assert lo["bitmap_bits"] > lo["varint_bits"]
    assert lo["best_encoding"] in ("varint", "elias_fano")
    # the dense bucket: 64 postings over universe 64 -> bitmap = 1 bit
    assert hi["bitmap_bits"] == 1.0
    assert hi["best_encoding"] == "bitmap"


def test_postinglist_varint_bits_hand_checked(spark):
    # single doc, single term: gap = doc - (-1) = 1 -> bin length 1 ->
    # ceil(1/7)*8 = 8 bits
    out = retrieval.postinglist_compression_plan(
        spark.createDataFrame([Row(doc_id=0, text="only")]), n_buckets=1
    ).collect()[0]
    assert out["n_postings"] == 1
    assert out["varint_bits"] == 8.0


def test_lsh_plan_monotone_tradeoff_and_best(spark):
    out = {
        (r["bands"], r["rows"]): r
        for r in dedup.lsh_param_plan(spark, threshold=0.5).collect()
    }
    # more rows at fixed hash budget -> sharper curve -> lower FP area
    assert out[(2, 16)]["fp_area"] < out[(16, 2)]["fp_area"]
    # ...but higher FN area (misses borderline pairs)
    assert out[(2, 16)]["fn_area"] > out[(16, 2)]["fn_area"]
    best = [k for k, r in out.items() if r["is_best"]]
    assert len(best) == 1
    # the winner's cost really is the minimum
    assert out[best[0]]["cost"] == min(r["cost"] for r in out.values())
    for r in out.values():
        assert abs(r["cost"] - round(r["fp_area"] + r["fn_area"], 6)) < 1e-9


def test_lsh_plan_threshold_moves_costs(spark):
    lo = {
        (r["bands"], r["rows"]): r["fp_area"]
        for r in dedup.lsh_param_plan(spark, threshold=0.3).collect()
    }
    hi = {
        (r["bands"], r["rows"]): r["fp_area"]
        for r in dedup.lsh_param_plan(spark, threshold=0.7).collect()
    }
    # raising the target threshold reclassifies more of the curve as FP
    for k in lo:
        assert hi[k] >= lo[k]
