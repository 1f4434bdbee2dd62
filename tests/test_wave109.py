"""Wave 109: vocabulary OOV curve and crawl-fragment stitching."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import dedup, textstats


def test_vocab_oov_curve_hand_example(spark):
    # corpus: 'a' x5, 'b' x3, 'c' x1, 'd' x1 -> total 10 occ, 4 types
    df = spark.createDataFrame(
        [Row(text="a a a b b"), Row(text="a a b c d")]
    )
    out = {
        r["vocab_size"]: r
        for r in textstats.vocab_oov_curve(df, sizes=(1, 2, 10)).collect()
    }
    assert out[1]["n_types"] == 1 and out[1]["oov_rate"] == 0.5  # 'a' covers 5/10
    assert out[2]["n_types"] == 2 and out[2]["oov_rate"] == 0.2  # +'b' covers 8/10
    assert out[10]["n_types"] == 4 and out[10]["oov_rate"] == 0.0
    assert all(r["total_types"] == 4 for r in out.values())


def test_vocab_oov_curve_tie_break_is_alphabetical(spark):
    # 'x' and 'y' tie at 2: size-1 vocab must pick 'x' (count desc, tok asc)
    df = spark.createDataFrame([Row(text="x y x y")])
    out = {
        r["vocab_size"]: r
        for r in textstats.vocab_oov_curve(df, sizes=(1,)).collect()
    }
    assert out[1]["oov_rate"] == 0.5


def test_chunk_stitch_recovers_planted_split(spark):
    body = " ".join(f"w{i}" for i in range(20))
    w = body.split()
    a = " ".join(w[: 10 + 4])   # first half + 4-token overlap
    b = " ".join(w[10:])        # second half
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=a),
            Row(doc_id=2, text=b),
            Row(doc_id=3, text="totally unrelated content with enough tokens here"),
        ]
    )
    rows = dedup.chunk_stitch_pairs(df, k=4).collect()
    assert [(r["prev_id"], r["next_id"]) for r in rows] == [(1, 2)]
    assert rows[0]["boundary"] == " ".join(w[10:14])


def test_chunk_stitch_hot_boundary_guard(spark):
    # 30 docs all OPENING with the same 4 tokens: with max_df=5 the
    # boundary is template and produces no pairs; unguarded it would
    # pair every tail-matching doc against all 30 heads
    tmpl = "the same four tokens"
    docs = [Row(doc_id=i, text=f"{tmpl} body{i} x y z") for i in range(30)]
    docs.append(Row(doc_id=99, text=f"some document ending with {tmpl}"))
    df = spark.createDataFrame(docs)
    guarded = dedup.chunk_stitch_pairs(df, k=4, max_df=5).collect()
    assert guarded == []
    unguarded = dedup.chunk_stitch_pairs(df, k=4, max_df=None).collect()
    assert len(unguarded) == 30  # doc 99's tail matches all 30 heads


def test_chunk_stitch_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="a b c")]
    )
    assert dedup.chunk_stitch_pairs(df, k=4).collect() == []
