"""Wave-12 operators: incremental batch-vs-corpus near-dup and document
chunking."""

from pyspark.sql import Row

from rss_feed_etl_spark.operators import dedup, packing


def test_incremental_neardup_finds_batch_copy(spark):
    text = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=text),
            Row(doc_id=2, text="completely different words in this other document entirely"),
        ]
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=text + " extra"),
            Row(doc_id=101, text="fresh unseen content with no match anywhere at all"),
        ]
    )
    out = dedup.incremental_minhash_pairs(corpus, batch, threshold=0.5).collect()
    assert [(r["batch_id"], r["corpus_id"]) for r in out] == [(100, 1)]
    assert out[0]["est_jaccard"] > 0.5
    # batch never pairs with itself, corpus never pairs with itself
    assert all(r["batch_id"] >= 100 and r["corpus_id"] < 100 for r in out)


def test_chunking_covers_all_tokens_with_overlap(spark):
    toks = [f"t{i}" for i in range(30)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    out = packing.chunk_documents(df, chunk_tokens=16, stride=12).collect()
    # n=30, w=16, s=12 → starts 1, 13, then final pulled back to 15
    assert [(r["chunk_idx"], r["start"], r["n_tokens"]) for r in out] == [
        (0, 1, 16),
        (1, 13, 16),
        (2, 15, 16),
    ]
    # last chunk ends exactly at the last token
    assert out[-1]["start"] + out[-1]["n_tokens"] - 1 == 30


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="just five little words here")])
    out = packing.chunk_documents(df, chunk_tokens=16, stride=12).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0 and out[0]["start"] == 1 and out[0]["n_tokens"] == 5
