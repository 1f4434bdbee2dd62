"""Wave 103: semantic split decontamination, tokenizer fertility, and
eval-vs-train OOV skew."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import sampling, textstats


def test_semantic_contamination_flags_planted_only(spark):
    # eval vector 0 has a near-copy in train (cos ~1); eval vector 5 has
    # only dissimilar train neighbors -> exactly one flag at a high bar
    base = [1.0, 0.0, 0.5, 0.2] * 16  # 64-dim
    other = ([0.0, 1.0, -0.5, 0.1] * 16)[:64]
    near = [v + (0.001 if i % 3 == 0 else 0.0) for i, v in enumerate(base)]
    rows = [
        Row(vec_id=0, embedding=base),
        Row(vec_id=5, embedding=other),
        Row(vec_id=100, embedding=near),
        Row(vec_id=101, embedding=[0.3] * 64),
    ]
    emb = spark.createDataFrame(rows)
    ev = emb.filter(F.col("vec_id") < 10)
    tr = emb.filter(F.col("vec_id") >= 100)
    out = {
        r["eval_id"]: r
        for r in sampling.semantic_contamination(ev, tr, threshold=0.98).collect()
    }
    assert set(out) == {0}
    assert out[0]["nearest_train_id"] == 100
    assert out[0]["cosine_sim"] >= 0.99


def test_semantic_contamination_empty_when_clean(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0] * 32),
        Row(vec_id=100, embedding=[0.0, 1.0] * 32),
    ]
    emb = spark.createDataFrame(rows)
    out = sampling.semantic_contamination(
        emb.filter(F.col("vec_id") == 0),
        emb.filter(F.col("vec_id") == 100),
        threshold=0.98,
    )
    assert out.count() == 0


def test_tokenizer_fertility_known_ratios(spark):
    rows = [
        Row(lang="aa", text="ab cd"),        # 5 chars, 2 tokens
        Row(lang="aa", text="efg hij klm"),  # 11 chars, 3 tokens
        Row(lang="bb", text="xxxxxxxxxx"),   # 10 chars, 1 token
    ]
    out = {
        r["lang"]: r
        for r in textstats.tokenizer_fertility(spark.createDataFrame(rows)).collect()
    }
    assert out["aa"]["n_docs"] == 2
    assert out["aa"]["n_tokens"] == 5
    assert out["aa"]["n_chars"] == 16
    assert out["aa"]["chars_per_token"] == 3.2
    assert out["aa"]["tokens_per_doc"] == 2.5
    assert out["bb"]["chars_per_token"] == 10.0


def test_tokenizer_fertility_zero_token_lang_is_null(spark):
    """ADVICE r6: a language whose documents are all blank must yield NULL
    chars_per_token (guarded) on BOTH engines — unguarded, Spark's
    non-ANSI 0/0 gives NULL while DuckDB's IEEE division gives inf and
    the parity hash diverges."""
    rows = [Row(lang="zz", text=""), Row(lang="aa", text="ab cd")]
    out = {
        r["lang"]: r
        for r in textstats.tokenizer_fertility(spark.createDataFrame(rows)).collect()
    }
    assert out["zz"]["n_tokens"] == 0
    assert out["zz"]["chars_per_token"] is None
    assert out["zz"]["tokens_per_doc"] == 0.0
    assert out["aa"]["chars_per_token"] == 2.5


def test_split_oov_rate_counts_unseen_types(spark):
    train = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma"), Row(doc_id=2, text="alpha delta")]
    )
    ev = spark.createDataFrame(
        [Row(doc_id=10, text="alpha zeta beta unknown")]  # zeta+unknown OOV
    )
    out = textstats.split_oov_rate(train, ev).collect()[0]
    assert out["n_tokens"] == 4
    assert out["n_oov"] == 2
    assert out["oov_rate"] == 0.5


def test_video_embedding_pool_matches_hand_computation(spark):
    """Wave 105: pooled video embedding = mean of the stub's per-frame
    features, computed by hand for a 2-frame clip."""
    import hashlib

    from pyspark.sql import Row
    from rss_feed_etl_spark.operators import multimodal

    content = b"some fake video bytes"
    schema = (
        "media_id long, kind string, content binary, "
        "meta struct<format:string,width:int,height:int,duration_ms:int>"
    )
    media = spark.createDataFrame(
        [(7, "video", content, ("fake", None, None, 2000))], schema
    )
    out = multimodal.video_embedding_pool(media, every_ms=1000, dim=4).collect()
    assert len(out) == 1 and out[0]["n_frames"] == 2
    h = hashlib.md5(content).hexdigest()
    frames = [hashlib.md5(f"{h}:{i}".encode()).digest() for i in range(2)]
    want = []
    for j in range(4):
        vals = [round(f[j] / 255.0, 6) for f in frames]
        want.append(f"{round(sum(vals) / 2, 6):.6f}")
    assert out[0]["pooled"] == ",".join(want)


def test_frame_embeddings_single_frame_floor(spark):
    from pyspark.sql import Row
    from rss_feed_etl_spark.operators import multimodal

    schema = (
        "media_id long, kind string, content binary, "
        "meta struct<format:string,width:int,height:int,duration_ms:int>"
    )
    media = spark.createDataFrame(
        [(1, "video", b"x", ("fake", None, None, 300))], schema
    )
    rows = multimodal.frame_embeddings(media, every_ms=1000, dim=16).collect()
    assert {r["frame_idx"] for r in rows} == {0}  # duration < every_ms -> 1 frame
    assert len(rows) == 16
    assert all(0.0 <= r["v"] <= 1.0 for r in rows)


def test_source_scorecard_known_values(spark):
    """Wave 106: scorecard aggregates match hand computation on a tiny
    two-source corpus with one planted exact duplicate."""
    from pyspark.sql import Row
    from rss_feed_etl_spark.operators import textstats

    good = "the quick brown fox jumps over the lazy dog and then " * 6
    rows = [
        Row(doc_id=1, source="a", text=good),
        Row(doc_id=2, source="a", text="  " + good.upper() + "  "),  # exact dup of 1
        Row(doc_id=3, source="a", text="zz@@ ##!!"),                  # junk
        Row(doc_id=4, source="b", text=good),
    ]
    out = {
        r["source"]: r
        for r in textstats.source_scorecard(spark.createDataFrame(rows)).collect()
    }
    assert out["a"]["n_docs"] == 3
    assert out["a"]["dup_docs"] == 1  # doc 2 normalizes to doc 1's text
    assert out["b"]["dup_docs"] == 0
    # the good doc passes all gopher gates; the junk doc fails
    assert abs(out["b"]["keep_rate"] - 1.0) < 1e-9
    assert out["a"]["keep_rate"] < 1.0
    assert out["a"]["n_tokens"] + out["b"]["n_tokens"] > 0
    assert abs(out["a"]["token_share"] + out["b"]["token_share"] - 1.0) < 1e-5
