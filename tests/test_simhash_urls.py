"""SimHash banded near-dup (exactness of the pigeonhole banding) and URL
canonicalization semantics."""

from pyspark.sql import functions as F

from rss_feed_etl_spark.functions.urls import canonical_url, url_dedup
from rss_feed_etl_spark.operators import dedup


def test_simhash_neardup_banding_is_exact(spark):
    """Banded candidates + verification must equal the brute-force answer —
    Hamming banding has no false negatives by pigeonhole."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa zzz"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa yyy"),
        (4, "completely different words entirely unrelated content here now"),
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = dedup.simhash_neardup_pairs(df, id_col="id", text_col="text", max_hamming=3)
    got_pairs = {(r.id_a, r.id_b): r.hamming for r in got.collect()}

    fps = {r.id: r.simhash for r in dedup.simhash(df, "id", "text").collect()}
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got_pairs == want
    assert got_pairs[(1, 5)] == 0  # identical docs
    assert (1, 2) in got_pairs  # one-token append stays close


def test_simhash_neardup_max_bucket_guard(spark):
    docs = spark.range(300).select(
        F.col("id"), F.lit("same text in every doc").alias("text")
    )
    assert (
        dedup.simhash_neardup_pairs(docs, id_col="id", text_col="text", max_bucket=100)
        .count()
        == 0
    )


def test_canonical_url_passes(spark):
    cases = [
        ("HTTPS://Example.COM/item/7?utm_source=feed&utm_id=3", "https://example.com/item/7"),
        ("https://example.com/item/7/", "https://example.com/item/7"),
        ("https://example.com/item/7#section", "https://example.com/item/7"),
        ("https://example.com/a?x=1&utm_medium=rss&y=2", "https://example.com/a?x=1&y=2"),
        ("https://example.com/a?utm_a=1&utm_b=2", "https://example.com/a"),
        ("https://example.com/a?fbclid=abc", "https://example.com/a"),
        ("http://Example.com/CaseSensitivePath", "http://example.com/CaseSensitivePath"),
        ("no-scheme/path/", "no-scheme/path"),
    ]
    df = spark.createDataFrame(cases, ["url", "want"])
    rows = df.select(canonical_url("url").alias("got"), "want").collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)


def test_url_dedup_collapses_variants(spark):
    rows = [
        (1, "https://x.com/a?utm_source=f"),
        (2, "https://x.com/a/"),
        (3, "HTTPS://X.com/a#frag"),
        (4, "https://x.com/b"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "link"])
    out = {r.canonical_url: r.asDict() for r in url_dedup(df).collect()}
    assert set(out) == {"https://x.com/a", "https://x.com/b"}
    assert out["https://x.com/a"]["keeper_id"] == 1
    assert out["https://x.com/a"]["n_variants"] == 3
