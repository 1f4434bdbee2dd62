"""Wave 121: perceptual-hash media near-dup and components."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import dedup, multimodal


def test_phash_stub_is_deterministic_and_60bit(spark):
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", content=b"same bytes"),
            Row(media_id=2, kind="image", content=b"same bytes"),
            Row(media_id=3, kind="image", content=b"different"),
            Row(media_id=4, kind="video", content=b"ignored"),
        ]
    )
    out = {r["media_id"]: r["phash"] for r in multimodal.image_phash(media).collect()}
    assert set(out) == {1, 2, 3}  # video rows filtered
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert all(0 <= v < (1 << 60) for v in out.values())


def test_phash_neardup_respects_hamming_threshold(spark):
    base = 0b101010101010
    rows = [
        Row(media_id=1, phash=base),
        Row(media_id=2, phash=base ^ 0b1),          # hamming 1 -> pair
        Row(media_id=3, phash=base ^ 0b111),        # hamming 3 -> pair
        Row(media_id=4, phash=base ^ 0b11111),      # hamming 5 -> no pair w/ 1
        Row(media_id=5, phash=(1 << 59) ^ base),    # far away in top band
    ]
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.phash_hamming_neardup(
            spark.createDataFrame(rows), max_hamming=3
        ).collect()
    }
    assert out[(1, 2)] == 1
    assert out[(1, 3)] == 3
    assert (1, 4) not in out
    assert out[(2, 3)] == 2  # 0b1 vs 0b111 differ in 2 bits
    # hamming(1,5)=... top-band flip + nothing else = within 3?  bit 59
    # differs by exactly 1 bit -> pair (pigeonhole still finds it: the
    # three low bands agree exactly)
    assert out[(1, 5)] == 1


def test_phash_pigeonhole_finds_every_pair_within_k(spark):
    # flip bits across DIFFERENT bands: pigeonhole guarantees discovery
    # as long as hamming <= max_hamming (one band must stay intact)
    base = (1 << 60) - 1
    rows = [
        Row(media_id=1, phash=base),
        # one flip in each of bands 0, 1, 2 (15-bit bands): hamming 3,
        # only band 3 agrees -> still found
        Row(media_id=2, phash=base ^ (1 << 0) ^ (1 << 15) ^ (1 << 30)),
    ]
    out = multimodal.phash_hamming_neardup(
        spark.createDataFrame(rows), max_hamming=3
    ).collect()
    assert len(out) == 1
    assert out[0]["hamming"] == 3


def test_phash_components_cluster_transitively(spark):
    base = 0
    rows = [
        Row(media_id=1, phash=base),
        Row(media_id=2, phash=base ^ 0b011),   # near 1 (h2) and 3 (h1)
        Row(media_id=3, phash=base ^ 0b111),   # near 2, h3 from 1
        Row(media_id=9,                        # isolated: hamming 5+ from all
            phash=(1 << 50) | (1 << 40) | (1 << 30) | (1 << 20) | (1 << 10)),
    ]
    pairs = multimodal.phash_hamming_neardup(
        spark.createDataFrame(rows), max_hamming=3
    )
    comp = {r["id"]: r["component_id"] for r in dedup.neardup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1}  # one chain, canonical = min id
