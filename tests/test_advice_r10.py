"""Round-9 VERDICT/ADVICE regression tests, landed in round 10: the
greedy-picker MAX_GREEDY_K guards, pq_ann_topk's injected-codebook shape
validation, the hashed-shingle decontamination path, and the Arrow ADC
scan's bit-equality with a hand-computed golden.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators import clustering, sampling, similarity


def _emb_df(spark, n=12, dim=4):
    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + j * 3) % 5) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_mmr_k_guard_raises(spark):
    emb = _emb_df(spark)
    with pytest.raises(ValueError, match="MAX_GREEDY_K"):
        similarity.mmr_diversified_topk(
            emb, query_id=0, k=similarity.MAX_GREEDY_K + 1
        )


def test_kcenter_k_guard_raises(spark):
    emb = _emb_df(spark)
    with pytest.raises(ValueError, match="MAX_GREEDY_K"):
        clustering.kcenter_diversity_sample(emb, k=similarity.MAX_GREEDY_K + 1)


def test_kcenter_at_small_k_still_works(spark):
    emb = _emb_df(spark, n=6)
    rows = clustering.kcenter_diversity_sample(emb, k=3).collect()
    assert len(rows) == 3


def test_pq_codebook_injection_wrong_m_raises(spark):
    emb = _emb_df(spark, n=30, dim=8)
    books = similarity.pq_train_codebooks(emb, m=4, k_codes=4, n_train=16)
    with pytest.raises(ValueError, match="subspaces"):
        similarity.pq_ann_topk(
            emb, query_id=0, m=2, k_codes=4, dim=8, codebooks=books
        )


def test_pq_codebook_injection_wrong_k_codes_raises(spark):
    emb = _emb_df(spark, n=30, dim=8)
    books = similarity.pq_train_codebooks(emb, m=4, k_codes=4, n_train=16)
    with pytest.raises(ValueError, match="codes"):
        similarity.pq_ann_topk(
            emb, query_id=0, m=4, k_codes=8, dim=8, codebooks=books
        )


def test_pq_codebook_injection_wrong_width_raises(spark):
    # hand-built books: right m and k_codes, but width 4 where serving
    # at dim=16 / m=2 expects subvector width 8
    books = [
        {c: [float(c)] * 4 for c in range(4)},
        {c: [float(c) + 0.5] * 4 for c in range(4)},
    ]
    emb16 = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(j % 3) for j in range(16)]) for i in range(20)]
    )
    with pytest.raises(ValueError, match="width"):
        similarity.pq_ann_topk(
            emb16, query_id=0, m=2, k_codes=4, dim=16, codebooks=books
        )


def test_adc_arrow_scan_matches_hand_fold(spark):
    """The Arrow ADC scan must reproduce the expression-fold semantics
    exactly: left-fold squared distances, first-occurrence argmin over
    cid-sorted codes, subspace-ordered term sum, Spark-side rounding."""
    books = [
        {0: [0.0, 0.0], 1: [1.0, 1.0]},
        {0: [2.0, 2.0], 1: [0.0, 1.0]},
    ]
    qvec = [0.5, 0.5, 1.0, 1.0]
    rows = [
        Row(id=1, vec=[0.1, 0.1, 1.9, 2.1]),  # codes (0, 0)
        Row(id=2, vec=[0.9, 1.1, 0.2, 0.9]),  # codes (1, 1)
    ]
    emb = spark.createDataFrame(rows)
    out = {
        r["vec_id"]: r["est_sqdist"]
        for r in similarity._adc_scan_arrow(
            emb, qvec, books, m=2, w=2, id_out="vec_id", decimals=6
        ).collect()
    }

    def fold(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    exp1 = fold(qvec[:2], books[0][0]) + fold(qvec[2:], books[1][0])
    exp2 = fold(qvec[:2], books[0][1]) + fold(qvec[2:], books[1][1])
    assert out == {1: round(exp1, 6), 2: round(exp2, 6)}


def test_adc_arrow_probe_mask(spark):
    """IVF-PQ path: rows outside the probed cells never leave the scan."""
    books = [{0: [0.0, 0.0], 1: [5.0, 5.0]}]
    cents = {0: [0.0, 0.0], 1: [10.0, 10.0]}
    rows = [
        Row(id=1, vec=[0.5, 0.5]),   # cell 0
        Row(id=2, vec=[9.5, 9.5]),   # cell 1 — not probed
    ]
    emb = spark.createDataFrame(rows)
    out = similarity._adc_scan_arrow(
        emb, [0.0, 0.0], books, m=1, w=2, id_out="vec_id", decimals=6,
        cents=cents, probes=[0],
    ).collect()
    assert [r["vec_id"] for r in out] == [1]


def test_decontaminate_hashed_equals_string_shingles(spark):
    """hash_shingles=True must produce the identical pair set as the raw
    string-keyed path (60-bit md5 buckets; collisions are negligible and
    absent on a toy corpus)."""
    docs = spark.createDataFrame(
        [
            Row(id=1, text="a b c d e f g h"),
            Row(id=2, text="a b c d e f x y"),
            Row(id=3, text="p q r s t u v w"),
        ]
    ).withColumn(
        "split",
        F.when(F.col("id") == 2, F.lit("test")).otherwise(F.lit("train")),
    )
    kw = dict(min_shared=3, max_df=100)
    hashed = sorted(
        tuple(r) for r in sampling.cross_split_contamination(
            docs, hash_shingles=True, **kw
        ).collect()
    )
    raw = sorted(
        tuple(r) for r in sampling.cross_split_contamination(
            docs, hash_shingles=False, **kw
        ).collect()
    )
    assert hashed == raw
    assert hashed, "planted overlap must be detected"
