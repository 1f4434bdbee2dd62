"""Wave 59: Matryoshka truncation eval and int8 quantization error."""

from __future__ import annotations

import math

from pyspark.sql import Row

from rss_feed_etl_spark.operators import similarity


def test_matryoshka_identical_prefix_vectors_have_zero_error(spark):
    # vectors identical in the first 4 dims and beyond -> truncated cosine
    # equals full cosine equals 1.0, so the error is exactly 0
    v = [float(i % 3 + 1) for i in range(8)]
    rows = [Row(vec_id=i, embedding=v) for i in range(5)]
    out = {
        r["dim"]: r
        for r in similarity.matryoshka_truncation_eval(
            spark.createDataFrame(rows), dims=(2, 4)
        ).collect()
    }
    assert out[2]["n_pairs"] == 4 and out[4]["n_pairs"] == 4
    assert out[2]["mean_abs_err"] == 0.0
    assert out[2]["mean_trunc_cosine"] == 1.0


def test_matryoshka_detects_tail_divergence(spark):
    # two vectors equal in dims 1-2, opposite in dims 3-4: truncated-2
    # cosine is 1.0, full cosine is 0.0 -> error 1.0 at dim 2
    a = [1.0, 1.0, 1.0, 1.0]
    b = [1.0, 1.0, -1.0, -1.0]
    rows = [Row(vec_id=1, embedding=a), Row(vec_id=2, embedding=b)]
    out = {
        r["dim"]: r
        for r in similarity.matryoshka_truncation_eval(
            spark.createDataFrame(rows), dims=(2, 4)
        ).collect()
    }
    assert out[2]["mean_abs_err"] == 1.0
    assert out[4]["mean_abs_err"] == 0.0


def test_int8_quantization_error_known_vector(spark):
    # v = [127 values] scale = 1.0: quantization is exact -> mse 0
    exact = [float(x) for x in range(-127, 127, 4)]  # 64 ints in [-127, 123]
    rows = [Row(label="a", embedding=exact)]
    out = similarity.int8_quantization_error(spark.createDataFrame(rows)).collect()
    r = out[0]
    assert r["label"] == "a" and r["n_vecs"] == 1
    assert r["mean_mse"] == 0.0
    assert math.isclose(r["mean_scale"], 1.0, abs_tol=1e-9)


def test_int8_quantization_error_bounded_by_half_step(spark):
    # worst-case per-dim error is scale/2; mse must be <= (scale/2)^2
    v = [0.013 * ((i * 7) % 11 - 5) for i in range(64)]
    rows = [Row(label="b", embedding=v)]
    r = similarity.int8_quantization_error(spark.createDataFrame(rows)).collect()[0]
    scale = max(abs(x) for x in v) / 127.0
    assert 0.0 < r["mean_mse"] <= (scale / 2) ** 2
