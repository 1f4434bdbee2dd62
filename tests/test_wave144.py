"""Wave 144: UniMax cap-constrained allocation + embedding MMD matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.linalg import embedding_mmd_matrix
from rss_feed_etl_spark.operators.sampling import unimax_allocation


def _docs(spark, sizes: dict[str, int]):
    rows = []
    for src, n in sizes.items():
        rows.append(Row(source=src, text=" ".join(f"t{i}" for i in range(n))))
    return spark.createDataFrame(rows)


def test_unimax_waterfilling_hand_golden(spark):
    # tokens a=10, b=20, c=100; E=2 -> caps 20/40/200; B = floor(0.5*130)=65
    # ascending caps: a capped (20 <= 65/3), b uncapped (40 > 45/2),
    # c uncapped -> u* = (65-20)/2 = 22.5
    docs = _docs(spark, {"a": 10, "b": 20, "c": 100})
    out = {
        r["source"]: r
        for r in unimax_allocation(docs, budget_frac=0.5, max_epochs=2).collect()
    }
    assert out["a"]["capped"] == 1 and out["a"]["allocation_tokens"] == 20.0
    assert out["a"]["epochs"] == pytest.approx(2.0)
    for s in ("b", "c"):
        assert out[s]["capped"] == 0
        assert out[s]["allocation_tokens"] == pytest.approx(22.5)
    assert out["b"]["epochs"] == pytest.approx(1.125)
    assert out["c"]["epochs"] == pytest.approx(0.225)
    # allocations exhaust the budget exactly
    assert sum(r["allocation_tokens"] for r in out.values()) == pytest.approx(65.0)


def test_unimax_budget_above_caps_gives_everyone_max_epochs(spark):
    docs = _docs(spark, {"a": 10, "b": 30})
    # B = floor(2.0 * 40) = 80 = exactly the cap sum at E=2
    out = {
        r["source"]: r
        for r in unimax_allocation(docs, budget_frac=2.0, max_epochs=2).collect()
    }
    for r in out.values():
        assert r["capped"] == 1
        assert r["epochs"] == pytest.approx(2.0)


def test_unimax_tiny_budget_is_pure_uniform(spark):
    docs = _docs(spark, {"a": 100, "b": 300, "c": 600})
    # B = floor(0.03 * 1000) = 30 -> everyone uncapped, 10 tokens each
    out = {
        r["source"]: r
        for r in unimax_allocation(docs, budget_frac=0.03, max_epochs=2).collect()
    }
    for r in out.values():
        assert r["capped"] == 0
        assert r["allocation_tokens"] == pytest.approx(10.0)


def _emb(spark, clusters: dict[str, tuple[list[float], int]], start=0):
    rows, i = [], start
    for lab, (vec, n) in clusters.items():
        for _ in range(n):
            rows.append(Row(vec_id=i, embedding=list(vec), label=lab))
            i += 1
    return spark.createDataFrame(rows)


def test_mmd_identical_distributions_is_zero(spark):
    emb = _emb(spark, {"A": ([1.0, 0.0], 5), "B": ([1.0, 0.0], 5)})
    out = {
        (r["label_a"], r["label_b"]): r
        for r in embedding_mmd_matrix(emb, m=8, gamma=1.0).collect()
    }
    assert out[("A", "B")]["mmd2"] == pytest.approx(0.0, abs=1e-9)
    assert out[("A", "B")]["n_a"] == 5 and out[("A", "B")]["n_b"] == 5


def test_mmd_separated_clusters_hand_golden(spark):
    import math

    # A at e1, C at e2: within-kernels all 1, cross d2 = 2 exactly
    emb = _emb(
        spark, {"A": ([1.0, 0.0], 4), "C": ([0.0, 1.0], 4)}
    )
    out = {
        (r["label_a"], r["label_b"]): r
        for r in embedding_mmd_matrix(emb, m=8, gamma=1.0).collect()
    }
    expected = 1.0 + 1.0 - 2.0 * round(math.exp(-2.0), 9)
    assert out[("A", "C")]["mmd2"] == pytest.approx(expected, abs=1e-6)


def test_mmd_sample_bound_respected(spark):
    emb = _emb(spark, {"A": ([1.0, 0.0], 20), "B": ([0.0, 1.0], 20)})
    r = embedding_mmd_matrix(emb, m=8, gamma=1.0).collect()[0]
    assert r["n_a"] == 8 and r["n_b"] == 8
