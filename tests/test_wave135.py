"""Wave 135 goldens: source-token mutual information and the pairwise
JSD matrix, hand-computed on tiny frames.

Docs are built so each "text" yields exactly ONE trigram (three words),
making the (source, trigram) count table explicit.
"""

import math

import pytest
from pyspark.sql import Row

from rss_feed_etl_spark.operators.textstats import (
    source_js_divergence_matrix,
    source_token_mutual_info,
)


def _doc(source, tri):
    return Row(source=source, text=tri)


def test_mi_independent_sources_zero(spark):
    # both sources have the IDENTICAL trigram distribution -> MI = 0
    docs = spark.createDataFrame(
        [
            _doc("a", "x y z"),
            _doc("a", "p q r"),
            _doc("b", "x y z"),
            _doc("b", "p q r"),
        ]
    )
    r = source_token_mutual_info(docs).collect()[0]
    assert r["n_tokens"] == 4
    assert r["n_sources"] == 2
    assert r["n_types"] == 2
    assert r["mi_nats"] == pytest.approx(0.0)
    assert r["h_source_nats"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["nmi"] == pytest.approx(0.0)


def test_mi_disjoint_sources_equals_source_entropy(spark):
    # each source owns its trigram exclusively -> MI = H(source) = ln 2
    docs = spark.createDataFrame(
        [_doc("a", "x y z"), _doc("b", "p q r")]
    )
    r = source_token_mutual_info(docs).collect()[0]
    assert r["mi_nats"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0)


def test_jsd_identical_and_disjoint(spark):
    # a and b identical -> JSD = 0; c disjoint from both -> JSD = ln 2
    docs = spark.createDataFrame(
        [
            _doc("a", "x y z"),
            _doc("b", "x y z"),
            _doc("c", "p q r"),
        ]
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_js_divergence_matrix(docs).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")]["jsd_nats"] == pytest.approx(0.0)
    assert out[("a", "b")]["n_common_types"] == 1
    assert out[("a", "c")]["jsd_nats"] == pytest.approx(math.log(2), abs=1e-6)
    assert out[("a", "c")]["n_common_types"] == 0
    assert out[("b", "c")]["jsd_nats"] == pytest.approx(math.log(2), abs=1e-6)


def test_jsd_hand_computed_partial_overlap(spark):
    # a: {t1: 1/2, t2: 1/2};  b: {t1: 1/2, t3: 1/2}
    # shared support is t1 with p1 = p2 -> both-term 0; one-sided mass
    # 1/2 each side -> JSD = (ln2/2) * (2 - 1/2 - 1/2) = ln2 / 2
    docs = spark.createDataFrame(
        [
            _doc("a", "t one x"),
            _doc("a", "t two x"),
            _doc("b", "t one x"),
            _doc("b", "t three x"),
        ]
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_js_divergence_matrix(docs).collect()
    }
    r = out[("a", "b")]
    assert r["n_common_types"] == 1
    assert r["jsd_nats"] == pytest.approx(math.log(2) / 2, abs=1e-6)
