"""Wave 129: HITS authorities and degree assortativity."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import graph


def test_hits_canonical_item_wins(spark):
    # item 100 is clicked by every user; items 1-3 by one user each.
    edges = [Row(src=u, dst=100) for u in range(5)] + [
        Row(src=u, dst=u) for u in range(3)
    ]
    out = {
        r["node"]: r["authority"]
        for r in graph.hits_bipartite(spark.createDataFrame(edges)).collect()
    }
    assert max(out, key=out.get) == 100
    # L1 normalization: authorities sum to ~1 (6-dp output rounding)
    assert abs(sum(out.values()) - 1.0) < 1e-5
    # items clicked only by narrow users get strictly less authority
    assert all(out[100] > out[i] for i in range(3))


def test_hits_reinforces_via_hubs(spark):
    # u0 and u1 both click A and B (a tight community); u2 clicks C only.
    edges = [
        Row(src=0, dst=10), Row(src=0, dst=11),
        Row(src=1, dst=10), Row(src=1, dst=11),
        Row(src=2, dst=12),
    ]
    out = {
        r["node"]: r["authority"]
        for r in graph.hits_bipartite(spark.createDataFrame(edges)).collect()
    }
    # community items beat the isolated one even though in-degree of C
    # equals... (C has in-degree 1, A/B have 2) and the hub loop widens it
    assert out[10] == out[11] > out[12]


def test_assortativity_star_is_negative(spark):
    # star: one hub user clicks many leaf items, plus leaf users each
    # clicking one shared popular item -> high-degree src pairs with
    # low-degree dst and vice versa = disassortative
    edges = [Row(src=0, dst=i) for i in range(1, 8)] + [
        Row(src=u, dst=99) for u in range(1, 8)
    ]
    out = graph.degree_assortativity(spark.createDataFrame(edges)).collect()[0]
    assert out["n_edges"] == 14
    assert out["assortativity"] < -0.5


def test_assortativity_uniform_degrees_null(spark):
    # perfectly regular bipartite graph: zero variance on both sides ->
    # the correlation is undefined and must surface as NULL, not a crash
    edges = [Row(src=u, dst=10 + u) for u in range(4)]
    out = graph.degree_assortativity(spark.createDataFrame(edges)).collect()[0]
    assert out["assortativity"] is None
