"""Wave 101: greedy k-center diversity sampling."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import clustering


def _vec(a, b):
    return [float(a), float(b)] + [0.0] * 62


def test_kcenter_farthest_point_trajectory(spark):
    # points on a line: 0 at x=0 (seed, smallest id), 1 at x=1, 2 at x=10,
    # 3 at x=6.  Greedy: seed=0; farthest=2 (d=100); then 3 (min dist to
    # {0,2}: min(36,16)=16) beats 1 (min(1,81)=1); then 1.
    rows = [
        Row(vec_id=0, embedding=_vec(0, 0)),
        Row(vec_id=1, embedding=_vec(1, 0)),
        Row(vec_id=2, embedding=_vec(10, 0)),
        Row(vec_id=3, embedding=_vec(6, 0)),
    ]
    out = clustering.kcenter_diversity_sample(spark.createDataFrame(rows), k=4)
    got = {r.rank: (r.vec_id, r.min_dist) for r in out.collect()}
    assert got[1] == (0, 0.0)
    assert got[2] == (2, 100.0)
    assert got[3] == (3, 16.0)
    assert got[4] == (1, 1.0)


def test_kcenter_stops_when_corpus_exhausted(spark):
    rows = [Row(vec_id=i, embedding=_vec(i, 0)) for i in range(3)]
    out = clustering.kcenter_diversity_sample(spark.createDataFrame(rows), k=10)
    assert out.count() == 3  # k larger than the corpus: no phantom rows


def test_kcenter_empty_input_returns_empty_frame(spark):
    """ADVICE r5: an empty embeddings input raised an opaque IndexError
    from the seed collect; it must return an empty (rank, vec_id,
    min_dist) frame instead."""
    from rss_feed_etl_spark.operators import clustering

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = clustering.kcenter_diversity_sample(empty, k=3)
    assert out.columns == ["rank", "vec_id", "min_dist"]
    assert out.count() == 0
