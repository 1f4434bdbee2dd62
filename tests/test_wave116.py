"""Wave 116: IVF nprobe recall curve and classical decomposition."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from rss_feed_etl_spark.operators import similarity, timeseries


def _blob_embeddings(spark, n=40, dim=4):
    # four well-separated blobs of 10: IVF with enough probes should
    # recover the exact neighbors, few probes should miss cross-cell ones
    rows = []
    for i in range(n):
        blob = i % 4
        base = float(blob * 100) + 1.0  # offset: zero vectors have no cosine
        vec = [base + 0.1 * (i // 4), base, base, base]
        rows.append(Row(vec_id=i, embedding=[float(v) for v in vec]))
    return spark.createDataFrame(rows)


def test_recall_curve_is_monotone_in_nprobe(spark):
    emb = _blob_embeddings(spark)
    out = {
        r["nprobe"]: r
        for r in similarity.ivf_nprobe_recall_curve(
            emb, nprobes=(1, 2, 4), k=3, n_queries=4, n_centroids=8
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert all(r["n_queries"] == 4 for r in out.values())
    rec = [out[p]["mean_recall"] for p in (1, 2, 4)]
    assert rec == sorted(rec)  # more probes never lose recall
    assert 0.0 <= rec[0] and rec[-1] <= 1.0


def test_recall_curve_full_probe_is_perfect(spark):
    emb = _blob_embeddings(spark, n=20)
    # probing every centroid == exact search
    out = {
        r["nprobe"]: r["mean_recall"]
        for r in similarity.ivf_nprobe_recall_curve(
            emb, nprobes=(6,), k=3, n_queries=3, n_centroids=6
        ).collect()
    }
    assert out[6] == 1.0


def _sawtooth_daily(spark, weeks=8):
    # strict weekly sawtooth on a flat base: the decomposition must pull
    # the pattern into `seasonal` and leave residuals ~0
    base_day = dt.date(2024, 1, 1)
    rows = []
    for d in range(weeks * 7):
        day = base_day + dt.timedelta(days=d)
        rows.append(Row(day=day, total=100.0 + 10.0 * (d % 7)))
    return spark.createDataFrame(rows)


def test_decompose_flat_sawtooth_into_seasonal(spark):
    out = timeseries.classical_decompose_daily(_sawtooth_daily(spark)).collect()
    assert len(out) == 56
    interior = [r for r in out if "2024-01-10" <= r["day"] <= "2024-02-18"]
    assert interior
    for r in interior:
        # the centered 7-day MA of a pure weekly sawtooth is the flat base
        assert abs(r["trend"] - 130.0) < 1e-6
        assert abs(r["residual"]) < 2.0  # edge days shift the dow means a bit
    # seasonal spans the sawtooth amplitude
    seas = sorted({r["seasonal"] for r in interior})
    assert seas[-1] - seas[0] > 50.0


def test_decompose_identity_holds_every_day(spark):
    out = timeseries.classical_decompose_daily(_sawtooth_daily(spark)).collect()
    for r in out:
        recomposed = r["trend"] + r["seasonal"] + r["residual"]
        assert abs(recomposed - r["value"]) < 1e-6
