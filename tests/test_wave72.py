"""Wave 72: Tukey fences and per-batch-refreshed stream enrichment."""

from __future__ import annotations

from pyspark.sql import Row

from rss_feed_etl_spark.operators import profiling
from rss_feed_etl_spark.streaming.incremental import enrich_stream_to_parquet


def test_tukey_fences_known_quartiles(spark):
    # 1..11 plus outliers 100 and -50: q1=3.5, q3=8.5 over the 13 values?
    # keep it simple: uniform 0..100 grid + two gross outliers
    vals = [float(v) for v in range(0, 101, 10)] + [1000.0, -1000.0]
    rows = [Row(event_id=i, event_type="t", value=v) for i, v in enumerate(vals)]
    out = profiling.tukey_fences(spark.createDataFrame(rows)).collect()[0]
    assert out["n"] == 13
    assert out["q1"] < out["q3"]
    assert out["lo_fence"] == out["q1"] - 1.5 * out["iqr"] or abs(
        out["lo_fence"] - (out["q1"] - 1.5 * out["iqr"])
    ) < 1e-5
    assert out["n_low"] == 1 and out["n_high"] == 1
    assert abs(out["outlier_rate"] - round(2 / 13, 6)) < 1e-6


def test_tukey_fences_per_group_independent(spark):
    rows = [Row(event_id=i, event_type="narrow", value=50.0 + (i % 3)) for i in range(30)]
    rows += [Row(event_id=100 + i, event_type="wide", value=float(i * 40)) for i in range(30)]
    out = {r["event_type"]: r for r in profiling.tukey_fences(spark.createDataFrame(rows)).collect()}
    assert out["narrow"]["iqr"] < out["wide"]["iqr"]
    # narrow group: all mass within its own fences
    assert out["narrow"]["n_low"] == 0 and out["narrow"]["n_high"] == 0


def test_stream_enrich_refreshes_dim_between_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    dim_path = str(tmp_path / "dim")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # dim v1
    spark.createDataFrame(
        [Row(source="a", tier="bronze"), Row(source="b", tier="silver")]
    ).write.mode("overwrite").parquet(dim_path)
    # batch 1
    spark.createDataFrame(
        [Row(doc_id=1, source="a"), Row(doc_id=2, source="zzz")]
    ).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("doc_id long, source string").parquet(landing)
    )
    q = enrich_stream_to_parquet(stream, dim_path, "source", target, ckpt)
    q.awaitTermination(120)
    t1 = {r["doc_id"]: r["tier"] for r in spark.read.parquet(target).collect()}
    assert t1 == {1: "bronze", 2: None}  # left join: no-match flows through

    # dim updated BETWEEN batches: a promotes to gold
    spark.createDataFrame(
        [Row(source="a", tier="gold"), Row(source="b", tier="silver")]
    ).write.mode("overwrite").parquet(dim_path)
    # batch 2: another 'a' doc
    spark.createDataFrame([Row(doc_id=3, source="a")]).write.mode("append").parquet(
        landing
    )
    stream2 = (
        spark.readStream.schema("doc_id long, source string").parquet(landing)
    )
    q2 = enrich_stream_to_parquet(stream2, dim_path, "source", target, ckpt)
    q2.awaitTermination(120)
    t2 = {r["doc_id"]: r["tier"] for r in spark.read.parquet(target).collect()}
    # old rows keep their as-of enrichment; the new row sees the NEW dim
    assert t2[1] == "bronze" and t2[3] == "gold"


def test_enriched_read_view_equivalent_across_compaction(spark, tmp_path):
    """VERDICT r5 #7: the per-epoch sink's reader view must hide the
    __epoch bookkeeping column and return identical rows before and after
    compacting old epochs into the base partition, and compaction must
    actually remove the folded epoch directories (the small-file bound)."""
    import os

    from rss_feed_etl_spark.streaming.incremental import (
        compact_enriched_epochs,
        enriched_read_view,
    )

    landing = str(tmp_path / "landing")
    dim_path = str(tmp_path / "dim")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [Row(source="a", tier="bronze"), Row(source="b", tier="silver")]
    ).write.mode("overwrite").parquet(dim_path)
    # three epochs, one row each
    for i, src in enumerate(["a", "b", "a"]):
        spark.createDataFrame([Row(doc_id=i, source=src)]).write.mode(
            "append"
        ).parquet(landing)
        stream = spark.readStream.schema("doc_id long, source string").parquet(
            landing
        )
        q = enrich_stream_to_parquet(stream, dim_path, "source", target, ckpt)
        q.awaitTermination(120)

    before = {
        (r["doc_id"], r["source"], r["tier"])
        for r in enriched_read_view(spark, target).collect()
    }
    assert before == {(0, "a", "bronze"), (1, "b", "silver"), (2, "a", "bronze")}
    assert "__epoch" not in enriched_read_view(spark, target).columns

    epoch_dirs = [d for d in os.listdir(target) if d.startswith("__epoch=")]
    assert len(epoch_dirs) >= 3  # one per epoch before compaction

    assert compact_enriched_epochs(spark, target, upto_epoch=1)
    after = {
        (r["doc_id"], r["source"], r["tier"])
        for r in enriched_read_view(spark, target).collect()
    }
    assert after == before  # read-view equivalence across compaction
    remaining = sorted(
        d for d in os.listdir(target) if d.startswith("__epoch=")
    )
    assert "__epoch=-1" in remaining
    assert not any(d in ("__epoch=0", "__epoch=1") for d in remaining)
    # epochs beyond the watermark are untouched (still individually
    # replay-overwritable)
    assert any(d not in ("__epoch=-1",) for d in remaining)

    # compacting again with nothing new below the watermark still folds
    # the base into itself harmlessly (idempotent view)
    assert compact_enriched_epochs(spark, target, upto_epoch=1)
    assert {
        (r["doc_id"], r["source"], r["tier"])
        for r in enriched_read_view(spark, target).collect()
    } == before


def test_compaction_crash_window_is_self_healing(spark, tmp_path):
    """ADVICE r6: a compaction that dies AFTER the base overwrite commits
    but BEFORE the folded __epoch=N directories are deleted must not
    surface duplicates (the base records __folded_upto atomically with the
    fold) and a rerun must heal — delete the leftovers, never fold the
    duplicate copy in permanently."""
    import os
    import shutil

    from rss_feed_etl_spark.streaming.incremental import (
        compact_enriched_epochs,
        enriched_read_view,
    )

    landing = str(tmp_path / "landing")
    dim_path = str(tmp_path / "dim")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [Row(source="a", tier="bronze"), Row(source="b", tier="silver")]
    ).write.mode("overwrite").parquet(dim_path)
    for i, src in enumerate(["a", "b", "a"]):
        spark.createDataFrame([Row(doc_id=i, source=src)]).write.mode(
            "append"
        ).parquet(landing)
        stream = spark.readStream.schema("doc_id long, source string").parquet(
            landing
        )
        q = enrich_stream_to_parquet(stream, dim_path, "source", target, ckpt)
        q.awaitTermination(120)
    before = {
        (r["doc_id"], r["source"], r["tier"])
        for r in enriched_read_view(spark, target).collect()
    }

    # stash the to-be-folded epoch dirs, compact, then restore them --
    # byte-identical to a crash between the overwrite and the deletes
    stash = tmp_path / "stash"
    for d in ("__epoch=0", "__epoch=1"):
        shutil.copytree(os.path.join(target, d), stash / d)
    assert compact_enriched_epochs(spark, target, upto_epoch=1)
    for d in ("__epoch=0", "__epoch=1"):
        shutil.copytree(stash / d, os.path.join(target, d))

    # duplicates exist on disk, but the read view must not surface them
    rows = [
        (r["doc_id"], r["source"], r["tier"])
        for r in enriched_read_view(spark, target).collect()
    ]
    assert len(rows) == len(before) and set(rows) == before

    # the rerun heals: leftovers deleted, rows STILL not duplicated
    assert compact_enriched_epochs(spark, target, upto_epoch=1)
    remaining = {d for d in os.listdir(target) if d.startswith("__epoch=")}
    assert "__epoch=0" not in remaining and "__epoch=1" not in remaining
    rows2 = [
        (r["doc_id"], r["source"], r["tier"])
        for r in enriched_read_view(spark, target).collect()
    ]
    assert len(rows2) == len(before) and set(rows2) == before
