"""Round 10 (VERDICT r9 #6): the NEAR-dup stage of the incremental
curation fold — band-bucket champions folded across micro-batches.

Pins, on a corpus with cross-batch exact duplicates AND a cross-batch
80%-prefix near-duplicate:

1. fold(epochs) == one-shot batch (``gate → dedup_exact →
   bucket-champion near-dup gate``) for TWO arrival permutations;
2. the near-dup plant is genuinely removed (the stage is exercised, not
   vacuously green);
3. compaction invariance of BOTH sinks (curated rows and bucket
   champions) at partial and full horizons;
4. crash safety of the bucket-sink compactor between base overwrite and
   epoch deletes.
"""

import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators.dedup import banded_minhash, dedup_exact
from rss_feed_etl_spark.operators.textstats import gopher_quality_flags
from rss_feed_etl_spark.streaming.incremental import (
    compact_bucket_epochs,
    compact_curated_epochs,
    curate_stream_to_parquet,
    curated_read_view,
)

_GOOD = " ".join(f"token{i:02d}" for i in range(60))
_GOOD2 = " ".join(f"other{i:02d}" for i in range(60))
# 80% prefix of _GOOD: a NEAR duplicate (shares ~46/58 shingles with doc
# 0 -> P(band collision) ~ 0.98 at 8 bands x 4 rows; asserted below)
_NEAR = " ".join(f"token{i:02d}" for i in range(48))
_SHORT = "way too short"


def _docs(spark):
    rows = [
        Row(doc_id=0, text=_GOOD, source="a"),
        Row(doc_id=1, text=_GOOD2, source="b"),
        Row(doc_id=2, text=_SHORT, source="a"),
        Row(doc_id=10, text=_GOOD, source="b"),  # exact dup of 0
        Row(doc_id=31, text=_NEAR, source="b"),  # NEAR dup of 0
        Row(doc_id=5, text=_GOOD2, source="a"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows)


def _batch_answer(spark):
    """One-shot batch: gate -> exact dedup -> bucket-champion gate."""
    docs = _docs(spark)
    flags = gopher_quality_flags(docs)
    keep = flags.filter(
        (F.col("flag_word_count") == 1)
        & (F.col("flag_mean_word_len") == 1)
        & (F.col("flag_alpha") == 1)
        & (F.col("n_stopwords") >= 0)
    ).select("doc_id")
    surv = dedup_exact(docs.join(keep, "doc_id"))
    banded = banded_minhash(surv, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "bucket"
    )
    champs = banded.groupBy("bucket").agg(F.min("doc_id").alias("ch"))
    kept = (
        banded.join(champs, "bucket")
        .groupBy("doc_id")
        .agg(F.min("ch").alias("mc"))
        .filter(F.col("mc") == F.col("doc_id"))
        .select("doc_id")
    )
    return sorted(
        (r["doc_id"], r["text"]) for r in surv.join(kept, "doc_id").collect()
    )


def _run_stream(spark, root, epoch_of):
    landing = os.path.join(root, "landing")
    target = os.path.join(root, "target")
    buckets = os.path.join(root, "buckets")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(landing)
    docs = _docs(spark)
    n_epochs = 1 + max(epoch_of(r["doc_id"]) for r in docs.collect())
    for k in range(n_epochs):
        ids = [r["doc_id"] for r in docs.collect() if epoch_of(r["doc_id"]) == k]
        stage = os.path.join(root, f"stage{k}")
        docs.filter(F.col("doc_id").isin(ids)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(os.path.join(stage, part), os.path.join(landing, f"w{k}.parquet"))
    stream = (
        spark.readStream.format("parquet")
        .schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .load(landing)
    )
    q = curate_stream_to_parquet(
        stream, target, ckpt, min_stopwords=0, neardup_bucket_path=buckets
    )
    q.awaitTermination(120)
    return target, buckets


def _view_rows(spark, target, buckets):
    return sorted(
        (r["doc_id"], r["text"])
        for r in curated_read_view(
            spark, target, neardup_bucket_path=buckets
        ).collect()
    )


def test_neardup_fold_equals_batch_two_arrival_orders(spark, tmp_path):
    expected = _batch_answer(spark)
    # permutation 1 splits 0 and its near-dup 31 across batches (0%3=0,
    # 31%3=1); permutation 2 groups by tens digit, another boundary set
    t1, b1 = _run_stream(spark, str(tmp_path / "p1"), lambda i: i % 3)
    t2, b2 = _run_stream(spark, str(tmp_path / "p2"), lambda i: (i // 10) % 2)
    assert _view_rows(spark, t1, b1) == expected
    assert _view_rows(spark, t2, b2) == expected
    ids = {i for i, _ in expected}
    # exact dups 10/5 and the quality reject 2 are gone (exact stage),
    # and the NEAR-dup 31 is gone (bucket-champion stage) — the stage is
    # exercised, not vacuously green
    assert 0 in ids and 1 in ids
    assert not {2, 5, 10, 31} & ids


def test_neardup_compaction_invariance_both_sinks(spark, tmp_path):
    expected = _batch_answer(spark)
    target, buckets = _run_stream(spark, str(tmp_path / "c"), lambda i: i % 3)
    assert _view_rows(spark, target, buckets) == expected
    assert compact_curated_epochs(spark, target, upto_epoch=0)
    assert compact_bucket_epochs(spark, buckets, upto_epoch=1)  # mixed horizons
    assert _view_rows(spark, target, buckets) == expected
    assert compact_curated_epochs(spark, target, upto_epoch=2)
    assert compact_bucket_epochs(spark, buckets, upto_epoch=2)
    assert _view_rows(spark, target, buckets) == expected
    # full fold pre-reduced storage: bucket base holds one row per bucket
    base = (
        spark.read.option("mergeSchema", "true")
        .parquet(buckets)
        .filter(F.col("__epoch") == -1)
    )
    assert base.count() == base.select("bucket").distinct().count()


class _SimulatedCrash(Exception):
    pass


def test_bucket_compactor_crash_between_overwrite_and_deletes(spark, tmp_path):
    expected = _batch_answer(spark)
    target, buckets = _run_stream(spark, str(tmp_path / "k"), lambda i: i % 3)

    def die_after_overwrite(label):
        if label == "overwritten":
            raise _SimulatedCrash(label)

    with pytest.raises(_SimulatedCrash):
        compact_bucket_epochs(
            spark, buckets, upto_epoch=1, _fault=die_after_overwrite
        )
    assert _view_rows(spark, target, buckets) == expected
    compact_bucket_epochs(spark, buckets, upto_epoch=1)
    assert _view_rows(spark, target, buckets) == expected
    leftover = [
        d
        for d in os.listdir(buckets)
        if d.startswith("__epoch=") and 0 <= int(d.split("=")[1]) <= 1
    ]
    assert leftover == []
