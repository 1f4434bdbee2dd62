"""Wave 142: the streaming ↔ curation composition capstone — the
fold-equals-batch proof for the incremental quality + exact-dedup gates.

Pins, on a corpus with cross-batch exact duplicates and low-quality
plants:

1. fold(epochs) == one-shot batch (``gate → dedup_exact``) for TWO
   different arrival permutations (batch boundaries must not matter);
2. compaction invariance: the read view returns identical rows before
   compaction, after a partial fold, and after the full fold;
3. crash safety of the reducing compactor: killed after the base
   overwrite but before the epoch-directory deletes, the reader still
   sees exactly the batch answer and a rerun converges.
"""

import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rss_feed_etl_spark.operators.dedup import dedup_exact
from rss_feed_etl_spark.operators.textstats import gopher_quality_flags
from rss_feed_etl_spark.streaming.incremental import (
    compact_curated_epochs,
    curate_stream_to_parquet,
    curated_read_view,
)

# 60 words, mean word length in [3, 10], all alpha -> passes the gate
_GOOD = " ".join(f"token{i:02d}" for i in range(60))
_GOOD2 = " ".join(f"other{i:02d}" for i in range(60))
_SHORT = "way too short"  # fails flag_word_count


def _docs(spark):
    rows = [
        Row(doc_id=0, text=_GOOD, source="a"),
        Row(doc_id=1, text=_GOOD2, source="b"),
        Row(doc_id=2, text=_SHORT, source="a"),
        # exact duplicates of doc 0 (different ids, same fingerprint)
        Row(doc_id=10, text=_GOOD, source="b"),
        Row(doc_id=20, text="  " + _GOOD + "  ", source="a"),  # ws-normalized dup
        # duplicate pair entirely distinct from doc 0's family
        Row(doc_id=5, text=_GOOD2, source="a"),
    ]
    return spark.createDataFrame(rows)


def _batch_answer(spark):
    docs = _docs(spark)
    flags = gopher_quality_flags(docs)
    keep = flags.filter(
        (F.col("flag_word_count") == 1)
        & (F.col("flag_mean_word_len") == 1)
        & (F.col("flag_alpha") == 1)
        & (F.col("n_stopwords") >= 0)
    ).select("doc_id")
    gated = docs.join(keep, "doc_id")
    return sorted(
        (r["doc_id"], r["text"]) for r in dedup_exact(gated).collect()
    )


def _run_stream(spark, root, epoch_of) -> str:
    """Ingest _docs in micro-batches grouped by ``epoch_of(doc_id)``."""
    landing = os.path.join(root, "landing")
    target = os.path.join(root, "target")
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
    q = curate_stream_to_parquet(stream, target, ckpt, min_stopwords=0)
    q.awaitTermination(120)
    return target


def _view_rows(spark, target):
    return sorted(
        (r["doc_id"], r["text"]) for r in curated_read_view(spark, target).collect()
    )


def test_fold_equals_batch_two_arrival_orders(spark, tmp_path):
    expected = _batch_answer(spark)
    # duplicates 0/10/20 span batches in both permutations
    t1 = _run_stream(spark, str(tmp_path / "p1"), lambda i: i % 3)
    t2 = _run_stream(spark, str(tmp_path / "p2"), lambda i: (i // 10) % 2)
    assert _view_rows(spark, t1) == expected
    assert _view_rows(spark, t2) == expected
    # the survivors are the min-id representatives: 0 (not 10/20), 1 (not 5)
    ids = {i for i, _ in expected}
    assert 0 in ids and 1 in ids and not {10, 20, 5} & ids
    assert 2 not in ids  # quality-gated out


def test_compaction_invariance(spark, tmp_path):
    expected = _batch_answer(spark)
    target = _run_stream(spark, str(tmp_path / "c"), lambda i: i % 3)
    assert _view_rows(spark, target) == expected  # uncompacted
    assert compact_curated_epochs(spark, target, upto_epoch=0)
    assert _view_rows(spark, target) == expected  # partial fold
    assert compact_curated_epochs(spark, target, upto_epoch=2)
    assert _view_rows(spark, target) == expected  # full fold
    # full fold pre-reduced storage: base holds one row per fingerprint
    base = spark.read.option("mergeSchema", "true").parquet(target).filter(
        F.col("__epoch") == -1
    )
    assert base.count() == len(expected)


class _SimulatedCrash(Exception):
    pass


def test_reducing_compactor_crash_between_overwrite_and_deletes(spark, tmp_path):
    expected = _batch_answer(spark)
    target = _run_stream(spark, str(tmp_path / "k"), lambda i: i % 3)

    def die_after_overwrite(label):
        if label == "overwritten":
            raise _SimulatedCrash(label)

    with pytest.raises(_SimulatedCrash):
        compact_curated_epochs(
            spark, target, upto_epoch=1, _fault=die_after_overwrite
        )
    # folded base + leftover epoch dirs on disk; the reader must not
    # surface the duplicates and a rerun must converge
    assert _view_rows(spark, target) == expected
    compact_curated_epochs(spark, target, upto_epoch=1)
    assert _view_rows(spark, target) == expected
    leftover = [
        d
        for d in os.listdir(target)
        if d.startswith("__epoch=") and 0 <= int(d.split("=")[1]) <= 1
    ]
    assert leftover == []
