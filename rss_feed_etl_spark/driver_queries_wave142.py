"""Driver-contract queries, wave 142: the streaming ↔ curation
composition capstone (VERDICT r8 #7) — the curation pipeline's quality +
exact-dedup gates running as a ``foreachBatch`` incremental curation over
the epoch sink, folded back to the one-shot batch answer.

The corpus arrives in THREE micro-batches (``doc_id % 3`` — a real
arrival shuffle, not id-contiguous waves) augmented with planted exact
duplicates (``+2M`` copies of every 7th document; ``2000000 % 3 == 2``
so every duplicate lands in a DIFFERENT micro-batch than its original —
the cross-batch fold is what the plant exercises).  After ingest, epochs
0–1 are compacted into the base partition (min-id fold pre-reduced into
storage) while epoch 2 stays live, so the read view exercises the
mixed base + epoch path.  The oracle replays the whole thing as the
equivalent ONE-SHOT batch: Gopher gate → min-id-per-fingerprint — equal
by the fold-equals-batch property (min-id-per-fingerprint is
associative, commutative, idempotent), which
``tests/test_incremental_curation.py`` additionally pins against
arrival-order permutations and compaction horizons.

Reference anchor: the reference's cron-rerun "streaming" (scd1_manager
idempotent upserts; src/etl/rss_feed_etl.py filter pipeline) composed
into the continuous-curation shape a 100 TB training-data pipeline runs.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _stage_waves
from .streaming import incremental

_IC_EPOCHS = 3
_IC_DUP_EVERY = 7
_IC_DUP_OFFSET = 2000000
_IC_MINSTOP = 0  # multilingual corpus: EN stopword rule disabled (wave 107)

_GOPHER_SQL = ORACLES["gopher_quality_flags"]
# DuckDB is case-insensitive, so guard against any-case table references:
# a lowercase "from documents" added later must not slip past the rewrite.
assert (
    len(re.findall(r"(?i)from\s+documents\b", _GOPHER_SQL)) == 1
), "gopher oracle shape changed"
_GOPHER_AUG = _GOPHER_SQL.replace(
    "FROM documents", "FROM (SELECT doc_id, text FROM aug)"
)


def _aug_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    dups = docs.filter(F.col("doc_id") % _IC_DUP_EVERY == 0).select(
        (F.col("doc_id") + _IC_DUP_OFFSET).alias("doc_id"), "text", "source"
    )
    return docs.unionByName(dups)


def _q_incremental_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _aug_docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="inc_curation_")
    try:
        return _run_incremental_curation(spark, docs, work)
    finally:
        # the eager localCheckpoint inside severs the result's plan from
        # the sink dirs, so the corpus-sized working copies can go now —
        # the bench re-runs this query up to 4x per child process and the
        # dirs would otherwise pile up in /tmp (ADVICE r9)
        shutil.rmtree(work, ignore_errors=True)


def _run_incremental_curation(
    spark: SparkSession, docs: DataFrame, work: str
) -> DataFrame:
    target = os.path.join(work, "target")
    ckpt = os.path.join(work, "ckpt")
    # one landing file per arrival wave so maxFilesPerTrigger=1 replays
    # each wave as its own micro-batch under the availableNow trigger;
    # staged in ONE partitioned write pass (see ``_stage_waves``) instead
    # of an eager corpus checkpoint + one filtered write per wave
    landing, docs = _stage_waves(spark, docs, work, _IC_EPOCHS)
    stream = (
        spark.readStream.format("parquet")
        .schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .load(landing)
    )
    q = incremental.curate_stream_to_parquet(
        stream, target, ckpt, min_stopwords=_IC_MINSTOP
    )
    q.awaitTermination()
    # fold the checkpoint-committed horizon into the base; the newest
    # epoch stays live, so the view reads the mixed base + epoch path
    incremental.compact_curated_epochs(spark, target, upto_epoch=_IC_EPOCHS - 2)
    curated = incremental.curated_read_view(spark, target)
    raw = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n_raw"))
    cur = curated.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_curated"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
    )
    out = raw.join(cur, "source", "left").select(
        "source",
        "n_raw",
        F.coalesce(F.col("n_curated"), F.lit(0)).cast("bigint").alias("n_curated"),
        "min_id",
        "max_id",
    )
    # materialize before returning: the temp sink must outlive the plan,
    # and a caller may execute the frame after this function's dirs are
    # eligible for cleanup
    return out.localCheckpoint(eager=True)


_register(
    "incremental_curation_fold",
    _q_incremental_curation,
    rf"""
WITH aug AS MATERIALIZED (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + {_IC_DUP_OFFSET}, text, source FROM documents
  WHERE doc_id % {_IC_DUP_EVERY} = 0),
g AS (SELECT doc_id FROM ({_GOPHER_AUG})
      WHERE flag_word_count = 1 AND flag_mean_word_len = 1
        AND flag_alpha = 1 AND n_stopwords >= {_IC_MINSTOP}),
f AS (SELECT a.doc_id, a.source,
             md5(lower(trim(regexp_replace(a.text, '\s+', ' ', 'g')))) AS fp
      FROM aug a JOIN g USING (doc_id)),
surv AS (SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY 1),
cur AS (SELECT f2.source, f2.doc_id
        FROM surv JOIN f f2 ON f2.fp = surv.fp AND f2.doc_id = surv.doc_id),
raw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_raw FROM aug GROUP BY 1),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_curated,
             CAST(min(doc_id) AS BIGINT) AS min_id,
             CAST(max(doc_id) AS BIGINT) AS max_id
      FROM cur GROUP BY 1)
SELECT raw.source, n_raw,
       CAST(coalesce(n_curated, 0) AS BIGINT) AS n_curated, min_id, max_id
FROM raw LEFT JOIN c USING (source)
""",
)
