"""Wave-18 driver queries: deterministic training-export shuffle and
read-only snapshot diff."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _CHANGED_SQL, WITH_TABLES, _keyed_split, _register
from .driver_queries_corpus import _hexfold
from .operators import joins, sampling

# --- deterministic shuffle -------------------------------------------------


def _q_det_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.deterministic_shuffle(docs, id_col="doc_id", salt="epoch0", n_shards=8)


_SHARD = _hexfold("('epoch0:shard:' || CAST(doc_id AS VARCHAR))") + " % 8"

_register(
    "deterministic_shuffle",
    _q_det_shuffle,
    f"""
WITH s AS (
  SELECT doc_id,
         {_SHARD} AS shard,
         md5('epoch0:ord:' || CAST(doc_id AS VARCHAR)) AS pri
  FROM documents)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY pri, doc_id) AS BIGINT) AS pos
FROM s
""",
)


# --- snapshot diff ---------------------------------------------------------


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist, _, _ = _keyed_split(spark, sf_dir)
    # derive a batch exercising every status: uid%4==0 rows pass through
    # verbatim (unchanged), %4==1 get a new summary (changed), %4==2 are
    # re-keyed (added + their original keys removed), %4==3 are absent
    # (removed)
    uid = F.regexp_extract("link", "u(\\d+)", 1).cast("int")
    batch = (
        hist.filter(uid % 4 == 0)
        .unionByName(hist.filter(uid % 4 == 1).withColumn("summary", F.lit("CHANGED")))
        .unionByName(
            hist.filter(uid % 4 == 2).withColumn(
                "link", F.concat(F.lit("x"), F.col("link"))
            )
        )
    )
    return joins.snapshot_diff(hist, batch)


_STAGE_COLS_SQL = ("job_title, link, entry_title, published, feed_title, "
                   "reader, time_window, summary, notes")

_register(
    "snapshot_diff",
    _q_snapshot_diff,
    f"""
{WITH_TABLES},
uidx AS (
  SELECT *, CAST(regexp_extract(link, 'u(\\d+)', 1) AS INT) AS uid FROM hist),
batch2 AS (
  SELECT {_STAGE_COLS_SQL} FROM uidx WHERE uid % 4 = 0
  UNION ALL
  SELECT job_title, link, entry_title, published, feed_title,
         reader, time_window, 'CHANGED' AS summary, notes
  FROM uidx WHERE uid % 4 = 1
  UNION ALL
  SELECT job_title, 'x' || link AS link, entry_title, published, feed_title,
         reader, time_window, summary, notes
  FROM uidx WHERE uid % 4 = 2)
SELECT status, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT CASE WHEN h.link IS NULL THEN 'added'
              WHEN b.link IS NULL THEN 'removed'
              WHEN {_CHANGED_SQL} THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM batch2 b FULL OUTER JOIN hist h ON b.link = h.link)
GROUP BY status
""",
)
