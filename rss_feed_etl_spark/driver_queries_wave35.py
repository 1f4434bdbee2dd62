"""Driver-contract queries, wave 35: integer budget apportionment
(largest-remainder), trending-item burst detection, and the per-source
dedup drop-rate report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _aug_docs
from .operators import dedup, eventanalytics as ea, sampling

# --- largest-remainder budget allocation ------------------------------------

_ALLOC_TOTAL = 10_000


def _q_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    weights = docs.groupBy("source").agg(F.count("*").alias("n"))
    return sampling.largest_remainder_allocation(
        weights, total=_ALLOC_TOTAL, group_col="source", weight_col="n"
    )


_register(
    "budget_allocation",
    _q_allocation,
    f"""
WITH wts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS W FROM wts),
staged AS (
  SELECT source, n,
         ({_ALLOC_TOTAL} * CAST(n AS BIGINT)) // W AS base,
         ({_ALLOC_TOTAL} * CAST(n AS BIGINT)) % W AS rem
  FROM wts, tot),
slack AS (SELECT {_ALLOC_TOTAL} - CAST(sum(base) AS BIGINT) AS r FROM staged),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk FROM staged)
SELECT source, CAST(n AS BIGINT) AS weight,
       CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked, slack
""",
)


# --- trending items ---------------------------------------------------------

_TREND_W, _TREND_TOP = 7, 20


def _q_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.trending_items(
        td.load_table(spark, sf_dir, "events"),
        window_days=_TREND_W,
        top=_TREND_TOP,
    )


_register(
    "trending_items",
    _q_trending,
    f"""
WITH daily AS (
  SELECT CAST(json_extract(props, '$.k') AS INT) AS item,
         CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
d2 AS (SELECT *, date_diff('day', DATE '1970-01-01', day) AS day_idx FROM daily),
sc AS (
  SELECT item, day, n,
         coalesce(sum(n) OVER (PARTITION BY item ORDER BY day_idx
                               RANGE BETWEEN {_TREND_W} PRECEDING
                               AND 1 PRECEDING), 0) AS trail_sum
  FROM d2)
SELECT item, strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
       CAST(trail_sum AS BIGINT) AS trail_sum,
       round(n * {float(_TREND_W)} / trail_sum, 6) AS ratio
FROM sc WHERE trail_sum > 0
ORDER BY ratio DESC, item ASC, day ASC LIMIT {_TREND_TOP}
""",
)


# --- per-source dedup drop rate ---------------------------------------------


def _q_drop_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        aug, id_col="id", text_col="text", n=3, threshold=0.25
    )
    drops = dedup.neardup_drop_list(pairs)
    keyed = aug.join(
        td.load_table(spark, sf_dir, "documents").select(
            F.col("doc_id"), F.col("source")
        ),
        (F.col("id") % 1_000_000) == F.col("doc_id"),
    ).select("id", "source")
    return dedup.drop_rate_by_key(keyed, drops, key_col="source")


_register(
    "dedup_rate_by_source",
    _q_drop_rate,
    f"""
WITH drops AS (SELECT * FROM ({ORACLES["neardup_drop_list"]}) t),
aug_ids AS (
  SELECT doc_id AS id FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS id FROM documents),
keyed AS (
  SELECT a.id, d.source
  FROM aug_ids a JOIN documents d ON a.id % 1000000 = d.doc_id)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN dr.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       round(sum(CASE WHEN dr.id IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS drop_rate
FROM keyed LEFT JOIN drops dr USING (id)
GROUP BY 1
""",
)
