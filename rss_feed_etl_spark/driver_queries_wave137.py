"""Driver-contract queries, wave 137: McNemar's paired classifier test
and the disparate-impact audit of a quality filter.

Reference anchor: the reference swaps LLM scorers/prompts between runs
(src/rss_feed_etl/llm/scorer.py) with no paired significance check —
McNemar is that check; and its keyword/quality filters drop rows with
no per-feed accounting — the four-fifths audit is what says WHICH
source a gate silently under-selects.

Plants (wave-122/131 family): label = value + (event_id % 40) > 60;
classifier A thresholds value at 50, classifier B adds its own planted
noise.  The filter audit gates documents on n_chars > 300 against a
planted truth n_chars + (doc_id % 100) > 330 — per-source length
distributions genuinely differ, so the impact ratios are real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import profiling


def _q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    label = F.col("value") + (F.col("event_id") % 40) > 60
    a = F.col("value") > 50
    b = F.col("value") + (F.col("event_id") % 7) > 52
    staged = ev.select(
        (a == label).alias("a_correct"), (b == label).alias("b_correct")
    )
    return profiling.mcnemar_test(staged)


_register(
    "mcnemar_classifier_test",
    _q_mcnemar,
    """
WITH staged AS (
  SELECT ((value > 50) = (value + (event_id % 40) > 60)) AS a_ok,
         ((value + (event_id % 7) > 52) = (value + (event_id % 40) > 60))
           AS b_ok
  FROM events),
agg AS (
  SELECT CAST(sum(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both_right,
         CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT)
           AS n_only_a,
         CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT)
           AS n_only_b,
         CAST(sum(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both_wrong
  FROM staged)
SELECT n_both_right, n_only_a, n_only_b, n_both_wrong,
       CASE WHEN n_only_a + n_only_b > 0 THEN
         round(CAST((abs(n_only_a - n_only_b) - 1)
                    * (abs(n_only_a - n_only_b) - 1) AS DOUBLE)
               / (n_only_a + n_only_b), 6) END AS mcnemar_chi2,
       CASE WHEN n_only_a + n_only_b > 0 THEN
         round(CAST((abs(n_only_a - n_only_b) - 1)
                    * (abs(n_only_a - n_only_b) - 1) AS DOUBLE)
               / (n_only_a + n_only_b), 6) > 3.841459 END AS significant
FROM agg
""",
)


def _q_disparate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "source",
        (F.col("n_chars") > 300).alias("kept"),
        (F.col("n_chars") + F.col("doc_id") % 100 > 330).alias("good"),
    )
    return profiling.filter_disparate_impact(staged)


_register(
    "filter_disparate_impact",
    _q_disparate,
    """
WITH staged AS (
  SELECT source AS g,
         (n_chars > 300) AS p,
         (n_chars + doc_id % 100 > 330) AS y
  FROM documents),
g AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS npos,
             CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM staged GROUP BY 1),
r AS (SELECT *, CAST(npos AS DOUBLE) / n AS rate FROM g),
m AS (SELECT max(rate) AS rmax FROM r)
SELECT r.g AS source, r.n,
       round(rate, 6) AS sel_rate,
       round(rate / rmax, 6) AS impact_ratio,
       round(rate / rmax, 6) < CAST(0.8 AS DOUBLE) AS four_fifths_flag,
       CASE WHEN tp + fn > 0
            THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS tpr,
       CASE WHEN fp + tn > 0
            THEN round(CAST(fp AS DOUBLE) / (fp + tn), 6) END AS fpr
FROM r CROSS JOIN m
""",
)
