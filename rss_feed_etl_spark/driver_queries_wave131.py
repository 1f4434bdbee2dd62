"""Driver-contract queries, wave 131: the risk-coverage curve and the
Gini mean difference.

Reference anchor: the reference serves every LLM match score
unconditionally (src/rss_feed_etl/llm/scorer.py); the risk-coverage
curve prices an abstention threshold for exactly those scores, and the
GMD is the dispersion read ``value_outliers``-style σ rules get wrong
on heavy tails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import profiling

# --- risk-coverage curve ------------------------------------------------------------
# Planted classifier from the wave-122/124 family: confidence tracks
# value, correctness is the thresholded comparison with event-id noise.


def _q_risk_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    conf = F.round(
        F.least(F.lit(0.99), F.greatest(F.lit(0.01), F.col("value") / 100.0)),
        6,
    )
    label = F.col("value") + (F.col("event_id") % 40) > 60
    pred = F.col("value") > 50
    staged = ev.select(
        conf.alias("confidence"), (pred == label).alias("correct")
    )
    return profiling.risk_coverage_curve(staged)


_register(
    "risk_coverage_curve",
    _q_risk_cov,
    """
WITH staged AS (
  SELECT round(least(CAST(0.99 AS DOUBLE),
               greatest(CAST(0.01 AS DOUBLE), value / 100.0)), 6) AS conf,
         (value > 50) = (value + (event_id % 40) > 60) AS correct
  FROM events),
b AS (SELECT ntile(10) OVER (ORDER BY conf DESC, correct ASC) AS bucket,
             CASE WHEN correct THEN 0 ELSE 1 END AS err
      FROM staged),
g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(err) AS BIGINT) AS e
      FROM b GROUP BY 1)
SELECT round(bucket / CAST(10.0 AS DOUBLE), 6) AS coverage,
       CAST(sum(m) OVER w AS BIGINT) AS n_served,
       CAST(sum(e) OVER w AS BIGINT) AS n_errors,
       round(CAST(sum(e) OVER w AS DOUBLE) / sum(m) OVER w, 6)
         AS selective_risk
FROM g
WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
""",
)


# --- Gini mean difference per event type --------------------------------------------


def _q_gmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    staged = ev.select(
        F.col("event_type").alias("grp"), F.col("value").alias("v")
    )
    return profiling.gini_mean_difference(staged)


_register(
    "gini_mean_difference",
    _q_gmd,
    """
WITH vals AS (SELECT event_type AS g, value AS v,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2),
vg AS (SELECT *,
              coalesce(sum(c) OVER w, 0) AS cb,
              CAST(coalesce(sum(CAST(round(c * v, 6) AS DECIMAL(38,10)))
                   OVER w, CAST(0 AS DECIMAL(38,10))) AS DOUBLE) AS sb
       FROM vals
       WINDOW w AS (PARTITION BY g ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
agg AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(round(c * v, 6) AS DECIMAL(38,10))) AS DOUBLE) AS vs,
         CAST(sum(CAST(round(c * (cb * v - sb), 6) AS DECIMAL(38,10)))
              AS DOUBLE) AS pairsum
  FROM vg GROUP BY 1)
SELECT g AS grp, n,
       round(vs / n, 6) AS mean,
       round(2.0 * pairsum / CAST(n * (n - 1) AS DOUBLE), 6) AS gmd,
       CASE WHEN vs / n > 0
            THEN round((2.0 * pairsum / CAST(n * (n - 1) AS DOUBLE))
                       / (vs / n), 6) END AS relative_gmd
FROM agg WHERE n > 1
""",
)
