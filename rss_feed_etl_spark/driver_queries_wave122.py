"""Driver-contract queries, wave 122: exact Shapley-value attribution
and the Murphy decomposition of the Brier score.

Reference anchor: the reference pipeline stamps rows with reader/source
provenance (src/rss_feed_etl/core/config.py feeds); Shapley is the
coalition-fair split of conversion credit across those sources that the
last-touch/time-decay/positional heuristics already in the registry
approximate, and the Brier decomposition is the scalar scorecard for
any probability the LLM scorer emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics, profiling

# --- exact Shapley attribution -----------------------------------------------------

_SH_CHANNELS = ("click", "error", "signup", "view")


def _q_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return eventanalytics.shapley_attribution(ev, channels=_SH_CHANNELS)


_register(
    "shapley_attribution",
    _q_shapley,
    """
WITH fc AS (SELECT user_id AS u, min(ts) AS conv_ts
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
pre AS (SELECT DISTINCT e.user_id AS u, e.event_type AS t
        FROM events e JOIN fc ON e.user_id = fc.u
        WHERE e.ts < fc.conv_ts AND e.event_type <> 'purchase'),
masks AS (SELECT mask, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT u, CAST(sum(CASE t WHEN 'click' THEN 1 WHEN 'error' THEN 2
                              WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                              ELSE 0 END) AS BIGINT) AS mask
            FROM pre GROUP BY 1) WHERE mask > 0 GROUP BY 1),
subsets AS (SELECT CAST(unnest(range(16)) AS BIGINT) AS T),
v AS (SELECT T, CAST(sum(coalesce(cnt, 0)) AS BIGINT) AS v
      FROM subsets LEFT JOIN masks ON (mask & T) = mask GROUP BY 1),
ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
                             ('signup', 4), ('view', 8)) AS t(channel, bit)),
pairs AS (
  SELECT ch.channel,
         (CASE bit_count(a.T) WHEN 0 THEN 6 WHEN 1 THEN 2
               WHEN 2 THEN 2 WHEN 3 THEN 6 END) * (b.v - a.v) AS term
  FROM v a CROSS JOIN ch
  JOIN v b ON b.T = a.T + ch.bit
  WHERE (a.T & ch.bit) = 0),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_conversions FROM masks)
SELECT channel,
       round(CAST(sum(term) AS DOUBLE) / 24, 6) AS shapley_credit,
       n_conversions
FROM pairs, tot GROUP BY 1, 3
""",
)


# --- Brier decomposition -----------------------------------------------------------
# Deterministic forecast/outcome pair planted from the events stream:
# the score tracks value, the outcome adds event_id-keyed noise.


def _q_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.round(
            F.least(
                F.lit(0.99), F.greatest(F.lit(0.01), F.col("value") / 100.0)
            ),
            6,
        ).alias("score"),
        (F.col("value") + (F.col("event_id") % 40) > 60).cast("int")
        .alias("label"),
    )
    return profiling.brier_decomposition(scored)


_register(
    "brier_decomposition",
    _q_brier,
    """
WITH scored AS (
  SELECT round(least(CAST(0.99 AS DOUBLE),
                     greatest(CAST(0.01 AS DOUBLE), value / 100.0)), 6) AS s,
         CASE WHEN value + (event_id % 40) > 60 THEN 1.0 ELSE 0.0 END AS y
  FROM events),
rows_ AS (SELECT CASE WHEN s >= 1.0 THEN 9
                      ELSE CAST(floor(s * 10) AS INT) END AS bin, s, y
          FROM scored),
bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS nk,
                round(avg(s), 9) AS sk, round(avg(y), 9) AS yk
         FROM rows_ GROUP BY 1),
base AS (SELECT CAST(count(*) AS BIGINT) AS n, round(avg(y), 9) AS ybar,
                round(CAST(sum(CAST(round((s - y) * (s - y), 9)
                                    AS DECIMAL(30,10))) AS DOUBLE)
                      / count(*), 6) AS brier
         FROM rows_),
parts AS (
  SELECT n, ybar, brier,
         CAST(round((nk / CAST(n AS DOUBLE)) * (sk - yk) * (sk - yk), 9)
              AS DECIMAL(30,10)) AS rel_t,
         CAST(round((nk / CAST(n AS DOUBLE)) * (yk - ybar) * (yk - ybar), 9)
              AS DECIMAL(30,10)) AS res_t
  FROM bins, base)
SELECT n, brier,
       round(CAST(sum(rel_t) AS DOUBLE), 6) AS reliability,
       round(CAST(sum(res_t) AS DOUBLE), 6) AS resolution,
       round(ybar * (1.0 - ybar), 6) AS uncertainty
FROM parts GROUP BY n, brier, ybar
""",
)
