"""Driver-contract queries, wave 124: temperature-scaling calibration
fit and length-matched eval/train pairing.

Reference anchor: the reference trusts its LLM match scores raw
(src/rss_feed_etl/llm/scorer.py); temperature scaling is the
one-parameter fix for exactly that overconfidence, and length matching
is the covariate control an honest before/after filter comparison runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, sampling

# --- temperature scaling grid fit ---------------------------------------------------

_TS_GRID = (0.25, 0.35, 0.5, 0.7, 1.0, 1.4, 2.0, 2.8, 4.0)


def _q_temp_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    scored = ev.select(
        ((F.col("value") - 60.0) / 30.0).alias("logit"),
        (F.col("value") + (F.col("event_id") % 40) > 60).cast("int")
        .alias("label"),
    )
    return profiling.temperature_scaling_fit(scored, temperatures=_TS_GRID)


_TS_LIST = ", ".join(f"CAST({t} AS DOUBLE)" for t in _TS_GRID)

_register(
    "temperature_scaling_fit",
    _q_temp_fit,
    f"""
WITH rows_ AS (
  SELECT (value - 60.0) / 30.0 AS z,
         CASE WHEN value + (event_id % 40) > 60 THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS y,
         unnest([{_TS_LIST}]) AS t
  FROM events),
pr AS (SELECT t, y,
              least(CAST(1.0 AS DOUBLE) - 1e-9,
                    greatest(CAST(1e-9 AS DOUBLE),
                             CAST(1.0 AS DOUBLE)
                             / (CAST(1.0 AS DOUBLE) + exp(-z / t)))) AS p
       FROM rows_),
g AS (SELECT t,
             round(CAST(sum(CAST(round(-(y * ln(p)
                                        + (CAST(1.0 AS DOUBLE) - y)
                                          * ln(CAST(1.0 AS DOUBLE) - p)), 9)
                                 AS DECIMAL(30,10))) AS DOUBLE)
                   / count(*), 6) AS nll
      FROM pr GROUP BY 1)
SELECT t AS temperature, nll,
       row_number() OVER (ORDER BY nll ASC, t ASC) = 1 AS is_best
FROM g
""",
)


# --- length-matched eval/train pairs -----------------------------------------------

_LM_MOD = 10


def _q_length_matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.length_matched_pairs(
        docs, eval_mod=_LM_MOD, group_col="lang"
    )


_register(
    "length_matched_pairs",
    _q_length_matched,
    rf"""
WITH base AS (
  SELECT doc_id AS id, lang AS g,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS len,
         doc_id % {_LM_MOD} = 0 AS is_eval
  FROM documents),
stair AS (
  SELECT id, g, len, is_eval,
         last_value(CASE WHEN NOT is_eval THEN len END IGNORE NULLS)
           OVER w1 AS prev_len,
         last_value(CASE WHEN NOT is_eval THEN id END IGNORE NULLS)
           OVER w1 AS prev_id,
         first_value(CASE WHEN NOT is_eval THEN len END IGNORE NULLS)
           OVER w2 AS next_len,
         first_value(CASE WHEN NOT is_eval THEN id END IGNORE NULLS)
           OVER w2 AS next_id
  FROM base
  WINDOW w1 AS (PARTITION BY g ORDER BY len ASC, is_eval ASC, id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY g ORDER BY len ASC, is_eval ASC, id ASC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
ev AS (SELECT *, prev_id IS NOT NULL
              AND (next_id IS NULL OR abs(len - prev_len) <= abs(len - next_len))
              AS use_prev
       FROM stair
       WHERE is_eval AND (prev_id IS NOT NULL OR next_id IS NOT NULL))
SELECT id AS eval_id,
       CASE WHEN use_prev THEN prev_id ELSE next_id END AS train_id,
       len AS eval_len,
       CASE WHEN use_prev THEN prev_len ELSE next_len END AS train_len,
       CASE WHEN use_prev THEN abs(len - prev_len)
            ELSE abs(len - next_len) END AS len_diff
FROM ev
""",
)
