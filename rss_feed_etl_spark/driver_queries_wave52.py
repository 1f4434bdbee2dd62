"""Driver-contract queries, wave 52: cohort LTV curves and term-level
vocabulary drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea, textstats

# --- cohort LTV -------------------------------------------------------------


def _q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.cohort_ltv(td.load_table(spark, sf_dir, "events"))


_register(
    "cohort_ltv",
    _q_cohort_ltv,
    """
WITH f AS (SELECT user_id AS u, min(CAST(ts AS DATE)) AS cohort_day
           FROM events GROUP BY 1),
s AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM f GROUP BY 1),
rev AS (SELECT f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS offset_days,
               sum(e.value) AS rev
        FROM events e JOIN f ON e.user_id = f.u
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
c AS (SELECT cohort_day, offset_days,
             sum(rev) OVER (PARTITION BY cohort_day ORDER BY offset_days
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev
      FROM rev)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day, c.offset_days,
       s.cohort_size, round(c.cum_rev / s.cohort_size, 4)
         AS cum_revenue_per_user
FROM c JOIN s ON c.cohort_day = s.cohort_day
""",
)


# --- vocabulary drift -------------------------------------------------------

_VD_MIN_DF = 20
_VD_TOP = 30


def _q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return textstats.vocab_drift_terms(
        old, new, min_df=_VD_MIN_DF, top=_VD_TOP
    )


_register(
    "vocab_drift_terms",
    _q_vocab_drift,
    f"""
WITH o AS (
  SELECT term, count(*) AS df_old FROM (
    SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
    FROM documents WHERE doc_id % 2 = 0) GROUP BY 1),
n AS (
  SELECT term, count(*) AS df_new FROM (
    SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
    FROM documents WHERE doc_id % 2 = 1) GROUP BY 1),
cn AS (SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_old,
              CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n_new
       FROM documents),
j AS (SELECT coalesce(o.term, n.term) AS term,
             CAST(coalesce(df_old, 0) AS BIGINT) AS df_old,
             CAST(coalesce(df_new, 0) AS BIGINT) AS df_new
      FROM o FULL OUTER JOIN n ON o.term = n.term)
SELECT term, df_old, df_new,
       round(log2(((df_new + 0.5) / n_new) / ((df_old + 0.5) / n_old)), 6)
         AS log2_ratio
FROM j, cn
WHERE df_old + df_new >= {_VD_MIN_DF}
ORDER BY abs(log2(((df_new + 0.5) / n_new) / ((df_old + 0.5) / n_old))) DESC,
         term ASC
LIMIT {_VD_TOP}
""",
)
