"""Wave-66 driver queries: CUSUM changepoint detection on daily event
series and leave-one-source-out corpus influence (data valuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, timeseries, textstats

_K = 0.5
_H = 4.0


def _q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return timeseries.cusum_changepoints(ev, drift_k=_K, alarm_h=_H)


_register(
    "cusum_changepoints",
    _q_cusum,
    f"""
WITH d AS (
  SELECT event_type AS t, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
st AS (
  SELECT t, CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS sq,
         CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY 1),
z AS (
  SELECT d.t, d.day,
         (CAST(d.n AS DOUBLE) - CAST(st.s AS DOUBLE) / st.c)
           / sqrt(greatest(CAST(st.sq AS DOUBLE) / st.c
                           - (CAST(st.s AS DOUBLE) / st.c)
                             * (CAST(st.s AS DOUBLE) / st.c), 0.0)) AS zv,
         sqrt(greatest(CAST(st.sq AS DOUBLE) / st.c
                       - (CAST(st.s AS DOUBLE) / st.c)
                         * (CAST(st.s AS DOUBLE) / st.c), 0.0)) AS sd
  FROM d JOIN st ON d.t = st.t),
r AS (
  SELECT t, day,
         sum(zv - {_K}) OVER (PARTITION BY t ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rp,
         sum(-zv - {_K}) OVER (PARTITION BY t ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn
  FROM z WHERE sd > 0),
s AS (
  SELECT t, day,
         rp - least(min(rp) OVER (PARTITION BY t ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS sp,
         rn - least(min(rn) OVER (PARTITION BY t ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS sn
  FROM r)
SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_days,
       round(max(sp), 6) AS max_cusum_pos,
       round(max(sn), 6) AS max_cusum_neg,
       CAST(sum(CASE WHEN sp > {_H} OR sn > {_H} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm_days,
       strftime(min(CASE WHEN sp > {_H} OR sn > {_H} THEN day END),
                '%Y-%m-%d') AS first_alarm_day
FROM s GROUP BY 1
""",
)


def _q_loso(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return profiling.loso_source_influence(
        docs, textstats.token_count(F.col("text"))
    )


_register(
    "loso_source_influence",
    _q_loso,
    r"""
WITH per AS (
  SELECT source,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END)
              AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(sum(s) AS BIGINT) AS ts, CAST(sum(n) AS BIGINT) AS tn FROM per)
SELECT per.source, per.n AS n_docs,
       round(CAST(tot.ts AS DOUBLE) / tot.tn, 6) AS mean_overall,
       round(CASE WHEN tot.tn > per.n
                  THEN CAST(tot.ts - per.s AS DOUBLE) / (tot.tn - per.n) END, 6)
         AS mean_without,
       round(CASE WHEN tot.tn > per.n
                  THEN CAST(tot.ts - per.s AS DOUBLE) / (tot.tn - per.n) END
             - CAST(tot.ts AS DOUBLE) / tot.tn, 6) AS influence
FROM per CROSS JOIN tot
""",
)
