"""Wave-77 driver queries: time-partition granularity advisor and RFM
lifecycle segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea
from .operators import layout

_WIN = 7


def _q_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return layout.partition_granularity_advisor(
        td.load_table(spark, sf_dir, "events"), window_days=_WIN
    )


_register(
    "partition_granularity_advisor",
    _q_granularity,
    f"""
WITH hi AS (SELECT max(ts) AS tmax FROM events),
t AS (
  SELECT g, p,
         CASE WHEN ts >= tmax - INTERVAL {_WIN} DAY THEN 1 ELSE 0 END AS in_win
  FROM (
    SELECT e.ts, hi.tmax,
           unnest(['day', 'week', 'month']) AS g,
           unnest([date_trunc('day', e.ts), date_trunc('week', e.ts),
                   date_trunc('month', e.ts)]) AS p
    FROM events e, hi)),
parts AS (
  SELECT g, p, CAST(count(*) AS BIGINT) AS nrows,
         CAST(sum(in_win) AS BIGINT) AS mt
  FROM t GROUP BY 1, 2)
SELECT g AS granularity,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(CASE WHEN mt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS partitions_read,
       CAST(sum(CASE WHEN mt > 0 THEN nrows ELSE 0 END) AS BIGINT) AS rows_read,
       CAST(sum(mt) AS BIGINT) AS rows_matching,
       round(CAST(sum(CASE WHEN mt > 0 THEN nrows ELSE 0 END) AS DOUBLE)
             / CAST(sum(mt) AS DOUBLE), 6) AS read_amplification
FROM parts GROUP BY 1
""",
)


def _q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.rfm_segments(td.load_table(spark, sf_dir, "events"))


_QS = (20, 40, 60, 80)
_CUTS = ", ".join(
    f"quantile_cont({c}, {q / 100.0}) AS {c}_{q}"
    for c in ("rec", "freq", "mon_c")
    for q in _QS
)


def _score(col: str) -> str:
    terms = " + ".join(
        f"CASE WHEN CAST({col} AS DOUBLE) > {col}_{q} THEN 1 ELSE 0 END"
        for q in _QS
    )
    return f"(1 + {terms})"


_register(
    "rfm_segments",
    _q_rfm,
    f"""
WITH pu0 AS (
  SELECT user_id AS u, max(CAST(ts AS DATE)) AS last_day,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(round(sum(CAST(value AS DECIMAL(30,10))) * 100, 0) AS BIGINT)
           AS mon_c
  FROM events GROUP BY 1),
h AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
pu AS (
  SELECT CAST(date_diff('day', last_day, max_day) AS BIGINT) AS rec,
         freq, mon_c
  FROM pu0, h),
cuts AS (SELECT {_CUTS} FROM pu),
s AS (
  SELECT {_score('rec')} AS r_score, {_score('freq')} AS f_score,
         {_score('mon_c')} AS m_score, mon_c
  FROM pu, cuts)
SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(sum(mon_c) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0, 2)
         AS avg_monetary
FROM s GROUP BY 1, 2, 3
""",
)
