"""Wave-92 driver queries: Hill tail exponent of user activity and
daily top-k persistence with streaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea
from .operators import profiling

_TQ = 0.9


def _q_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.hill_tail_exponent(
        td.load_table(spark, sf_dir, "events"), tail_q=_TQ
    )


_register(
    "hill_tail_exponent",
    _q_hill,
    f"""
WITH per AS (
  SELECT user_id AS u, CAST(count(*) AS BIGINT) c FROM events GROUP BY 1),
xm AS (SELECT quantile_cont(c, {_TQ!r}) AS xm FROM per),
grid AS (
  SELECT c, CAST(count(*) AS BIGINT) nc, any_value(xm) AS xm
  FROM per, xm WHERE CAST(c AS DOUBLE) >= xm GROUP BY 1),
cum AS (
  SELECT CAST(sum(nc) OVER w AS BIGINT) ntail,
         sum(CAST(nc AS DOUBLE) * ln(CAST(c AS DOUBLE) / xm)) OVER w AS slog,
         xm, row_number() OVER (ORDER BY c DESC) AS rn
  FROM grid WINDOW w AS (ORDER BY c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT ntail AS n_tail, round(xm, 6) AS x_min,
       round(CASE WHEN slog > 0
                  THEN CAST(ntail AS DOUBLE) / slog END, 6) AS alpha_hat
FROM cum WHERE rn = 1
""",
)

_K = 10


def _q_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.topk_persistence(td.load_table(spark, sf_dir, "events"), k=_K)


_register(
    "topk_persistence",
    _q_persist,
    f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, json_extract_string(props, '$.k') item,
         CAST(count(*) AS BIGINT) n
  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
  GROUP BY 1, 2),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY day
      ORDER BY n DESC, item ASC) r FROM daily)
  WHERE r <= {_K}),
d0 AS (SELECT min(day) AS d0 FROM top),
idx AS (
  SELECT item, CAST(date_diff('day', d0, day) AS BIGINT) di FROM top, d0),
isl AS (
  SELECT item, di,
         di - row_number() OVER (PARTITION BY item ORDER BY di) AS grp
  FROM idx),
st AS (
  SELECT item, grp, CAST(count(*) AS BIGINT) len FROM isl GROUP BY 1, 2)
SELECT item, CAST(sum(len) AS BIGINT) AS n_days_in_topk,
       CAST(max(len) AS BIGINT) AS max_streak
FROM st GROUP BY 1
""",
)
