"""Wave-87 driver queries: per-user panel slopes and Kitagawa
rate-change decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import eventanalytics as ea

_MIN_DAYS = 3


def _q_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.panel_user_slopes(
        td.load_table(spark, sf_dir, "events"), min_days=_MIN_DAYS
    )


_DEN = (
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)

_register(
    "panel_user_slopes",
    _q_slopes,
    f"""
WITH daily AS (
  SELECT user_id u, CAST(ts AS DATE) d,
         CAST(round(sum(CAST(value AS DECIMAL(30,10))) * 100, 0) AS BIGINT) yc
  FROM events GROUP BY 1, 2),
idx AS (
  SELECT u, CAST(date_diff('day', min(d) OVER (PARTITION BY u), d)
                 AS BIGINT) x, yc
  FROM daily),
per AS (
  SELECT u, CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) sx,
         CAST(sum(yc) AS BIGINT) sy, CAST(sum(x * yc) AS BIGINT) sxy,
         CAST(sum(x * x) AS BIGINT) sxx
  FROM idx GROUP BY 1),
sl AS (
  SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / {_DEN} / 100.0 AS s
  FROM per WHERE n >= {_MIN_DAYS} AND {_DEN} > 0)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(quantile_cont(s, 0.5), 6) AS median_slope,
       round(quantile_cont(s, 0.25), 6) AS p25_slope,
       round(quantile_cont(s, 0.75), 6) AS p75_slope,
       round(CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS frac_positive
FROM sl
""",
)


def _q_kitagawa(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.kitagawa_rate_decomposition(td.load_table(spark, sf_dir, "events"))


_R1 = "(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
_R2 = "(CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
_W1 = "(CAST(n1 AS DOUBLE) / CAST(tn1 AS DOUBLE))"
_W2 = "(CAST(n2 AS DOUBLE) / CAST(tn2 AS DOUBLE))"

_register(
    "kitagawa_rate_decomposition",
    _q_kitagawa,
    f"""
WITH b AS (SELECT min(epoch(ts)) e0, max(epoch(ts)) e1 FROM events),
cells AS (
  SELECT ({_code('CAST(user_id AS VARCHAR)')}) % 4 AS seg,
         CASE WHEN epoch(ts) >= (e0 + e1) / 2.0 THEN 1 ELSE 0 END AS era,
         CAST(count(*) AS BIGINT) n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) c
  FROM events, b GROUP BY 1, 2),
piv AS (
  SELECT seg,
         CAST(sum(CASE WHEN era = 0 THEN n ELSE 0 END) AS BIGINT) n1,
         CAST(sum(CASE WHEN era = 1 THEN n ELSE 0 END) AS BIGINT) n2,
         CAST(sum(CASE WHEN era = 0 THEN c ELSE 0 END) AS BIGINT) c1,
         CAST(sum(CASE WHEN era = 1 THEN c ELSE 0 END) AS BIGINT) c2
  FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(n1) AS BIGINT) tn1, CAST(sum(n2) AS BIGINT) tn2,
         CAST(sum(c1) AS BIGINT) tc1, CAST(sum(c2) AS BIGINT) tc2
  FROM piv),
g AS (SELECT piv.*, tot.* FROM piv, tot),
eff AS (
  SELECT seg, {_W2} * ({_R2} - {_R1}) AS re, ({_W2} - {_W1}) * {_R1} AS me,
         CAST(tc1 AS DOUBLE) / CAST(tn1 AS DOUBLE) AS tr1,
         CAST(tc2 AS DOUBLE) / CAST(tn2 AS DOUBLE) AS tr2,
         n1, n2, c1, c2
  FROM g),
o AS (
  SELECT any_value(tr1) tr1, any_value(tr2) tr2,
         {", ".join(f"sum(CASE WHEN seg = {k} THEN re ELSE 0.0 END) re{k}, "
                    f"sum(CASE WHEN seg = {k} THEN me ELSE 0.0 END) me{k}"
                    for k in range(4))}
  FROM eff)
SELECT CAST(seg AS VARCHAR) AS segment,
       round({_R1}, 6) AS rate_old, round({_R2}, 6) AS rate_new,
       round({_W2} * ({_R2} - {_R1}), 6) AS rate_effect,
       round(({_W2} - {_W1}) * {_R1}, 6) AS mix_effect
FROM g WHERE n1 > 0 AND n2 > 0
UNION ALL
SELECT 'OVERALL', round(tr1, 6), round(tr2, 6),
       round(re0 + re1 + re2 + re3, 6), round(me0 + me1 + me2 + me3, 6)
FROM o
""",
)
