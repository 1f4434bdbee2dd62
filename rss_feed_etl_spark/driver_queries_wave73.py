"""Wave-73 driver queries: CUPED variance-reduced A/B readout and
inter-event burstiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import eventanalytics as ea


def _q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.cuped_adjustment(td.load_table(spark, sf_dir, "events"))


# scalar fragments shared so the mirrored arithmetic is written ONCE
_ND = "CAST(n AS DOUBLE)"
_GND = "CAST(gn AS DOUBLE)"
_MX = f"(CAST(sx AS DOUBLE) / {_ND})"
_MY = f"(CAST(sy AS DOUBLE) / {_ND})"
_GMX = f"(CAST(gsx AS DOUBLE) / {_GND})"
_TH = (
    f"(({_GND} * CAST(gsxy AS DOUBLE) - CAST(gsx AS DOUBLE) * CAST(gsy AS DOUBLE))"
    f" / ({_GND} * CAST(gsxx AS DOUBLE) - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)))"
)
_VPOST = f"(CAST(syy AS DOUBLE) / {_ND} - {_MY} * {_MY})"
_VPRE = f"(CAST(sxx AS DOUBLE) / {_ND} - {_MX} * {_MX})"
_COV = f"(CAST(sxy AS DOUBLE) / {_ND} - {_MX} * {_MY})"
_VADJ = f"({_VPOST} + {_TH} * {_TH} * {_VPRE} - 2.0 * {_TH} * {_COV})"
_DEC0 = "CAST(0 AS DECIMAL(30,10))"

_register(
    "cuped_adjustment",
    _q_cuped,
    f"""
WITH b AS (SELECT min(epoch(ts)) AS e0, max(epoch(ts)) AS e1 FROM events),
pu AS (
  SELECT user_id AS u,
         sum(CASE WHEN epoch(ts) < (e0 + e1) / 2.0
                  THEN CAST(value AS DECIMAL(30,10)) ELSE {_DEC0} END) AS pre,
         sum(CASE WHEN epoch(ts) >= (e0 + e1) / 2.0
                  THEN CAST(value AS DECIMAL(30,10)) ELSE {_DEC0} END) AS post
  FROM events, b GROUP BY 1),
c AS (
  SELECT ({_code('CAST(u AS VARCHAR)')}) % 2 AS arm,
         CAST(round(pre * 100, 0) AS BIGINT) AS pc,
         CAST(round(post * 100, 0) AS BIGINT) AS qc
  FROM pu),
a AS (
  SELECT arm, CAST(count(*) AS BIGINT) n,
         CAST(sum(pc) AS BIGINT) sx, CAST(sum(qc) AS BIGINT) sy,
         CAST(sum(pc * pc) AS BIGINT) sxx, CAST(sum(qc * qc) AS BIGINT) syy,
         CAST(sum(pc * qc) AS BIGINT) sxy
  FROM c GROUP BY 1),
g AS (
  SELECT *, CAST(sum(n) OVER () AS BIGINT) gn,
         CAST(sum(sx) OVER () AS BIGINT) gsx,
         CAST(sum(sy) OVER () AS BIGINT) gsy,
         CAST(sum(sxx) OVER () AS BIGINT) gsxx,
         CAST(sum(sxy) OVER () AS BIGINT) gsxy
  FROM a)
SELECT CAST(arm AS INT) AS arm, n AS n_users,
       round({_MY} / 100.0, 6) AS mean_post,
       round(({_MY} - {_TH} * ({_MX} - {_GMX})) / 100.0, 6) AS mean_adj,
       round(100.0 * (1.0 - {_VADJ} / {_VPOST}), 6) AS var_reduction_pct
FROM g
""",
)


def _q_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.interevent_burstiness(td.load_table(spark, sf_dir, "events"))


_BMU = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
_BSIG = (
    f"sqrt(greatest(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - {_BMU} * {_BMU}, 0.0))"
)

_register(
    "interevent_burstiness",
    _q_burst,
    f"""
WITH g0 AS (
  SELECT event_type AS t,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts ASC, event_id ASC) AS gap_us
  FROM events),
g1 AS (
  SELECT t, CAST(gap_us // 1000000 AS BIGINT) AS g
  FROM g0 WHERE gap_us IS NOT NULL),
a AS (
  SELECT t, CAST(count(*) AS BIGINT) n, CAST(sum(g) AS BIGINT) s,
         CAST(sum(g * g) AS BIGINT) sq
  FROM g1 GROUP BY 1)
SELECT t AS event_type, n AS n_gaps,
       round({_BMU}, 6) AS mean_gap_s,
       round(CASE WHEN ({_BSIG} + {_BMU}) > 0
                  THEN ({_BSIG} - {_BMU}) / ({_BSIG} + {_BMU})
                  ELSE 0.0 END, 6) AS burstiness
FROM a WHERE n >= 2
""",
)
