"""Wave-90 driver query: Holt forecast with conformal residual interval
(oracle recovers per-step residuals from the recursion's cumulative
|error| differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import timeseries

_A = 0.3
_B = 0.1
_H = 7
_Q = 0.9
_OMA = 1.0 - _A
_OMB = 1.0 - _B

_L2 = (
    f"CAST({_A!r} AS DOUBLE) * d.x "
    f"+ CAST({_OMA!r} AS DOUBLE) * (r.l + r.b)"
)


def _q_hfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return timeseries.holt_forecast_interval(
        td.load_table(spark, sf_dir, "events"),
        alpha=_A, beta=_B, horizon=_H, q=_Q,
    )


_register(
    "holt_forecast_interval",
    _q_hfi,
    f"""
WITH RECURSIVE dd AS (
  SELECT event_type AS t, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
d AS (
  SELECT t, CAST(n AS DOUBLE) AS x,
         row_number() OVER (PARTITION BY t ORDER BY day) AS idx
  FROM dd),
nn AS (SELECT t, max(idx) AS nmax FROM d GROUP BY 1),
rec AS (
  SELECT d1.t, CAST(2 AS BIGINT) AS i, d1.x AS l, d2.x - d1.x AS b,
         CAST(NULL AS DOUBLE) AS res
  FROM d d1 JOIN d d2 ON d1.t = d2.t AND d1.idx = 1 AND d2.idx = 2
  UNION ALL
  SELECT r.t, r.i + 1,
         {_L2},
         CAST({_B!r} AS DOUBLE) * (({_L2}) - r.l)
           + CAST({_OMB!r} AS DOUBLE) * r.b,
         abs(d.x - (r.l + r.b))
  FROM rec r JOIN d ON d.t = r.t AND d.idx = r.i + 1),
resid AS (SELECT t, res FROM rec WHERE res IS NOT NULL),
rq AS (SELECT t, quantile_cont(res, {_Q!r}) AS rq FROM resid GROUP BY 1),
fin AS (
  SELECT r.t, nn.nmax, r.l + CAST({float(_H)!r} AS DOUBLE) * r.b AS fc
  FROM rec r JOIN nn ON r.t = nn.t AND r.i = nn.nmax
  WHERE nn.nmax >= 3)
SELECT fin.t AS event_type, CAST(fin.nmax AS BIGINT) AS n_days,
       round(fc, 6) AS forecast_h, round(rq, 6) AS resid_q,
       round(fc - rq, 6) AS lo, round(fc + rq, 6) AS hi
FROM fin JOIN rq ON fin.t = rq.t
""",
)
