"""Wave-71 driver queries: Holt double-exponential forecast (sequential
struct fold, mirrored by DuckDB list_reduce) and the A/B sample-ratio-
mismatch check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import profiling, timeseries

_A = 0.3
_B = 0.1
_H = 7
# literals below are the SAME Python doubles the Spark operator embeds —
# repr() round-trips them exactly, so both engines fold identical IEEE ops
_OMA = 1.0 - _A
_OMB = 1.0 - _B


def _q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return timeseries.holt_forecast(ev, alpha=_A, beta=_B, horizon=_H)


# The oracle mirrors the fold with a RECURSIVE CTE, not list_reduce:
# DuckDB 1.0.0's list_reduce evaluates struct fields against an
# accumulator it mutates IN PLACE from the second application onward
# (later fields read already-updated earlier fields; the first
# application is atomic) — no field ordering is correct under both
# behaviors.  The recursion is scalar SQL per step, standard semantics.
# Float literals are CAST AS DOUBLE (bare decimals type as DECIMAL and
# would change the arithmetic); the literals repr() the SAME Python
# doubles the Spark operator embeds, so both engines fold identical
# IEEE ops.
_L2 = (
    f"CAST({_A!r} AS DOUBLE) * d.x "
    f"+ CAST({_OMA!r} AS DOUBLE) * (r.l + r.b)"
)

_register(
    "holt_forecast",
    _q_holt,
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
         CAST(0.0 AS DOUBLE) AS ae, CAST(0.0 AS DOUBLE) AS k
  FROM d d1 JOIN d d2 ON d1.t = d2.t AND d1.idx = 1 AND d2.idx = 2
  UNION ALL
  SELECT r.t, r.i + 1,
         {_L2},
         CAST({_B!r} AS DOUBLE) * (({_L2}) - r.l)
           + CAST({_OMB!r} AS DOUBLE) * r.b,
         r.ae + abs(d.x - (r.l + r.b)),
         r.k + CAST(1.0 AS DOUBLE)
  FROM rec r JOIN d ON d.t = r.t AND d.idx = r.i + 1)
SELECT r.t AS event_type, CAST(nn.nmax AS BIGINT) AS n_days,
       round(r.l, 6) AS level, round(r.b, 6) AS trend,
       round(r.l + CAST({float(_H)!r} AS DOUBLE) * r.b, 6) AS forecast_h,
       round(CASE WHEN r.k > 0 THEN r.ae / r.k END, 6) AS mae
FROM rec r JOIN nn ON r.t = nn.t AND r.i = nn.nmax
WHERE nn.nmax >= 2
""",
)

_CRIT = 3.841


def _q_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return profiling.srm_check(ev, critical=_CRIT)


_E = "CAST(n AS DOUBLE) / 2.0"
_CHI = (
    f"(CAST(arm0 AS DOUBLE) - {_E}) * (CAST(arm0 AS DOUBLE) - {_E}) / ({_E})"
    f" + (CAST(arm1 AS DOUBLE) - {_E}) * (CAST(arm1 AS DOUBLE) - {_E}) / ({_E})"
)

_register(
    "srm_check",
    _q_srm,
    f"""
WITH u AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS us FROM events),
a AS (SELECT ({_code('us')}) % 2 AS arm FROM u),
c AS (
  SELECT CAST(count(*) AS BIGINT) n,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) arm0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) arm1
  FROM a)
SELECT n AS n_units, arm0, arm1,
       round({_CHI}, 6) AS chi2,
       CAST(CASE WHEN ({_CHI}) > {_CRIT} THEN 1 ELSE 0 END AS INT) AS srm_flag
FROM c
""",
)
