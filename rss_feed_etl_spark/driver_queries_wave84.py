"""Wave-84 driver queries: multi-window SLO burn-rate alerting and
user hour-of-day divergence (bot screen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea
from .operators import timeseries

_BUDGET = 0.21  # breaches non-trivially at BOTH checked SFs
_LONG_H = 6


def _q_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return timeseries.slo_burn_rate(
        td.load_table(spark, sf_dir, "events"),
        slo_budget=_BUDGET, long_window_hours=_LONG_H,
    )


_register(
    "slo_burn_rate",
    _q_burn,
    f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) n,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) e
  FROM events GROUP BY 1),
r AS (
  SELECT hr, n, e,
         CAST(sum(n) OVER w AS BIGINT) nl, CAST(sum(e) OVER w AS BIGINT) el
  FROM h WINDOW w AS (ORDER BY hr
    ROWS BETWEEN {_LONG_H - 1} PRECEDING AND CURRENT ROW))
SELECT strftime(hr, '%Y-%m-%d %H:00') AS hour, n AS n_events,
       round((CAST(e AS DOUBLE) / CAST(n AS DOUBLE)) / {_BUDGET!r}, 6)
         AS burn_1h,
       round((CAST(el AS DOUBLE) / CAST(nl AS DOUBLE)) / {_BUDGET!r}, 6)
         AS burn_{_LONG_H}h
FROM r
WHERE (CAST(e AS DOUBLE) / CAST(n AS DOUBLE)) / {_BUDGET!r} > 1.0
  AND (CAST(el AS DOUBLE) / CAST(nl AS DOUBLE)) / {_BUDGET!r} > 1.0
""",
)

_UHD_K = 20
_UHD_MIN = 10


def _q_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.user_hour_divergence(
        td.load_table(spark, sf_dir, "events"), top_k=_UHD_K, min_events=_UHD_MIN
    )


_HSUMS = ", ".join(
    f"CAST(sum(CASE WHEN hour(ts) = {i} THEN 1 ELSE 0 END) AS BIGINT) AS h{i}"
    for i in range(24)
)
_GSUMS = ", ".join(
    f"CAST(sum(h{i}) AS BIGINT) AS g{i}" for i in range(24)
)
_P = "(CAST(h{i} AS DOUBLE) / CAST(n AS DOUBLE))"
_Q = "(CAST(g{i} AS DOUBLE) / CAST(gn AS DOUBLE))"
_KL = " + ".join(
    "CASE WHEN h{i} > 0 THEN {p} * ln({p} / {q}) ELSE 0.0 END".format(
        i=i, p=_P.format(i=i), q=_Q.format(i=i)
    )
    for i in range(24)
)

_register(
    "user_hour_divergence",
    _q_divergence,
    f"""
WITH per AS (
  SELECT user_id AS u, CAST(count(*) AS BIGINT) n, {_HSUMS}
  FROM events GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) gn, {_GSUMS} FROM per),
s AS (
  SELECT u AS user_id, n AS n_events, round({_KL}, 6) AS kl
  FROM per, tot WHERE n >= {_UHD_MIN})
SELECT * FROM s ORDER BY kl DESC, user_id ASC LIMIT {_UHD_K}
""",
)
