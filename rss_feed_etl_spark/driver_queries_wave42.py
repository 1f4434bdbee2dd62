"""Driver-contract queries, wave 42: telescoped exponential moving
average smoothing and weight-of-evidence feature binning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea, timeseries as ts

# --- EMA smoothing ----------------------------------------------------------

_EMA_ALPHA = 0.3


def _q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    out = ts.ema_smoothing(daily, alpha=_EMA_ALPHA)
    # string day: duckdb fetches its DATE as a midnight timestamp, which
    # canonicalizes differently from a Spark date
    return out.select(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
        "total", "ema",
    )


_register(
    "ema_daily_revenue",
    _q_ema,
    f"""
WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                  round(sum(value), 2) AS total
           FROM events GROUP BY 1, 2),
s AS (SELECT *,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t,
             first_value(total) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0
      FROM d),
r AS (SELECT *,
             sum(CASE WHEN t > 0 THEN pow({1 - _EMA_ALPHA}, -t) * total
                      ELSE 0.0 END)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM s)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, total,
       round({_EMA_ALPHA} * pow({1 - _EMA_ALPHA}, t) * run
             + pow({1 - _EMA_ALPHA}, t) * x0, 4) AS ema
FROM r
""",
)


# --- WOE binning ------------------------------------------------------------

_WOE_LO, _WOE_HI, _WOE_BINS = 0.0, 500.0, 10


def _q_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.woe_binning(
        td.load_table(spark, sf_dir, "events"),
        lo=_WOE_LO, hi=_WOE_HI, n_bins=_WOE_BINS,
    )


_WOE_W = (_WOE_HI - _WOE_LO) / _WOE_BINS
_register(
    "woe_value_bins",
    _q_woe,
    f"""
WITH b AS (SELECT CASE WHEN value < {_WOE_LO} THEN 0
                       WHEN value >= {_WOE_HI} THEN {_WOE_BINS + 1}
                       ELSE CAST(floor((value - {_WOE_LO}) / {_WOE_W}) AS INT) + 1
                  END AS bucket,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
           FROM events),
g AS (SELECT bucket, CAST(sum(p) AS BIGINT) AS n_pos,
             CAST(sum(1 - p) AS BIGINT) AS n_neg
      FROM b GROUP BY 1),
t AS (SELECT CAST(sum(n_pos) AS DOUBLE) AS P,
             CAST(sum(n_neg) AS DOUBLE) AS N FROM g)
SELECT bucket, n_pos, n_neg,
       round(ln(((n_pos + 0.5) / P) / ((n_neg + 0.5) / N)), 6) AS woe,
       round(((n_pos + 0.5) / P - (n_neg + 0.5) / N)
             * ln(((n_pos + 0.5) / P) / ((n_neg + 0.5) / N)), 6) AS iv_contrib
FROM g, t
""",
)
