"""Wave-67 driver queries: daily-count autocorrelation (periodicity
detection) and l-diversity violations (companion to k-anonymity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, timeseries

_MAXLAG = 14


def _q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return timeseries.daily_autocorrelation(ev, max_lag=_MAXLAG)


# float arithmetic mirrored term-for-term with the operator: every
# distributed sum is an exact bigint; m appears only in scalar products
_M = "(CAST(s AS DOUBLE) / c)"

_register(
    "daily_autocorrelation",
    _q_acf,
    f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1),
mn AS (SELECT min(day) AS d0 FROM d),
i AS (
  SELECT CAST(datediff('day', d0, day) AS BIGINT) AS di, x FROM d, mn),
g AS (
  SELECT CAST(sum(x) AS BIGINT) s, CAST(sum(x * x) AS BIGINT) sq,
         CAST(count(*) AS BIGINT) c
  FROM i),
l AS (SELECT CAST(range AS BIGINT) AS lg FROM range(1, {_MAXLAG + 1})),
p AS (
  SELECT l.lg, a.x AS x1, b.x AS x2
  FROM i a CROSS JOIN l JOIN i b ON b.di = a.di + l.lg),
pl AS (
  SELECT lg, CAST(count(*) AS BIGINT) n_pairs,
         CAST(sum(x1 * x2) AS BIGINT) sxy,
         CAST(sum(x1) AS BIGINT) sx, CAST(sum(x2) AS BIGINT) sy
  FROM p GROUP BY 1)
SELECT lg AS lag, n_pairs,
       round((CAST(sxy AS DOUBLE) - {_M} * CAST(sx AS DOUBLE)
              - {_M} * CAST(sy AS DOUBLE) + n_pairs * {_M} * {_M})
             / (CAST(sq AS DOUBLE) - c * {_M} * {_M}), 6) AS acf
FROM pl, g
WHERE n_pairs >= 2 AND (CAST(sq AS DOUBLE) - c * {_M} * {_M}) > 0
""",
)

_L = 3


def _q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("int").alias("hour_of_day"),
        F.floor(F.col("value") / 50).cast("bigint").alias("value_band"),
    )
    return profiling.l_diversity_violations(
        ev, ["event_type", "day", "hour_of_day"], "value_band", l=_L
    )


_register(
    "l_diversity_violations",
    _q_l_diversity,
    f"""
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(hour(ts) AS INT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS group_size,
       CAST(count(DISTINCT floor(value / 50)) AS BIGINT) AS n_sensitive
FROM events
GROUP BY 1, 2, 3
HAVING count(DISTINCT floor(value / 50)) < {_L}
""",
)
