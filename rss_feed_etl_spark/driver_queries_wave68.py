"""Wave-68 driver queries: the analytic LSH S-curve for the engine's own
banding constants, and the daily-series correlation matrix across event
types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import dedup, timeseries
from .operators.dedup import LSH_BANDS, N_MINHASH

_R = N_MINHASH // LSH_BANDS
_STEP = 0.05


def _q_lsh_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_sensitivity_curve(spark)


def _chain(expr: str, n: int) -> str:
    return "*".join([f"({expr})"] * n)


_register(
    "lsh_sensitivity_curve",
    _q_lsh_curve,
    f"""
WITH grid AS (
  SELECT round(CAST(range AS DOUBLE) * {_STEP}, 2) AS s
  FROM range(1, {int(round(1.0 / _STEP))})),
p AS (SELECT s, {_chain('s', _R)} AS pb FROM grid)
SELECT s, round(pb, 6) AS p_band,
       round(1.0 - {_chain('1.0 - pb', LSH_BANDS)}, 6) AS p_detect
FROM p
""",
)


def _q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return timeseries.series_correlation_matrix(ev)


_register(
    "series_correlation_matrix",
    _q_corr,
    """
WITH d AS (
  SELECT event_type AS t, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
p AS (
  SELECT a.t ta, b.t tb, a.n x, b.n y
  FROM d a JOIN d b ON a.day = b.day AND a.t < b.t),
g AS (
  SELECT ta, tb, CAST(count(*) AS BIGINT) c,
         CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
         CAST(sum(x * x) AS BIGINT) sxx, CAST(sum(y * y) AS BIGINT) syy,
         CAST(sum(x * y) AS BIGINT) sxy
  FROM p GROUP BY 1, 2)
SELECT ta AS type_a, tb AS type_b, c AS n_days,
       round((CAST(c AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(c AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(c AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
FROM g
WHERE c >= 2
  AND (CAST(c AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
  AND (CAST(c AS DOUBLE) * CAST(syy AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
""",
)
