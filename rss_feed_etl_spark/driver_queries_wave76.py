"""Wave-76 driver queries: exposure Gini concentration and discount
elasticity (integer-sum OLS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import decision_support as ds
from .operators import profiling


def _q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.exposure_gini(td.load_table(spark, sf_dir, "events"))


_register(
    "exposure_gini",
    _q_gini,
    """
WITH c AS (
  SELECT event_type AS t, json_extract_string(props, '$.k') AS item,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
r AS (
  SELECT t, c,
         CAST(row_number() OVER (PARTITION BY t ORDER BY c ASC, item ASC)
              AS BIGINT) AS i
  FROM c),
a AS (
  SELECT t, CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) s,
         CAST(sum(i * c) AS BIGINT) ic
  FROM r GROUP BY 1)
SELECT t AS event_type, n AS n_items, s AS n_events,
       round(2.0 * CAST(ic AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM a
""",
)


def _q_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.discount_elasticity(td.load_table(spark, sf_dir, "lineitem"))


_ND = "CAST(n AS DOUBLE)"
_NUM = f"({_ND} * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
_DENX = f"({_ND} * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
_DENY = f"({_ND} * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
_SLOPE = f"({_NUM} / {_DENX})"

_register(
    "discount_elasticity",
    _q_elasticity,
    f"""
WITH a AS (
  SELECT CAST(count(*) AS BIGINT) n,
         CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) sx,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) sy,
         CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) sxy,
         CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)
                  * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) sxx,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) syy
  FROM lineitem)
SELECT n,
       round({_SLOPE}, 6) AS slope_per_pct,
       round((CAST(sy AS DOUBLE) - {_SLOPE} * CAST(sx AS DOUBLE)) / {_ND}, 6)
         AS intercept,
       round(({_NUM} / {_DENX}) * ({_NUM} / {_DENY}), 6) AS r2
FROM a
""",
)
