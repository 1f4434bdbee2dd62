"""Wave-72 driver queries: Tukey-fence boxplot profile per event type.
(The stream-static enrichment sibling is pytest-verified — streaming
sinks aren't oracle-expressible.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import profiling

_K = 1.5


def _q_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return profiling.tukey_fences(ev, k=_K)


_register(
    "tukey_fences",
    _q_tukey,
    f"""
WITH q AS (
  SELECT event_type AS g,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1),
fen AS (
  SELECT g, q1, q3,
         q1 - {float(_K)!r} * (q3 - q1) AS lo,
         q3 + {float(_K)!r} * (q3 - q1) AS hi
  FROM q),
j AS (
  SELECT e.event_type, e.value, f.q1, f.q3, f.lo, f.hi
  FROM events e JOIN fen f ON e.event_type = f.g)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(any_value(q1), 6) AS q1,
       round(any_value(q3), 6) AS q3,
       round(any_value(q3) - any_value(q1), 6) AS iqr,
       round(any_value(lo), 6) AS lo_fence,
       round(any_value(hi), 6) AS hi_fence,
       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       round(CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END)
                  + sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS outlier_rate
FROM j GROUP BY 1
""",
)
