"""Wave-88 driver queries: digit forensics (the IVM join-view sibling is
pytest-verified — sinks aren't oracle-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import profiling


def _q_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.digit_forensics(td.load_table(spark, sf_dir, "events"))


_E = "(CAST(n AS DOUBLE) / 10.0)"
_CHI = " + ".join(
    f"(CAST(d{d} AS DOUBLE) - {_E}) * (CAST(d{d} AS DOUBLE) - {_E}) / {_E}"
    for d in range(10)
)
_DS = ", ".join(
    f"CAST(sum(CASE WHEN (CAST(round(value * 100, 0) AS BIGINT) % 10 + 10) % 10"
    f" = {d} THEN 1 ELSE 0 END) AS BIGINT) AS d{d}"
    for d in range(10)
)

_register(
    "digit_forensics",
    _q_digits,
    f"""
WITH a AS (
  SELECT event_type AS g, CAST(count(*) AS BIGINT) n, {_DS}
  FROM events GROUP BY 1)
SELECT g AS event_type, n,
       round({_CHI}, 6) AS chi2_last_digit,
       CAST(CASE WHEN ({_CHI}) <= 16.919 THEN 1 ELSE 0 END AS INT)
         AS uniform_ok,
       round(CAST(d9 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_9_ending
FROM a
""",
)
