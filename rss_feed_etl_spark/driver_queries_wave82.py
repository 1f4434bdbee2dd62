"""Wave-82 driver queries: per-user overdispersion audit and mergeable
histogram percentile error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, sketches


def _q_overdisp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.overdispersion_check(td.load_table(spark, sf_dir, "events"))


_M = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
_V = f"(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) - {_M} * {_M})"

_register(
    "overdispersion_check",
    _q_overdisp,
    f"""
WITH per AS (
  SELECT event_type AS t, user_id AS u, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
a AS (
  SELECT t, CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) s,
         CAST(sum(c * c) AS BIGINT) sq
  FROM per GROUP BY 1)
SELECT t AS event_type, n AS n_users,
       round({_M}, 6) AS mean_per_user,
       round({_V} / {_M}, 6) AS dispersion,
       round(CASE WHEN {_V} > {_M}
                  THEN {_M} * {_M} / ({_V} - {_M}) END, 6) AS nb_r_hat
FROM a WHERE s > 0
""",
)

_HP_LO, _HP_HI, _HP_BINS = 0.0, 500.0, 100
_HP_W = (_HP_HI - _HP_LO) / _HP_BINS
_HP_PS = (0.5, 0.9, 0.99)


def _q_hist_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.histogram_percentile_error(
        td.load_table(spark, sf_dir, "events"),
        lo=_HP_LO, hi=_HP_HI, n_bins=_HP_BINS, ps=_HP_PS,
    )


def _est(p: float) -> str:
    return (
        f"min(CASE WHEN cum >= ceil({float(p)!r} * CAST(n AS DOUBLE)) "
        f"THEN {_HP_LO!r} + CAST(bucket - 1 AS DOUBLE) * {_HP_W!r} END)"
    )


_PROWS = " UNION ALL ".join(
    f"SELECT g AS event_type, CAST({float(p)!r} AS DOUBLE) AS p, "
    f"round(e{int(p * 100)}, 6) AS est, round(x{int(p * 100)}, 6) AS exact, "
    f"round(abs(e{int(p * 100)} - x{int(p * 100)}), 6) AS abs_err, "
    f"CAST(CASE WHEN abs(e{int(p * 100)} - x{int(p * 100)}) <= {_HP_W!r} "
    f"THEN 1 ELSE 0 END AS INT) AS within_one_bin FROM j"
    for p in _HP_PS
)

_register(
    "histogram_percentile_error",
    _q_hist_pct,
    f"""
WITH h AS (
  SELECT event_type AS g,
         CASE WHEN value < {_HP_LO!r} THEN 0
              WHEN value >= {_HP_HI!r} THEN {_HP_BINS + 1}
              ELSE CAST(floor((value - {_HP_LO!r}) / {_HP_W!r}) AS BIGINT) + 1
         END AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT g, bucket,
         CAST(sum(c) OVER (PARTITION BY g ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum,
         CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) n
  FROM h),
est AS (
  SELECT g, {", ".join(f"{_est(p)} AS e{int(p * 100)}" for p in _HP_PS)}
  FROM cum GROUP BY 1),
ex AS (
  SELECT event_type AS g2,
         {", ".join(f"quantile_cont(value, {float(p)!r}) AS x{int(p * 100)}" for p in _HP_PS)}
  FROM events GROUP BY 1),
j AS (SELECT est.*, {", ".join(f"x{int(p * 100)}" for p in _HP_PS)}
      FROM est JOIN ex ON est.g = ex.g2)
{_PROWS}
""",
)
