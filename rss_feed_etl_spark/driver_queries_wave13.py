"""Driver-contract queries, wave 13: product-analytics operators over the
events stream — ordered funnel, retention cohorts, value histogram, and
per-group decile binning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea

# --- ordered funnel --------------------------------------------------------

_FUNNEL = ["view", "click", "purchase"]

_W_SQL = (
    "(PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.funnel_stages(td.load_table(spark, sf_dir, "events"), _FUNNEL)


def _funnel_sql() -> str:
    levels = []
    prev_src = "events"
    for i, stage in enumerate(_FUNNEL):
        guard = f" AND s{i-1} = 1" if i else ""
        levels.append(
            f"l{i} AS (SELECT *, max(CASE WHEN event_type = '{stage}'{guard} "
            f"THEN 1 ELSE 0 END) OVER {_W_SQL} AS s{i} FROM {prev_src})"
        )
        prev_src = f"l{i}"
    maxes = ", ".join(f"max(s{i}) AS s{i}" for i in range(len(_FUNNEL)))
    sums = ", ".join(
        f"CAST(sum(s{i}) AS BIGINT) AS n{i}" for i in range(len(_FUNNEL))
    )
    unpivot = " UNION ALL ".join(
        f"SELECT {i} AS stage_idx, '{s}' AS stage, n{i} AS n_users FROM c"
        for i, s in enumerate(_FUNNEL)
    )
    return (
        "WITH " + ", ".join(levels)
        + f", per_user AS (SELECT user_id, {maxes} FROM l{len(_FUNNEL)-1} GROUP BY 1)"
        + f", c AS (SELECT {sums} FROM per_user) "
        + unpivot
    )


_register("funnel_stages", _q_funnel, _funnel_sql())


# --- retention cohorts -----------------------------------------------------


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.retention_cohorts(td.load_table(spark, sf_dir, "events"))


_register(
    "retention_cohorts",
    _q_retention,
    """
WITH days AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
firsts AS (SELECT u, min(day) AS cohort_day FROM days GROUP BY 1)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       date_diff('day', cohort_day, day) AS offset_days,
       count(*) AS n_users
FROM days JOIN firsts USING (u)
GROUP BY 1, 2
""",
)


# --- value histogram -------------------------------------------------------

_H_LO, _H_HI, _H_BINS = 0.0, 500.0, 20


def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.value_histogram(
        td.load_table(spark, sf_dir, "events"), lo=_H_LO, hi=_H_HI, n_bins=_H_BINS
    )


_register(
    "value_histogram",
    _q_histogram,
    f"""
SELECT CASE WHEN value < {_H_LO} THEN 0
            WHEN value >= {_H_HI} THEN {_H_BINS + 1}
            ELSE CAST(floor((value - {_H_LO}) / {(_H_HI - _H_LO) / _H_BINS}) AS BIGINT) + 1
       END AS bucket,
       count(*) AS n, round(sum(value), 2) AS total
FROM events GROUP BY 1
""",
)


# --- per-group deciles -----------------------------------------------------


def _q_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.group_deciles(td.load_table(spark, sf_dir, "events"))


_register(
    "value_deciles",
    _q_deciles,
    """
WITH t AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
  FROM events)
SELECT event_type, decile, count(*) AS n,
       round(min(value), 2) AS lo, round(max(value), 2) AS hi
FROM t GROUP BY 1, 2
""",
)
