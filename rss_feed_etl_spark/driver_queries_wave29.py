"""Driver-contract queries, wave 29: monitoring statistics — ingest-volume
anomaly days, source×lang chi-square drift cells, and distributed-moment
combination proven lossless against a direct oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import sketches, timeseries

# --- daily volume anomalies ------------------------------------------------

_ANOM_T, _ANOM_W = 0.05, 7


def _q_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return timeseries.daily_count_anomalies(
        td.load_table(spark, sf_dir, "events"),
        threshold=_ANOM_T,
        window_days=_ANOM_W,
    )


_register(
    "daily_count_anomalies",
    _q_anomalies,
    f"""
WITH d AS (SELECT date_trunc('day', ts) AS day, count(*) AS n
           FROM events GROUP BY 1),
s AS (SELECT day, n,
             round(avg(n) OVER (ORDER BY day
                   ROWS BETWEEN {_ANOM_W - 1} PRECEDING AND CURRENT ROW), 6) AS ma
      FROM d),
p AS (SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n, ma,
             round((n - ma) / ma, 6) AS pct_dev
      FROM s)
SELECT * FROM p WHERE abs(pct_dev) > {_ANOM_T}
""",
)


# --- source × lang chi-square ----------------------------------------------


def _q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.contingency_chi2(td.load_table(spark, sf_dir, "documents"))


_register(
    "source_lang_chi2",
    _q_chi2,
    """
WITH obs AS (SELECT source AS r, lang AS c, count(*) AS o
             FROM documents GROUP BY 1, 2),
rt AS (SELECT r, sum(o) AS rt FROM obs GROUP BY 1),
ct AS (SELECT c, sum(o) AS ct FROM obs GROUP BY 1),
n AS (SELECT sum(o) AS n FROM obs),
grid AS (SELECT r, c FROM (SELECT DISTINCT r FROM obs), (SELECT DISTINCT c FROM obs)),
cells AS (
  SELECT grid.r AS source, grid.c AS lang,
         CAST(coalesce(o, 0) AS BIGINT) AS observed,
         round(rt.rt * ct.ct / n.n, 6) AS expected
  FROM grid
  LEFT JOIN obs ON grid.r = obs.r AND grid.c = obs.c
  JOIN rt ON grid.r = rt.r
  JOIN ct ON grid.c = ct.c, n)
SELECT source, lang, observed, expected,
       round(pow(observed - expected, 2) / expected, 6) AS chi2_contrib
FROM cells
""",
)


# --- distributed moments, combine proven against direct computation --------


def _q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.mergeable_moments(
        td.load_table(spark, sf_dir, "documents"), value_col="n_chars"
    )


_register(
    "merged_corpus_stats",
    _q_moments,
    """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(avg(n_chars), 6) AS mean,
       round(sqrt(var_pop(n_chars)), 6) AS stddev_pop
FROM documents
""",
)
