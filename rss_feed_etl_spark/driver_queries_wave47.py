"""Driver-contract queries, wave 47: cross-source quantile normalization,
seasonal-naive MASE backtest, Theil-Sen robust trend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import textstats, timeseries as ts

# --- quantile normalization -------------------------------------------------

_QN_BINS = 20


def _q_qnorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quantile_normalize(
        td.load_table(spark, sf_dir, "documents"), n_bins=_QN_BINS
    )


_QN_QS = ", ".join(str(i / _QN_BINS) for i in range(_QN_BINS + 1))
_register(
    "quantile_normalize",
    _q_qnorm,
    f"""
WITH b AS (SELECT quantile_cont(n_chars, [{_QN_QS}]) AS bounds FROM documents),
r AS (SELECT doc_id, source, n_chars,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS pr
      FROM documents)
SELECT doc_id, source, n_chars, round(pr, 6) AS pct_rank,
       round(bounds[least(CAST(floor(pr * {_QN_BINS}) AS INT), {_QN_BINS}) + 1],
             4) AS normalized
FROM r, b
""",
)


# --- seasonal-naive MASE ----------------------------------------------------

_MASE_SEASON = 7


def _q_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.seasonal_naive_mase(
        td.load_table(spark, sf_dir, "events"), season_days=_MASE_SEASON
    )


_register(
    "seasonal_naive_mase",
    _q_mase,
    f"""
WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                  round(sum(value), 2) AS y
           FROM events GROUP BY 1, 2),
l AS (SELECT *,
             lag(y, {_MASE_SEASON}) OVER (PARTITION BY event_type ORDER BY day) AS s,
             lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS n
      FROM d)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(avg(abs(y - s)), 6) AS mae_seasonal,
       round(avg(abs(y - n)), 6) AS mae_naive,
       round(avg(abs(y - s)) / avg(abs(y - n)), 6) AS mase
FROM l WHERE s IS NOT NULL AND n IS NOT NULL
GROUP BY 1
""",
)


# --- Theil-Sen trend --------------------------------------------------------


def _q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.theil_sen_trend(td.load_table(spark, sf_dir, "events"))


_register(
    "theil_sen_trend",
    _q_theil_sen,
    """
WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS DOUBLE) AS y
           FROM events GROUP BY 1, 2),
p AS (SELECT a.event_type,
             (b.y - a.y) / date_diff('day', a.day, b.day) AS s
      FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1),
m AS (SELECT event_type, round(quantile_cont(s, 0.5), 6) AS slope_per_day
      FROM p GROUP BY 1)
SELECT n.event_type, n.n_days, m.slope_per_day
FROM n JOIN m USING (event_type)
""",
)
