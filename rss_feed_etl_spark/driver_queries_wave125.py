"""Driver-contract queries, wave 125: observational causal inference —
IPW treatment effects and sharp regression discontinuity.

Reference anchor: the reference records outcomes with no experimental
design at all (src/etl/rss_feed_etl.py appends whatever arrives); these
are the two standard estimators for causal reads on exactly that kind
of observational data, planted so the confounded naive answer and the
recovered causal answer visibly differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics

# --- IPW treatment effect ----------------------------------------------------------
# Plant: treatment rate rises with the value stratum (selection bias) and
# the outcome rises with value — naive diff is inflated; IPW recovers the
# true +25.  Stratum 9's rate is deliberately 1.0 to exercise the
# positivity exclusion.

_IPW_EFFECT = 25.0


def _q_ipw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    stratum = F.least(F.floor(F.col("value") / 10).cast("int"), F.lit(9))
    treated = (F.col("event_id") % 10) < (stratum + 1)
    staged = ev.select(
        stratum.alias("stratum"),
        treated.cast("int").alias("treated"),
        (F.col("value") + F.lit(_IPW_EFFECT) * treated.cast("double"))
        .alias("outcome"),
    )
    return eventanalytics.ipw_treatment_effect(staged)


_register(
    "ipw_treatment_effect",
    _q_ipw,
    f"""
WITH staged AS (
  SELECT least(CAST(floor(value / 10) AS INT), 9) AS s,
         CASE WHEN (event_id % 10)
                   < least(CAST(floor(value / 10) AS INT), 9) + 1
              THEN 1 ELSE 0 END AS t,
         value + {_IPW_EFFECT}
               * (CASE WHEN (event_id % 10)
                            < least(CAST(floor(value / 10) AS INT), 9) + 1
                       THEN 1.0 ELSE 0.0 END) AS y
  FROM events),
prop AS (SELECT s, count(*) AS nb, sum(t) AS tb,
                CAST(sum(t) AS DOUBLE) / count(*) AS p
         FROM staged GROUP BY 1),
n_excl AS (SELECT CAST(count(*) AS BIGINT) AS n_excluded_strata
           FROM prop WHERE p <= 0 OR p >= 1),
j AS (SELECT staged.*, prop.p FROM staged JOIN prop USING (s)
      WHERE prop.p > 0 AND prop.p < 1),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_units,
         CAST(sum(t) AS BIGINT) AS n_treated,
         CAST(sum(1 - t) AS BIGINT) AS nc,
         CAST(sum(CAST(round(CASE WHEN t = 1 THEN y / p ELSE 0.0 END, 4)
                       AS DECIMAL(30,10))) AS DOUBLE) AS twy,
         CAST(sum(CAST(round(CASE WHEN t = 1 THEN 1.0 / p ELSE 0.0 END, 4)
                       AS DECIMAL(30,10))) AS DOUBLE) AS tw,
         CAST(sum(CAST(round(CASE WHEN t = 0 THEN y / (1 - p)
                             ELSE 0.0 END, 4)
                       AS DECIMAL(30,10))) AS DOUBLE) AS cwy,
         CAST(sum(CAST(round(CASE WHEN t = 0 THEN 1.0 / (1 - p)
                             ELSE 0.0 END, 4)
                       AS DECIMAL(30,10))) AS DOUBLE) AS cw,
         CAST(sum(CAST(round(CASE WHEN t = 1 THEN y ELSE 0.0 END, 4)
                       AS DECIMAL(30,10))) AS DOUBLE) AS ty,
         CAST(sum(CAST(round(CASE WHEN t = 0 THEN y ELSE 0.0 END, 4)
                       AS DECIMAL(30,10))) AS DOUBLE) AS cy
  FROM j)
SELECT n_units, n_treated, n_excluded_strata,
       round(ty / n_treated - cy / nc, 6) AS naive_diff,
       round(twy / tw - cwy / cw, 6) AS ipw_ate
FROM agg, n_excl
""",
)


# --- sharp regression discontinuity -------------------------------------------------

_RD_CUT = 40.0
_RD_BW = 30.0
_RD_JUMP = 30.0


def _q_rd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    staged = ev.select(
        F.col("value").alias("running"),
        (
            2.0 * F.col("value")
            + F.lit(_RD_JUMP)
            * (F.col("value") >= _RD_CUT).cast("double")
            + ((F.col("event_id") % 7) - 3).cast("double")
        ).alias("outcome"),
    )
    return eventanalytics.regression_discontinuity(
        staged, cutoff=_RD_CUT, bandwidth=_RD_BW
    )


_register(
    "regression_discontinuity",
    _q_rd,
    f"""
WITH rows_ AS (
  SELECT value - {_RD_CUT} AS x,
         2.0 * value
         + {_RD_JUMP} * (CASE WHEN value >= {_RD_CUT} THEN 1.0 ELSE 0.0 END)
         + CAST((event_id % 7) - 3 AS DOUBLE) AS y
  FROM events
  WHERE value - {_RD_CUT} >= -{_RD_BW} AND value - {_RD_CUT} < {_RD_BW}),
side AS (
  SELECT x >= 0 AS r, count(*) AS n,
         CAST(sum(CAST(round(x, 4) AS DECIMAL(38,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(round(y, 4) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(x * y, 4) AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(round(x * x, 4) AS DECIMAL(38,10))) AS DOUBLE) AS sxx
  FROM rows_ GROUP BY 1),
pred AS (
  SELECT r, n,
         round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
           AS pred
  FROM side)
SELECT CAST(l.n AS BIGINT) AS n_left, CAST(r2.n AS BIGINT) AS n_right,
       l.pred AS left_pred, r2.pred AS right_pred,
       round(r2.pred - l.pred, 6) AS rd_estimate
FROM pred l, pred r2 WHERE NOT l.r AND r2.r
""",
)
