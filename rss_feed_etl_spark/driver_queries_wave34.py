"""Driver-contract queries, wave 34: distributed statistics — Poisson-
bootstrap confidence intervals, ε-DP noisy count release, and day-of-week
seasonal anomaly decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import sketches, timeseries
from .functions.hashing import MOD
from .operators.sketches import _POIS1_TP

# --- Poisson-bootstrap CI ---------------------------------------------------

_BOOT_B, _BOOT_SALT = 40, "boot-v1"


def _q_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.bootstrap_ci(
        td.load_table(spark, sf_dir, "events"),
        value_col="value",
        group_col="event_type",
        id_col="event_id",
        n_boot=_BOOT_B,
        salt=_BOOT_SALT,
    )


from .functions.hashing import salt_to_int  # noqa: E402

_BOOT_SI = salt_to_int(_BOOT_SALT)
_BOOT_H0 = (
    f"(((((event_id % {MOD}) + {_BOOT_SI}) * 48271) % {MOD})"
    f" * ((((event_id % {MOD}) + {_BOOT_SI}) * 48271) % {MOD}))"
)
_BOOT_W = " + ".join(
    f"(CASE WHEN (u * u) % {MOD} > {t} THEN 1 ELSE 0 END)" for t in _POIS1_TP
)

_register(
    "bootstrap_mean_ci",
    _q_bootstrap,
    f"""
WITH base AS (
  SELECT event_type AS g, value AS v, {_BOOT_H0} % {MOD} AS h0 FROM events),
reps AS (
  SELECT g, v, h0, b
  FROM base, (SELECT unnest(range({_BOOT_B})) AS b)),
uu AS (SELECT g, b, v, (h0 * (b + 2)) % {MOD} AS u FROM reps),
ww AS (SELECT g, b, v, {_BOOT_W} AS w FROM uu),
means AS (SELECT g, b, round(sum(w * v) / sum(w), 6) AS m FROM ww GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY g ORDER BY m, b) AS rn FROM means),
cis AS (
  SELECT g, max(CASE WHEN rn = 2 THEN m END) AS ci_lo,
         max(CASE WHEN rn = {_BOOT_B - 1} THEN m END) AS ci_hi
  FROM ranked GROUP BY 1),
overall AS (
  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
         round(avg(value), 6) AS mean
  FROM events GROUP BY 1)
SELECT g AS event_type, n, mean, ci_lo, ci_hi
FROM overall JOIN cis USING (g)
""",
)


# --- ε-DP noisy counts ------------------------------------------------------

_DP_EPS, _DP_SALT = 1.0, "dp-v1"


def _q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.dp_noisy_counts(
        td.load_table(spark, sf_dir, "events"),
        group_col="event_type",
        epsilon=_DP_EPS,
        salt=_DP_SALT,
    )


_register(
    "dp_event_counts",
    _q_dp_counts,
    f"""
WITH counts AS (SELECT event_type AS g, count(*) AS n FROM events GROUP BY 1),
u AS (SELECT g, n,
             {_hexfold(f"('{_DP_SALT}:' || g)")} / 1152921504606846976.0 AS u
      FROM counts)
SELECT g AS event_type, CAST(n AS BIGINT) AS exact_n,
       round(n + round(-{1.0 / _DP_EPS} * sign(u - 0.5)
                       * ln(1 - 2 * abs(u - 0.5)), 6), 6) AS noisy_n
FROM u
""",
)


# --- day-of-week seasonal anomalies -----------------------------------------

_DOW_SIGMAS = 2.0


def _q_dow_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = td.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("total")
    )
    out = timeseries.dow_seasonal_residuals(daily, sigmas=_DOW_SIGMAS)
    return out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


_register(
    "dow_anomaly_days",
    _q_dow_anomalies,
    f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, round(sum(o_totalprice), 2) AS total
  FROM orders GROUP BY 1),
d AS (SELECT day, CAST(total AS DOUBLE) AS val, dayofweek(day) AS dow FROM daily),
profile AS (
  -- exact-DECIMAL mean, mirroring the engine: fold order cannot move
  -- the 6-dp rounding (sf0.001's Sunday mean sits ON the boundary)
  SELECT dow,
         round(CAST(sum(CAST(val AS DECIMAL(30,6))) AS DOUBLE) / count(*), 6)
           AS expected
  FROM d GROUP BY 1),
resid AS (
  SELECT day, val, dow, expected, round(val - expected, 6) AS residual
  FROM d JOIN profile USING (dow)),
sd AS (SELECT round(stddev_pop(residual), 6) AS sd FROM resid)
SELECT strftime(day, '%Y-%m-%d') AS day, val AS total, dow, expected, residual,
       CASE WHEN abs(residual) > {_DOW_SIGMAS} * sd THEN 1 ELSE 0 END AS is_anomaly
FROM resid, sd
""",
)
