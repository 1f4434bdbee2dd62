"""Driver-contract queries, wave 118: shuffle-partition sizing advisor
and split-conformal interval coverage.

Reference anchor: the reference runs single-node pandas (no shuffle to
size) and ships point forecasts with no uncertainty; both gaps matter
the moment the same pipeline runs distributed — one sizes every
exchange, the other puts a finite-sample-valid band on any forecast
already in the registry (holt_forecast, seasonal_naive_mase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from pyspark.sql import functions as F

from .operators import layout, timeseries

# --- shuffle partition advisor ------------------------------------------------

_SPA_TARGET_MB = 128.0

# (table, projected cols, SQL width expression over those cols)
_SPA_TABLES = [
    (
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice"],
        "40",  # 3 bigint + 2 double
    ),
    ("orders", ["o_orderkey", "o_custkey", "o_totalprice"], "24"),
    (
        "events",
        ["event_id", "user_id", "event_type", "value"],
        "24 + coalesce(length(event_type), 0)",
    ),
]


def _q_spa(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        name: td.load_table(spark, sf_dir, name).select(*cols)
        for name, cols, _ in _SPA_TABLES
    }
    return layout.shuffle_partition_advisor(
        tables, target_partition_mb=_SPA_TARGET_MB
    )


def _spa_branch(name: str, width_sql: str) -> str:
    tgt_bytes = _SPA_TARGET_MB * 1048576.0
    return f"""
  SELECT '{name}' AS "table",
         CAST(count(*) AS BIGINT) AS n_rows,
         round(avg({width_sql}), 2) AS est_row_bytes,
         round(count(*) * round(avg({width_sql}), 2) / 1048576.0, 4)
           AS est_total_mb,
         CAST({_SPA_TARGET_MB} AS DOUBLE) AS target_partition_mb,
         CAST(greatest(1, ceil(count(*) * round(avg({width_sql}), 2)
                               / {tgt_bytes})) AS BIGINT)
           AS recommended_partitions,
         CAST(ceil(count(*) / greatest(1, ceil(count(*)
              * round(avg({width_sql}), 2) / {tgt_bytes}))) AS BIGINT)
           AS est_rows_per_partition
  FROM {name}"""


_register(
    "shuffle_partition_advisor",
    _q_spa,
    " UNION ALL ".join(_spa_branch(n, w) for n, _, w in _SPA_TABLES),
)


# --- split-conformal interval coverage --------------------------------------------

_CF_ALPHA = 0.1


def _q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = td.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    return timeseries.conformal_interval_coverage(daily, alpha=_CF_ALPHA)


_register(
    "conformal_interval_coverage",
    _q_conformal,
    f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, round(sum(o_totalprice), 2) AS total
  FROM orders GROUP BY 1),
d AS (SELECT day, CAST(total AS DOUBLE) AS val, dayofweek(day) AS dow,
             row_number() OVER (ORDER BY day) AS rn,
             count(*) OVER () AS n
      FROM daily),
p AS (SELECT *, CAST(floor(0.6 * n) AS BIGINT) AS n_train,
             CAST(floor(0.2 * n) AS BIGINT) AS n_cal
      FROM d),
train AS (SELECT * FROM p WHERE rn <= n_train),
cal AS (SELECT * FROM p WHERE rn > n_train AND rn <= n_train + n_cal),
test AS (SELECT * FROM p WHERE rn > n_train + n_cal),
prof AS (SELECT dow, round(avg(val), 6) AS pred FROM train GROUP BY 1),
g AS (SELECT round(avg(val), 6) AS gpred FROM train),
calr AS (SELECT c.day, round(abs(c.val - coalesce(prof.pred, g.gpred)), 6) AS r
         FROM cal c LEFT JOIN prof USING (dow) CROSS JOIN g),
krow AS (SELECT least(CAST(ceil((count(*) + 1) * {1.0 - _CF_ALPHA})
                      AS BIGINT), count(*)) AS k,
                CAST(count(*) AS BIGINT) AS n_cal_rows
         FROM calr),
cr AS (SELECT r, row_number() OVER (ORDER BY r ASC, day ASC) AS rk FROM calr),
qh AS (SELECT cr.r AS q_hat, krow.n_cal_rows FROM cr, krow WHERE cr.rk = krow.k),
testr AS (SELECT round(abs(t.val - coalesce(prof.pred, g.gpred)), 6) AS r
          FROM test t LEFT JOIN prof USING (dow) CROSS JOIN g),
ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_train FROM train)
SELECT ntr.n_train, qh.n_cal_rows AS n_cal,
       CAST(count(*) AS BIGINT) AS n_test, qh.q_hat,
       CAST({1.0 - _CF_ALPHA} AS DOUBLE) AS target_coverage,
       round(avg(CASE WHEN testr.r <= qh.q_hat THEN 1.0 ELSE 0.0 END), 6)
         AS coverage
FROM testr, qh, ntr
GROUP BY ntr.n_train, qh.n_cal_rows, qh.q_hat
""",
)
