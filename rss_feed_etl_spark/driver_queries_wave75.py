"""Wave-75 driver queries: Nelson–Aalen cumulative hazard, quantile
treatment effects, and the chain-join order advisor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import eventanalytics as ea
from .operators import profiling

_NA_CENSOR = 3


def _q_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.nelson_aalen(
        td.load_table(spark, sf_dir, "events"), censor_days=_NA_CENSOR
    )


_register(
    "nelson_aalen_hazard",
    _q_na,
    f"""
WITH pu AS (SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
            FROM events GROUP BY 1),
h AS (SELECT max(CAST(ts AS DATE)) AS m FROM events),
fl AS (SELECT date_diff('day', f, l) AS duration_days,
              CASE WHEN l <= m - {_NA_CENSOR} THEN 1 ELSE 0 END AS e
       FROM pu, h),
g AS (SELECT duration_days, CAST(sum(e) AS BIGINT) AS n_events,
             CAST(sum(1 - e) AS BIGINT) AS n_censored
      FROM fl GROUP BY 1),
a AS (SELECT *, CAST(sum(n_events + n_censored) OVER (
             ORDER BY duration_days DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM g)
SELECT duration_days, n_risk, n_events, n_censored,
       round(sum(CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
             OVER w2, 6) AS cum_hazard,
       round(sqrt(sum(CAST(n_events AS DOUBLE)
                      / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
                  OVER w2), 6) AS hazard_se
FROM a
WINDOW w2 AS (ORDER BY duration_days ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)


def _q_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.quantile_treatment_effect(
        td.load_table(spark, sf_dir, "events")
    )


_QCOLS = []
for _q in ("25", "50", "75"):
    _frac = {"25": "0.25", "50": "0.5", "75": "0.75"}[_q]
    _q0 = f"quantile_cont(CASE WHEN arm = 0 THEN value END, {_frac})"
    _q1 = f"quantile_cont(CASE WHEN arm = 1 THEN value END, {_frac})"
    _QCOLS += [
        f"round({_q0}, 6) AS q{_q}_arm0",
        f"round({_q1}, 6) AS q{_q}_arm1",
        f"round({_q1} - {_q0}, 6) AS qte_{_q}",
    ]

_register(
    "quantile_treatment_effect",
    _q_qte,
    f"""
WITH t AS (
  SELECT ({_code('CAST(user_id AS VARCHAR)')}) % 2 AS arm, value FROM events)
SELECT {", ".join(_QCOLS)}
FROM t
""",
)


def _q_join_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = td.load_table(spark, sf_dir, "lineitem")
    od = td.load_table(spark, sf_dir, "orders")
    cu = td.load_table(spark, sf_dir, "customer")
    return profiling.join_order_advisor(
        li, od, cu,
        ab_keys=("l_orderkey", "o_orderkey"),
        bc_keys=("o_custkey", "c_custkey"),
        names=("lineitem", "orders", "customer"),
    )


_register(
    "join_order_advisor",
    _q_join_order,
    """
WITH ha AS (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1),
hba AS (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1),
hbc AS (SELECT o_custkey AS k, count(*) AS cb FROM orders GROUP BY 1),
hc AS (SELECT c_custkey AS k, count(*) AS cc FROM customer GROUP BY 1),
e1 AS (SELECT '(lineitem JOIN orders) JOIN customer' AS join_order,
              CAST(sum(ca * cb) AS BIGINT) AS nrows
       FROM ha JOIN hba USING (k)),
e2 AS (SELECT '(orders JOIN customer) JOIN lineitem' AS join_order,
              CAST(sum(cb * cc) AS BIGINT) AS nrows
       FROM hbc JOIN hc USING (k)),
u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
SELECT join_order, nrows AS intermediate_rows,
       CAST(CASE WHEN nrows = min(nrows) OVER () THEN 1 ELSE 0 END AS INT)
         AS recommended
FROM u
""",
)
