"""Driver-contract queries, wave 126: the Mann-Whitney rank-sum test
and Aalen-Johansen competing-risks incidence.

Reference anchor: the reference reports raw means per feed
(src/etl/rss_feed_etl.py summary counts); the rank-sum test is the
heavy-tail-safe comparison of two arms, and the CIF is the churn-vs-
convert curve ``km_survival`` (wave 84) gets wrong whenever the two
events compete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, timeseries

# --- Mann-Whitney U over two event-type arms ---------------------------------------

_MW_A = "click"
_MW_B = "purchase"


def _q_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    staged = ev.select(
        F.col("event_type").alias("grp"), F.col("value").alias("v")
    )
    return profiling.mann_whitney_u(staged, group_a=_MW_A, group_b=_MW_B)


_register(
    "mann_whitney_u",
    _q_mw,
    f"""
WITH rows_ AS (SELECT event_type AS g, value AS v FROM events
               WHERE event_type IN ('{_MW_A}', '{_MW_B}')),
vals AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
                CAST(sum(CASE WHEN g = '{_MW_A}' THEN 1 ELSE 0 END)
                     AS BIGINT) AS ta
         FROM rows_ GROUP BY 1),
r AS (SELECT *, coalesce(sum(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM vals),
r2 AS (SELECT *, 2 * before + t + 1 AS mid2 FROM r),
agg AS (SELECT CAST(sum(ta) AS BIGINT) AS n_a,
               CAST(sum(t - ta) AS BIGINT) AS n_b,
               sum(CAST(ta * mid2 AS DECIMAL(38,0))) AS ra2,
               sum(CAST(t * t * t - t AS DECIMAL(38,0))) AS tie3
        FROM r2)
SELECT n_a, n_b,
       round(CAST(ra2 AS DOUBLE) / 2.0 - n_a * (n_a + 1) / 2.0, 6) AS u_a,
       round((CAST(ra2 AS DOUBLE) / 2.0 - n_a * (n_a + 1) / 2.0
              - CAST(n_a AS DOUBLE) * n_b / 2.0)
             / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                    * (CAST(n_a + n_b + 1 AS DOUBLE)
                       - CAST(tie3 AS DOUBLE)
                         / CAST((n_a + n_b) * (n_a + n_b - 1)
                                AS DOUBLE))), 6) AS z
FROM agg
""",
)


# --- competing risks: first purchase vs first error --------------------------------


def _q_cif(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("entry"),
        F.max("ts").alias("last_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("fp"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias("fe"),
    )
    etype = (
        F.when(
            F.col("fp").isNotNull()
            & (F.col("fe").isNull() | (F.col("fp") <= F.col("fe"))),
            F.lit("purchase"),
        )
        .when(F.col("fe").isNotNull(), F.lit("error"))
        .otherwise(F.lit("censored"))
    )
    end = F.coalesce(F.least("fp", "fe"), F.col("last_ts"))
    durations = per_user.select(
        F.datediff(end, F.col("entry")).cast("long").alias("dur"),
        etype.alias("etype"),
    )
    return timeseries.competing_risks_cif(
        durations, event_a="purchase", event_b="error"
    ).withColumnRenamed("d_a", "d_purchase").withColumnRenamed(
        "d_b", "d_error"
    ).withColumnRenamed("cif_a", "cif_purchase").withColumnRenamed(
        "cif_b", "cif_error"
    )


_register(
    "competing_risks_cif",
    _q_cif,
    """
WITH pu AS (
  SELECT user_id, min(ts) AS entry, max(ts) AS last_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
         min(CASE WHEN event_type = 'error' THEN ts END) AS fe
  FROM events GROUP BY 1),
durs AS (
  SELECT CAST(date_diff('day', entry,
              coalesce(least(fp, fe), last_ts)) AS BIGINT) AS dur,
         CASE WHEN fp IS NOT NULL AND (fe IS NULL OR fp <= fe)
              THEN 'purchase'
              WHEN fe IS NOT NULL THEN 'error'
              ELSE 'censored' END AS et
  FROM pu),
grid AS (SELECT dur, CAST(count(*) AS BIGINT) AS m,
                CAST(sum(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
                     AS BIGINT) AS d_a,
                CAST(sum(CASE WHEN et = 'error' THEN 1 ELSE 0 END)
                     AS BIGINT) AS d_b
         FROM durs GROUP BY 1),
tot AS (SELECT sum(m) AS n_total FROM grid),
g1 AS (SELECT grid.*, n_total
              - coalesce(sum(m) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS n_risk
       FROM grid, tot),
g2 AS (SELECT *,
              CAST(round(ln(greatest(CAST(1e-9 AS DOUBLE),
                   CAST(1.0 AS DOUBLE) - CAST(d_a + d_b AS DOUBLE) / n_risk)),
                   9) AS DECIMAL(30,10)) AS lnterm
       FROM g1),
g3 AS (SELECT *,
              exp(CAST(coalesce(sum(lnterm) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  CAST(0 AS DECIMAL(30,10))) AS DOUBLE)) AS surv_prev
       FROM g2),
g4 AS (SELECT *,
              CAST(round(surv_prev * d_a / n_risk, 9) AS DECIMAL(30,10))
                AS cif_a_t,
              CAST(round(surv_prev * d_b / n_risk, 9) AS DECIMAL(30,10))
                AS cif_b_t
       FROM g3)
SELECT dur, CAST(n_risk AS BIGINT) AS n_risk,
       d_a AS d_purchase, d_b AS d_error,
       round(exp(CAST(sum(lnterm) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)),
             6) AS surv,
       round(CAST(sum(cif_a_t) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS cif_purchase,
       round(CAST(sum(cif_b_t) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS cif_error
FROM g4 WHERE d_a > 0 OR d_b > 0
""",
)
