"""Driver-contract queries, wave 141: t-closeness and the KMV distinct
sketch audit.

Reference anchor: the reference republishes feed rows verbatim to a
shared sheet (src/rss_feed_etl/sinks/gsheet.py); t-closeness completes
the k-anonymity / l-diversity release ladder (waves 61/62) with the
distributional leak those two miss, and KMV is the mergeable
COUNT DISTINCT the lakehouse side of this registry estimates with HLL —
but expressed exactly, so the ORACLE checks the estimator itself.

The KMV k is 12 — below every test SF's per-type distinct-user count —
so the estimation path (not the small-cardinality exact mode) is what
both engines hash-compare at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import profiling, sketches

_TC_T = 0.04


def _q_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    staged = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hour_of_day"),
        F.least(F.floor(F.col("value") / 10), F.lit(20))
        .cast("bigint")
        .alias("sv"),
    )
    return profiling.t_closeness_report(
        staged, ["event_type", "hour_of_day"], "sv", t=_TC_T
    )


_register(
    "t_closeness_report",
    _q_tcloseness,
    f"""
WITH f AS (SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day,
                  CAST(least(floor(value / 10), 20) AS BIGINT) AS sv,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3),
cls AS (SELECT event_type, hour_of_day, CAST(sum(n) AS BIGINT) AS nc
        FROM f GROUP BY 1, 2),
gd AS (SELECT sv, CAST(sum(n) AS BIGINT) AS g FROM f GROUP BY 1),
dom AS (SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(g) AS BIGINT) AS nt FROM gd),
gcum AS (SELECT sv, CAST(sum(g) OVER (ORDER BY sv
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cg
         FROM gd),
grid AS (SELECT cls.event_type, cls.hour_of_day, cls.nc, gcum.sv, gcum.cg,
                coalesce(f.n, 0) AS n
         FROM cls CROSS JOIN gcum
         LEFT JOIN f ON f.event_type = cls.event_type
                    AND f.hour_of_day = cls.hour_of_day AND f.sv = gcum.sv),
cum AS (SELECT event_type, hour_of_day, nc, cg,
               CAST(sum(n) OVER (PARTITION BY event_type, hour_of_day
                    ORDER BY sv
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cn
        FROM grid),
emd AS (SELECT event_type, hour_of_day, nc,
               round(CAST(sum(CAST(round(abs(
                   CAST(cn AS DOUBLE) / nc - CAST(cg AS DOUBLE) / nt), 9)
                 AS DECIMAL(30,10))) AS DOUBLE)
                 / CAST(max(m) - 1 AS DOUBLE), 6) AS emd
        FROM cum CROSS JOIN dom GROUP BY 1, 2, 3)
SELECT event_type, hour_of_day, nc AS group_size, emd,
       emd > CAST({_TC_T} AS DOUBLE) AS exceeds_t
FROM emd
""",
)


_KMV_K = 12


def _q_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return sketches.kmv_distinct_estimate(
        ev, key_col="user_id", group_col="event_type", k=_KMV_K
    )


_KMV_H = _hexfold("CAST(user_id AS VARCHAR)")

_register(
    "kmv_distinct_estimate",
    _q_kmv,
    f"""
WITH hashed AS (SELECT DISTINCT event_type AS g, {_KMV_H} AS h FROM events),
exact AS (SELECT g, CAST(count(*) AS BIGINT) AS nd FROM hashed GROUP BY 1),
kth AS (SELECT g, h AS hk FROM (
          SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h ASC) AS r
          FROM hashed) WHERE r = {_KMV_K}),
per_group AS (
  SELECT CAST(g AS VARCHAR) AS scope, nd AS exact_distinct,
         CASE WHEN nd < {_KMV_K} THEN CAST(nd AS DOUBLE)
              WHEN hk > 0 THEN round(CAST({_KMV_K - 1} AS DOUBLE)
                         / (CAST(hk AS DOUBLE)
                            / CAST({float(1 << 60)} AS DOUBLE)), 6) END
           AS kmv_estimate
  FROM exact LEFT JOIN kth USING (g)),
uh AS (SELECT DISTINCT h FROM hashed),
und AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM uh),
ukth AS (SELECT max(h) AS hk FROM (SELECT h FROM uh ORDER BY h ASC
                                   LIMIT {_KMV_K})),
union_row AS (
  SELECT '__union__' AS scope, nd AS exact_distinct,
         CASE WHEN nd < {_KMV_K} THEN CAST(nd AS DOUBLE)
              WHEN hk > 0 THEN round(CAST({_KMV_K - 1} AS DOUBLE)
                         / (CAST(hk AS DOUBLE)
                            / CAST({float(1 << 60)} AS DOUBLE)), 6) END
           AS kmv_estimate
  FROM und CROSS JOIN ukth),
allrows AS (SELECT * FROM per_group UNION ALL SELECT * FROM union_row)
SELECT scope, exact_distinct, kmv_estimate,
       round((kmv_estimate - CAST(exact_distinct AS DOUBLE))
             / exact_distinct, 6) AS rel_err
FROM allrows
""",
)
