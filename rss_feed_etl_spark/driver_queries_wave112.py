"""Driver-contract queries, wave 112: lakehouse scan-layout economics —
zone-map skip measurement and an actionable skew-salting plan.

Reference anchor: the reference appends batches in feed order and scans
whole snapshots (src/etl/rss_feed_etl.py); at datalake scale the same
append layout decides what min-max pruning can skip, and the join keys
it shuffles on decide the slowest task.  These queries price both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import layout

# --- zone-map skipping on the simulated append layout ---------------------------

_ZM_SPAN = 1024
_ZM_WINDOWS = (7, 30, 90)


def _q_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = td.load_table(spark, sf_dir, "lineitem")
    return layout.zonemap_skip_stats(
        li, key_col="l_orderkey", ts_col="l_shipdate",
        file_span=_ZM_SPAN, window_days=_ZM_WINDOWS,
    )


def _zm_branch(d: int) -> str:
    return f"""
  SELECT {d} AS window_days, nr,
         CASE WHEN fmax >= tmax_all - INTERVAL {d} DAY THEN 1 ELSE 0 END AS rd,
         m{d} AS mt
  FROM f"""


_register(
    "zonemap_skip_stats",
    _q_zonemap,
    f"""
WITH hi AS (SELECT max(l_shipdate) AS tmax_all FROM lineitem),
f AS (
  SELECT CAST(floor(l_orderkey / {_ZM_SPAN}) AS BIGINT) AS file_id,
         count(*) AS nr,
         max(l_shipdate) AS fmax,
         max(tmax_all) AS tmax_all,
         {", ".join(
             f"sum(CASE WHEN l_shipdate >= tmax_all - INTERVAL {d} DAY "
             f"THEN 1 ELSE 0 END) AS m{d}"
             for d in _ZM_WINDOWS)}
  FROM lineitem, hi GROUP BY 1),
s AS ({" UNION ALL ".join(_zm_branch(d) for d in _ZM_WINDOWS)}),
a AS (
  SELECT window_days,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(rd) AS BIGINT) AS files_read,
         CAST(sum(rd * nr) AS BIGINT) AS rows_read,
         CAST(sum(mt) AS BIGINT) AS rows_matching
  FROM s GROUP BY 1)
SELECT window_days, n_files, files_read, rows_read, rows_matching,
       round(CAST(n_files - files_read AS DOUBLE) / n_files, 6)
         AS file_skip_ratio,
       CASE WHEN rows_matching > 0
            THEN round(CAST(rows_read AS DOUBLE) / rows_matching, 6)
            END AS read_amplification
FROM a
""",
)


# --- skew salting plan over the supplier join key --------------------------------

_SALT_TARGET = 200
_SALT_TOPN = 20


def _q_salting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = td.load_table(spark, sf_dir, "lineitem")
    return layout.skew_salting_plan(
        li, key_col="l_suppkey",
        target_rows_per_task=_SALT_TARGET, top_n=_SALT_TOPN,
    )


_register(
    "skew_salting_plan",
    _q_salting,
    f"""
WITH tot AS (SELECT count(*) AS n_total FROM lineitem),
c AS (SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS rows
      FROM lineitem GROUP BY 1),
h AS (SELECT key, rows,
             round(CAST(rows AS DOUBLE) / n_total, 6) AS share,
             CAST(ceil(CAST(rows AS DOUBLE) / {_SALT_TARGET}) AS BIGINT)
               AS salt_factor
      FROM c, tot WHERE rows > {_SALT_TARGET})
SELECT key, rows, share, salt_factor,
       CAST(ceil(CAST(rows AS DOUBLE) / salt_factor) AS BIGINT)
         AS salted_task_rows
FROM h ORDER BY rows DESC, key ASC LIMIT {_SALT_TOPN}
""",
)
