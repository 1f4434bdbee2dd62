"""Driver-contract queries, wave 49: difference-in-differences estimation
and sequential-episode support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea

# --- diff-in-diff -----------------------------------------------------------

_DID_SPLIT = "2024-01-16"


def _q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.diff_in_diff(
        td.load_table(spark, sf_dir, "events"), split_date=_DID_SPLIT
    )


def _cell_stats_sql() -> str:
    # decimal-exact sums -> identical doubles in both engines before any
    # division (the mean/variance cross-engine contract)
    return """
c AS (
  SELECT (CASE WHEN user_id % 2 = 1 THEN 'treat' ELSE 'ctrl' END) || '_' ||
         (CASE WHEN CAST(ts AS DATE) >= DATE '{split}' THEN 'post' ELSE 'pre' END)
           AS cell,
         value
  FROM events),
g AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS s2
      FROM c GROUP BY 1),
m AS (SELECT cell, n, s1 / n AS m, s2 / n - (s1 / n) * (s1 / n) AS v FROM g),
p AS (SELECT
  max(CASE WHEN cell = 'treat_post' THEN m END) AS tp_m,
  max(CASE WHEN cell = 'treat_post' THEN v END) AS tp_v,
  max(CASE WHEN cell = 'treat_post' THEN n END) AS tp_n,
  max(CASE WHEN cell = 'treat_pre' THEN m END) AS tr_m,
  max(CASE WHEN cell = 'treat_pre' THEN v END) AS tr_v,
  max(CASE WHEN cell = 'treat_pre' THEN n END) AS tr_n,
  max(CASE WHEN cell = 'ctrl_post' THEN m END) AS cp_m,
  max(CASE WHEN cell = 'ctrl_post' THEN v END) AS cp_v,
  max(CASE WHEN cell = 'ctrl_post' THEN n END) AS cp_n,
  max(CASE WHEN cell = 'ctrl_pre' THEN m END) AS cr_m,
  max(CASE WHEN cell = 'ctrl_pre' THEN v END) AS cr_v,
  max(CASE WHEN cell = 'ctrl_pre' THEN n END) AS cr_n
  FROM m)
""".format(split=_DID_SPLIT)


_register(
    "diff_in_diff",
    _q_did,
    f"""
WITH {_cell_stats_sql()}
SELECT round(tr_m, 6) AS treat_pre, round(tp_m, 6) AS treat_post,
       round(cr_m, 6) AS ctrl_pre, round(cp_m, 6) AS ctrl_post,
       round((tp_m - tr_m) - (cp_m - cr_m), 6) AS did_estimate,
       round(sqrt(tp_v / tp_n + tr_v / tr_n + cp_v / cp_n + cr_v / cr_n), 6)
         AS std_err,
       round((tp_m - tr_m) - (cp_m - cr_m)
             - 1.96 * sqrt(tp_v / tp_n + tr_v / tr_n + cp_v / cp_n + cr_v / cr_n),
             6) AS ci_lo,
       round((tp_m - tr_m) - (cp_m - cr_m)
             + 1.96 * sqrt(tp_v / tp_n + tr_v / tr_n + cp_v / cp_n + cr_v / cr_n),
             6) AS ci_hi
FROM p
""",
)


# --- ordered-pair episodes --------------------------------------------------

_EP_HOURS = 24


def _q_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.ordered_pair_episodes(
        td.load_table(spark, sf_dir, "events"), within_hours=_EP_HOURS
    )


_register(
    "ordered_pair_episodes",
    _q_episodes,
    f"""
WITH w AS (
  SELECT user_id, event_type, ts,
         max(CASE WHEN event_type = 'view' THEN ts END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS la
  FROM events),
u AS (SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND la IS NOT NULL
                       AND epoch(ts) - epoch(la) <= {_EP_HOURS * 3600.0}
                      THEN 1 ELSE 0 END) AS converted,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
             sum(CASE WHEN event_type = 'purchase' AND la IS NOT NULL
                       AND epoch(ts) - epoch(la) <= {_EP_HOURS * 3600.0}
                      THEN 1 ELSE 0 END) AS n_episodes
      FROM w GROUP BY 1)
SELECT CAST(sum(exposed) AS BIGINT) AS n_exposed_users,
       CAST(sum(converted) AS BIGINT) AS n_episode_users,
       CAST(sum(n_episodes) AS BIGINT) AS n_episodes,
       round(sum(converted) / CAST(greatest(sum(exposed), 1) AS DOUBLE), 6)
         AS support
FROM u
""",
)
