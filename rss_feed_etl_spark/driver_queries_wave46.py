"""Driver-contract queries, wave 46: Wilson-interval conversion rates,
Laplace-smoothed Markov transition matrix, funnel time-to-convert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea, graph

# --- Wilson rate intervals --------------------------------------------------

_WI_Z = 1.96


def _q_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.wilson_rate_intervals(
        td.load_table(spark, sf_dir, "events"), z=_WI_Z
    )


_register(
    "wilson_rate_intervals",
    _q_wilson,
    f"""
WITH g AS (
  SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS segment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_conv
  FROM events GROUP BY 1)
SELECT segment, n, n_conv,
       round(n_conv / CAST(n AS DOUBLE), 6) AS rate,
       round((n_conv / CAST(n AS DOUBLE) + {_WI_Z * _WI_Z} / (2.0 * n))
             / (1.0 + {_WI_Z * _WI_Z} / n)
             - {_WI_Z} * sqrt((n_conv / CAST(n AS DOUBLE))
                              * (1.0 - n_conv / CAST(n AS DOUBLE)) / n
                              + {_WI_Z * _WI_Z} / (4.0 * n * n))
               / (1.0 + {_WI_Z * _WI_Z} / n), 6) AS ci_lo,
       round((n_conv / CAST(n AS DOUBLE) + {_WI_Z * _WI_Z} / (2.0 * n))
             / (1.0 + {_WI_Z * _WI_Z} / n)
             + {_WI_Z} * sqrt((n_conv / CAST(n AS DOUBLE))
                              * (1.0 - n_conv / CAST(n AS DOUBLE)) / n
                              + {_WI_Z * _WI_Z} / (4.0 * n * n))
               / (1.0 + {_WI_Z * _WI_Z} / n), 6) AS ci_hi
FROM g
""",
)


# --- transition probabilities -----------------------------------------------

_TP_ALPHA = 1.0


def _q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.transition_probabilities(
        td.load_table(spark, sf_dir, "events"), alpha=_TP_ALPHA
    )


_register(
    "event_transition_probs",
    _q_transitions,
    f"""
WITH seq AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS src
  FROM events),
edges AS (SELECT src, dst, count(*) AS weight
          FROM seq WHERE src IS NOT NULL GROUP BY 1, 2),
states AS (SELECT DISTINCT event_type AS s FROM events),
k AS (SELECT CAST(count(*) AS INT) AS k FROM states),
dense AS (
  SELECT a.s AS src, b.s AS dst, coalesce(e.weight, 0) AS weight
  FROM states a CROSS JOIN states b
  LEFT JOIN edges e ON e.src = a.s AND e.dst = b.s),
tot AS (SELECT src, sum(weight) AS t FROM dense GROUP BY 1)
SELECT d.src, d.dst, CAST(d.weight AS BIGINT) AS n,
       round((d.weight + {_TP_ALPHA}) / (t.t + {_TP_ALPHA} * k.k), 6) AS p
FROM dense d JOIN tot t ON d.src = t.src CROSS JOIN k
""",
)


# --- funnel latency ---------------------------------------------------------


def _q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.funnel_latency(td.load_table(spark, sf_dir, "events"))


_register(
    "funnel_latency",
    _q_funnel_latency,
    """
WITH v AS (SELECT user_id, min(ts) AS vs
           FROM events WHERE event_type = 'view' GROUP BY 1),
vv AS (SELECT e.user_id, v.vs, min(e.event_id) AS vid
       FROM events e JOIN v ON e.user_id = v.user_id AND e.ts = v.vs
       WHERE e.event_type = 'view' GROUP BY 1, 2),
p AS (SELECT e.user_id, min(e.ts) AS pe
      FROM events e JOIN vv ON e.user_id = vv.user_id
      WHERE e.event_type = 'purchase'
        AND (e.ts > vv.vs OR (e.ts = vv.vs AND e.event_id >= vv.vid))
      GROUP BY 1),
lat AS (SELECT epoch(p.pe) - epoch(vv.vs) AS latency
        FROM vv LEFT JOIN p ON vv.user_id = p.user_id)
SELECT CAST(count(*) AS BIGINT) AS n_exposed,
       CAST(count(latency) AS BIGINT) AS n_converted,
       round(count(latency) / CAST(count(*) AS DOUBLE), 6) AS conversion_rate,
       round(quantile_cont(latency, 0.5), 2) AS latency_p50_s,
       round(quantile_cont(latency, 0.9), 2) AS latency_p90_s
FROM lat
""",
)
