"""Wave-74 driver queries: daily peak session concurrency (sweep-line)
and U-shaped positional attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea

_W = 1800


def _q_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.peak_concurrency(
        td.load_table(spark, sf_dir, "events"), session_seconds=_W
    )


_register(
    "peak_concurrency",
    _q_peak,
    f"""
WITH pd AS (
  SELECT ts AS s, ts + INTERVAL {_W} SECOND AS e,
         unnest(generate_series(
           date_trunc('day', ts),
           date_trunc('day', ts + INTERVAL {_W} SECOND - INTERVAL 1 MICROSECOND),
           INTERVAL 1 DAY)) AS day
  FROM events),
b AS (
  SELECT day, greatest(s, day) AS t, 1 AS d FROM pd
  UNION ALL
  SELECT day, least(e, day + INTERVAL 1 DAY), -1 FROM pd),
r AS (
  SELECT day, d,
         sum(d) OVER (PARTITION BY day ORDER BY t ASC, d ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM b)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_started,
       CAST(max(live) AS BIGINT) AS peak_concurrent
FROM r GROUP BY 1
""",
)

_PA_SOURCES = ["view", "click"]
_PA_AGE = 7


def _q_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.positional_attribution(
        td.load_table(spark, sf_dir, "events"),
        source_types=_PA_SOURCES,
        max_age_days=_PA_AGE,
    )


_SRC_IN = ", ".join(f"'{s}'" for s in _PA_SOURCES)
_FRAME = (
    "OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
)

_register(
    "positional_attribution",
    _q_positional,
    f"""
WITH tagged AS (
  SELECT user_id AS u, event_type AS typ, ts, event_id AS id, value AS val,
         first_value(CASE WHEN event_type = 'purchase' THEN event_id END
           IGNORE NULLS) {_FRAME} AS cid,
         first_value(CASE WHEN event_type = 'purchase' THEN ts END
           IGNORE NULLS) {_FRAME} AS cts,
         first_value(CASE WHEN event_type = 'purchase' THEN value END
           IGNORE NULLS) {_FRAME} AS cval
  FROM events),
touches AS (
  SELECT * FROM tagged
  WHERE typ IN ({_SRC_IN}) AND cid IS NOT NULL AND cid <> id
    AND epoch(cts) - epoch(ts) <= {float(_PA_AGE * 86400)!r}),
ranked AS (
  SELECT typ, cval, cid,
         row_number() OVER (PARTITION BY u, cid ORDER BY ts ASC, id ASC) rn,
         row_number() OVER (PARTITION BY u, cid ORDER BY ts DESC, id DESC) rd,
         count(*) OVER (PARTITION BY u, cid) k
  FROM touches),
cr AS (
  SELECT typ, cid,
         CAST(round((CASE WHEN k = 1 THEN CAST(1.0 AS DOUBLE)
                          WHEN k = 2 THEN CAST(0.5 AS DOUBLE)
                          WHEN rn = 1 THEN CAST(0.4 AS DOUBLE)
                          WHEN rd = 1 THEN CAST(0.4 AS DOUBLE)
                          ELSE CAST(0.2 AS DOUBLE) / CAST(k - 2 AS DOUBLE)
                     END) * cval * 100.0, 0) AS BIGINT) AS c
  FROM ranked),
bysrc AS (
  SELECT typ AS source, CAST(count(*) AS BIGINT) AS n_touches,
         round(CAST(sum(c) AS DOUBLE) / 100.0, 2) AS credited_value
  FROM cr GROUP BY 1),
direct AS (
  SELECT 'direct' AS source, CAST(count(*) AS BIGINT) AS n_touches,
         round(CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS DOUBLE)
               / 100.0, 2) AS credited_value
  FROM events e
  WHERE e.event_type = 'purchase'
    AND NOT EXISTS (SELECT 1 FROM ranked r WHERE r.cid = e.event_id))
SELECT * FROM bysrc UNION ALL SELECT * FROM direct
""",
)
