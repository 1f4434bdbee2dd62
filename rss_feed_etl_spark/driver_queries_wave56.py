"""Driver-contract queries, wave 56: point-in-time SCD2 enrichment —
facts joined to the dimension version effective at event time, with the
version history itself reconstructed from the CDC stream (composing
``cdc_to_scd2`` with ``scd2_interval_enrich``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_wave38 import _CDC_OP
from .operators import joins, merges

# --- point-in-time enrichment -----------------------------------------------


def _q_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = td.load_table(spark, sf_dir, "events")
    # version history from the I/U/D change stream (CDC rows = every 3rd
    # event), enriched onto the remaining fact rows at their event time
    log = events.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "ts", "event_id", F.expr(_CDC_OP).alias("op"),
        F.round("value", 2).alias("value"),
    )
    versions = merges.cdc_to_scd2(log, key="user_id")
    facts = events.filter(F.col("event_id") % 3 != 0).select(
        "event_id", "user_id", "ts", "event_type"
    )
    out = joins.scd2_interval_enrich(
        facts, versions, key="user_id", value_cols=["value"]
    )
    return out.select(
        "event_id", "user_id", "event_type",
        F.col("dim_value").alias("effective_value"),
    )


_register(
    "scd2_pointwise_enrich",
    _q_scd2_enrich,
    f"""
WITH ops AS (
  SELECT user_id, ts, event_id, {_CDC_OP} AS op, round(value, 2) AS value
  FROM events WHERE event_id % 3 = 0),
v AS (
  SELECT user_id, value, ts AS s,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS e,
         op
  FROM ops),
versions AS (SELECT user_id, value, s, e FROM v WHERE op IN ('I', 'U')),
facts AS (SELECT event_id, user_id, ts, event_type
          FROM events WHERE event_id % 3 <> 0)
SELECT f.event_id, f.user_id, f.event_type,
       ver.value AS effective_value
FROM facts f
LEFT JOIN versions ver
  ON f.user_id = ver.user_id
 AND f.ts >= ver.s AND (ver.e IS NULL OR f.ts < ver.e)
""",
)
