"""Driver-contract queries, wave 43: golden-record survivorship merge,
incremental aggregate-table maintenance, and join cardinality estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import merges, profiling, sketches

# --- golden record ----------------------------------------------------------

_GR_COMPONENTS = 200


def _q_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    members = docs.select(
        (F.col("doc_id") % _GR_COMPONENTS).alias("component_id"),
        F.col("doc_id").alias("id"),
        (F.substring("source", 4, 10).cast("int") % 5).alias("priority"),
        F.when(F.col("n_chars") % 3 == 0, None).otherwise(F.col("lang")).alias("lang"),
        F.when(F.col("n_chars") % 5 == 0, None).otherwise(F.col("text")).alias("text"),
    )
    return merges.golden_record(members)


_register(
    "golden_record",
    _q_golden,
    f"""
WITH m AS (
  SELECT doc_id % {_GR_COMPONENTS} AS component_id,
         doc_id AS id,
         CAST(substr(source, 4) AS INT) % 5 AS priority,
         CASE WHEN n_chars % 3 = 0 THEN NULL ELSE lang END AS lang,
         CASE WHEN n_chars % 5 = 0 THEN NULL ELSE text END AS text
  FROM documents)
SELECT component_id,
       arg_min(lang, CAST(lang IS NULL AS BIGINT) * 1000000000000000
                     + CAST(priority AS BIGINT) * 10000000000000 + id) AS lang,
       arg_min(text, CAST(text IS NULL AS BIGINT) * 1000000000000000
                     + CAST(priority AS BIGINT) * 10000000000000 + id) AS text,
       CAST(count(*) AS BIGINT) AS n_members
FROM m GROUP BY 1
""",
)


# --- incremental aggregate maintenance --------------------------------------

_AGG_SPLIT = "2024-01-20"


def _q_combine_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    old = ev.filter(F.to_date("ts") < F.lit(_AGG_SPLIT))
    batch = ev.filter(F.to_date("ts") >= F.lit(_AGG_SPLIT))
    old_agg = old.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        # decimal total: exact, so stored+batch addition in
        # combine_aggregates is order-independent (mirrors the oracle's
        # CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE))
        F.sum(F.col("value").cast("decimal(30,10)")).alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    # total_exact is persistence state (the fold input for the NEXT epoch),
    # not part of the maintained view the oracle recomputes
    return sketches.combine_aggregates(
        old_agg, batch, key_col="event_type", value_col="value"
    ).drop("total_exact")


_register(
    "incremental_agg_maintenance",
    _q_combine_agg,
    f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2) AS total,
       min(value) AS vmin,
       max(value) AS vmax,
       round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6) AS mean
FROM events GROUP BY 1
""",
)


# --- join cardinality estimate ----------------------------------------------

_JC_TOP = 5


def _q_join_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return profiling.join_cardinality_estimate(
        ev, ev, left_key="user_id", right_key="user_id", top=_JC_TOP
    )


_register(
    "join_cardinality_estimate",
    _q_join_card,
    f"""
WITH a AS (SELECT user_id AS k, count(*) AS ca FROM events GROUP BY 1),
m AS (SELECT k, CAST(ca * ca AS BIGINT) AS rows_out FROM a),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_matching_keys,
             CAST(sum(rows_out) AS BIGINT) AS est_rows,
             CAST(max(rows_out) AS BIGINT) AS max_key_rows
      FROM m),
tt AS (SELECT CAST(sum(rows_out) AS BIGINT) AS top_rows
       FROM (SELECT rows_out FROM m
             ORDER BY rows_out DESC, k ASC LIMIT {_JC_TOP}))
SELECT n_matching_keys, est_rows, max_key_rows,
       round(top_rows / CAST(est_rows AS DOUBLE), 6) AS top_share
FROM t, tt
""",
)
