"""Driver-contract queries, wave 38: join-key skew profiling, a one-pass
data-quality assertion report, ordered CDC apply, and a hashing-trick
quality scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import merges, profiling, textstats
from .functions.hashing import MOD

# --- key skew report --------------------------------------------------------


def _q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.key_skew_report(
        td.load_table(spark, sf_dir, "lineitem"), key_col="l_suppkey"
    )


_register(
    "key_skew_report",
    _q_key_skew,
    """
WITH c AS (SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
s AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_per_key,
         round(avg(c), 6) AS avg_per_key,
         round(quantile_cont(c, 0.5), 9) AS p50_per_key,
         round(quantile_cont(c, 0.99), 9) AS p99_per_key
  FROM c),
t AS (SELECT CAST(sum(c) AS BIGINT) AS top_rows
      FROM (SELECT c FROM c ORDER BY c DESC, k ASC LIMIT 10))
SELECT n_rows, n_keys, max_per_key, avg_per_key, p50_per_key, p99_per_key,
       round(top_rows / n_rows, 6) AS top10_share
FROM s, t
""",
)


# --- data-quality assertion report -----------------------------------------


def _q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.dq_assertion_report(td.load_table(spark, sf_dir, "lineitem"))


def _dq_sql() -> str:
    sums = ",\n  ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS v{i}"
        for i, (_, pred) in enumerate(profiling.LINEITEM_ASSERTIONS)
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS assertion, n_checked, v{i} AS n_violations,"
        f" round(v{i} / n_checked, 6) AS violation_rate FROM s"
        for i, (name, _) in enumerate(profiling.LINEITEM_ASSERTIONS)
    )
    return (
        f"WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n_checked,\n  {sums}\n"
        f"FROM lineitem)\n{arms}"
    )


_register("dq_assertion_report", _q_dq_report, _dq_sql())


# --- ordered CDC apply ------------------------------------------------------

_CDC_OP = (
    "CASE WHEN event_id % 10 = 0 THEN 'D' "
    "WHEN event_id % 10 < 4 THEN 'I' ELSE 'U' END"
)


def _q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = td.load_table(spark, sf_dir, "events")
    log = events.select(
        "user_id", "ts", "event_id", F.expr(_CDC_OP).alias("op"), "value"
    )
    return merges.cdc_apply_ordered(log, key="user_id")


_register(
    "cdc_apply_ordered",
    _q_cdc_apply,
    f"""
WITH ops AS (
  SELECT user_id, ts, event_id, {_CDC_OP} AS op, value FROM events),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
  FROM ops)
SELECT user_id, op AS last_op, round(value, 6) AS last_value,
       ts AS last_ts, n_ops
FROM r WHERE rn = 1 AND op <> 'D'
""",
)


# --- hashing-trick quality scorer ------------------------------------------

_HQ_BUCKETS = 1024


def _q_hashed_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.hashed_quality_scores(
        td.load_table(spark, sf_dir, "documents"), n_buckets=_HQ_BUCKETS
    )


_register(
    "hashed_quality_scores",
    _q_hashed_quality,
    f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
s AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(w,
              tok -> ({_hexfold('tok')} % {MOD}) % {_HQ_BUCKETS}))
           AS BIGINT) AS bsum
  FROM t)
SELECT doc_id, n_tokens,
       round(bsum / n_tokens / {_HQ_BUCKETS} - 0.5, 6) AS hash_score,
       (bsum / n_tokens / {_HQ_BUCKETS} - 0.5) >= 0.0 AS keep
FROM s
""",
)
