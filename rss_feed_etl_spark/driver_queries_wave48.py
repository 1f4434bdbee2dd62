"""Driver-contract queries, wave 48: PSI distribution drift and score
calibration (reliability diagram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, textstats, timeseries as ts

# --- PSI drift --------------------------------------------------------------

_PSI_SPLIT = "2024-01-16"
_PSI_LO, _PSI_HI, _PSI_BINS = 0.0, 500.0, 10


def _q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    ref = ev.filter(F.to_date("ts") < F.lit(_PSI_SPLIT))
    cur = ev.filter(F.to_date("ts") >= F.lit(_PSI_SPLIT))
    return ts.psi_drift(
        ref, cur, lo=_PSI_LO, hi=_PSI_HI, n_bins=_PSI_BINS
    )


_PSI_W = (_PSI_HI - _PSI_LO) / _PSI_BINS
_PSI_K = _PSI_BINS + 2
_register(
    "psi_value_drift",
    _q_psi,
    f"""
WITH b AS (
  SELECT CASE WHEN value < {_PSI_LO} THEN 0
              WHEN value >= {_PSI_HI} THEN {_PSI_BINS + 1}
              ELSE CAST(floor((value - {_PSI_LO}) / {_PSI_W}) AS INT) + 1
         END AS bucket,
         CASE WHEN CAST(ts AS DATE) < DATE '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM events),
g AS (SELECT bucket,
             CAST(sum(is_ref) AS BIGINT) AS n_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
      FROM b GROUP BY 1),
t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS Nr,
             CAST(sum(n_cur) AS DOUBLE) AS Nc FROM g)
SELECT bucket, n_ref, n_cur,
       round((n_ref + 0.5) / (Nr + 0.5 * {_PSI_K}), 6) AS p_ref,
       round((n_cur + 0.5) / (Nc + 0.5 * {_PSI_K}), 6) AS p_cur,
       round(((n_cur + 0.5) / (Nc + 0.5 * {_PSI_K})
              - (n_ref + 0.5) / (Nr + 0.5 * {_PSI_K}))
             * ln(((n_cur + 0.5) / (Nc + 0.5 * {_PSI_K}))
                  / ((n_ref + 0.5) / (Nr + 0.5 * {_PSI_K}))), 6) AS psi_contrib
FROM g, t
""",
)


# --- score calibration ------------------------------------------------------

_CAL_BINS = 10


def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    scored = textstats.hashed_quality_scores(docs).select(
        "doc_id", F.col("hash_score").alias("score")
    ).withColumn("label", (F.col("doc_id") % 3 == 0).cast("int"))
    return profiling.score_calibration(scored, n_bins=_CAL_BINS)


_CAL_W = 1.0 / _CAL_BINS
_register(
    "score_calibration",
    _q_calibration,
    f"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
              FROM documents),
sc AS (
  SELECT doc_id,
         round(CAST(list_sum(list_transform(w,
             tok -> (list_reduce(list_transform(string_split(substr(md5(tok),1,15), ''),
                      c -> position(c IN '0123456789abcdef')-1), (a,b) -> a*16+b)
                     % 1000000007) % 1024)) AS BIGINT)
           / CAST(len(w) AS BIGINT) / 1024 - 0.5, 6) AS score,
         CAST(doc_id % 3 = 0 AS INT) AS label
  FROM toks),
b AS (
  SELECT CASE WHEN score < -0.5 THEN 0
              WHEN score >= 0.5 THEN {_CAL_BINS + 1}
              ELSE CAST(floor((score + 0.5) / {_CAL_W}) AS INT) + 1
         END AS bucket, score, label
  FROM sc),
g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             avg(score) AS ms, avg(CAST(label AS DOUBLE)) AS rate
      FROM b GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total_n FROM g)
SELECT bucket, n, round(ms, 6) AS mean_score,
       round(rate, 6) AS positive_rate,
       round((n / total_n) * abs(ms - rate), 6) AS ece_contrib
FROM g, t
""",
)
