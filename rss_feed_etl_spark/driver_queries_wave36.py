"""Driver-contract queries, wave 36: dedup-pipeline pair recall vs the
structural ground truth (blocking/verification quality), per-group OLS
trend slopes, and two-sample Kolmogorov–Smirnov drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _aug_docs
from .operators import dedup, timeseries

# --- dedup pair recall / reduction ratio ------------------------------------
# Ground truth is structural: every augmented doc (id+1e6) is an 80%-prefix
# near-duplicate of its base doc, so truth pairs are (doc_id, doc_id+1e6).
# Candidates are the pipeline's VERIFIED pair output (the registered
# minhash_lsh_neardup set), so completeness here is end-to-end dedup
# recall: blocking loss + verification loss together.


def _q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _aug_docs(spark, sf_dir)
    cand = dedup.minhash_lsh_pairs(
        aug, id_col="id", text_col="text", n=3, threshold=0.25
    )
    docs = td.load_table(spark, sf_dir, "documents")
    truth = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1_000_000).alias("id_b"),
    )
    return dedup.blocking_quality(cand, truth, records=aug)


_register(
    "dedup_pair_recall",
    _q_blocking_quality,
    f"""
WITH cand AS (SELECT id_a, id_b FROM ({ORACLES["minhash_lsh_neardup"]}) t),
truth AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b FROM documents),
found AS (SELECT count(*) AS n_found
          FROM truth WHERE EXISTS (SELECT 1 FROM cand
                                   WHERE cand.id_a = truth.id_a
                                     AND cand.id_b = truth.id_b)),
nt AS (SELECT count(*) AS n_truth FROM truth),
nc AS (SELECT count(*) AS n_candidates FROM cand),
nr AS (SELECT CAST(2 * count(*) AS BIGINT) AS n_rec FROM documents)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_found AS BIGINT) AS n_found,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       round(n_found / n_truth, 6) AS pairs_completeness,
       round(1.0 - n_candidates / (n_rec * (n_rec - 1) / 2.0), 6)
         AS reduction_ratio
FROM nt, found, nc, nr
""",
)


# --- per-group daily trend slope --------------------------------------------


def _q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    return timeseries.daily_trend_slope(td.load_table(spark, sf_dir, "events"))


_register(
    "daily_trend_slope",
    _q_trend_slope,
    """
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2),
d AS (SELECT g, CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS x, y
      FROM daily),
sums AS (
  SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM d GROUP BY 1)
SELECT g AS event_type, CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
FROM sums
""",
)


# --- KS drift between first/second half of the stream -----------------------

_KS_SPLIT = "2024-01-16 00:00:00"


def _q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return timeseries.ks_drift(
        td.load_table(spark, sf_dir, "events"), split_ts=_KS_SPLIT
    )


_register(
    "ks_value_drift",
    _q_ks_drift,
    f"""
WITH s AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v,
         ts < TIMESTAMP '{_KS_SPLIT}' AS before
  FROM events),
per_v AS (
  SELECT g, v,
         sum(CASE WHEN before THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN NOT before THEN 1 ELSE 0 END) AS c2
  FROM s GROUP BY 1, 2),
tot AS (
  SELECT g,
         sum(CASE WHEN before THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN NOT before THEN 1 ELSE 0 END) AS n2
  FROM s GROUP BY 1),
ecdf AS (
  SELECT g, v, c1, c2,
         sum(c1) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a1,
         sum(c2) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a2
  FROM per_v)
SELECT g AS event_type,
       CAST(max(n1) AS BIGINT) AS n_before,
       CAST(max(n2) AS BIGINT) AS n_after,
       round(max(abs(a1 / n1 - a2 / n2)), 6) AS ks_stat
FROM ecdf JOIN tot USING (g)
GROUP BY 1
""",
)
