"""Driver-contract queries, wave 116: the IVF nprobe recall curve and
classical additive time-series decomposition.

Reference anchor: the reference has no vector index and no seasonality
tooling; the recall curve is the tuning read every IVF consumer in the
registry (waves 4/93/108) needs before picking a speed/recall point, and
the decomposition upgrades ``dow_seasonal_residuals`` with a trend term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql, _hexfold
from .operators import similarity, timeseries

# --- IVF nprobe recall curve ------------------------------------------------------

_RC_NPROBES = (1, 2, 4)
_RC_K = 5
_RC_NQ = 10
_RC_NCENT = 40
_RC_SALT = "ivf-v1"


def _q_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_nprobe_recall_curve(
        emb, nprobes=_RC_NPROBES, k=_RC_K, n_queries=_RC_NQ,
        n_centroids=_RC_NCENT, salt=_RC_SALT,
    )


_RC_HK = _hexfold(f"('{_RC_SALT}:' || CAST(vec_id AS VARCHAR))")


def _rc_branch(p: int) -> str:
    return f"""
  SELECT {p} AS nprobe, nq.nq AS n_queries,
         round(CAST(h.h AS DOUBLE) / ({_RC_K} * nq.nq), 6) AS mean_recall
  FROM (SELECT CAST(count(*) AS BIGINT) AS h
        FROM (SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY cs DESC, neighbor_id ASC) AS rank
                FROM (SELECT qc.query_id, cc.neighbor_id,
                             {_cos_sql("qc.qv", "cc.ev")} AS cs
                      FROM q_cells qc
                      JOIN corpus_cell cc ON qc.cell = cc.cell
                      WHERE qc.rn <= {p}
                        AND cc.neighbor_id <> qc.query_id))
              WHERE rank <= {_RC_K}) a
        JOIN exact USING (query_id, neighbor_id)) h, nq"""


_register(
    "ivf_nprobe_recall_curve",
    _q_recall_curve,
    f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM (
    SELECT vec_id, embedding, {_RC_HK} AS hk FROM embeddings
    ORDER BY hk, vec_id LIMIT {_RC_NCENT})),
corpus_sc AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS ev, c.cent_id,
         {_cos_sql("e.embedding", "c.cv")} AS csim
  FROM embeddings e CROSS JOIN cents c),
corpus_cell AS (
  SELECT neighbor_id, ev, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM corpus_sc) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < {_RC_NQ}),
exact_sc AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql("q.qv", "e.embedding")} AS cs
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cs DESC, neighbor_id ASC) AS rk
    FROM exact_sc) WHERE rk <= {_RC_K}),
nq AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS nq FROM exact),
q_sc AS (
  SELECT q.query_id, q.qv, c.cent_id, {_cos_sql("q.qv", "c.cv")} AS csim
  FROM q CROSS JOIN cents c),
q_cells AS (
  SELECT query_id, qv, cent_id AS cell, rn FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM q_sc) WHERE rn <= {max(_RC_NPROBES)})
{" UNION ALL ".join(_rc_branch(p) for p in _RC_NPROBES)}
""",
)


# --- classical additive decomposition of daily order revenue ---------------------


def _q_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = td.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    return timeseries.classical_decompose_daily(daily)


_register(
    "classical_decompose_daily",
    _q_decompose,
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, round(sum(o_totalprice), 2) AS total
  FROM orders GROUP BY 1),
d AS (SELECT day, CAST(total AS DOUBLE) AS val, dayofweek(day) AS dow
      FROM daily),
t AS (SELECT day, val, dow,
             round(avg(val) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6) AS trend
      FROM d),
dt AS (SELECT *, round(val - trend, 6) AS detr FROM t),
prof AS (SELECT dow, round(avg(detr), 6) AS seasonal FROM dt GROUP BY 1)
SELECT strftime(dt.day, '%Y-%m-%d') AS day, val AS value, trend,
       prof.seasonal AS seasonal,
       round(val - trend - prof.seasonal, 6) AS residual
FROM dt JOIN prof USING (dow)
""",
)
