"""Driver-contract queries, wave 11: hard-negative mining over labeled
embeddings (contrastive-training data prep) and robust MAD outlier
detection over the events stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .operators import similarity, sketches

# --- hard negatives --------------------------------------------------------

_HN_K = 5
_HN_QUERIES = 10


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _HN_QUERIES)
    return similarity.hard_negative_mining(emb, queries, k=_HN_K)


_register(
    "hard_negatives",
    _q_hard_negatives,
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
           FROM embeddings WHERE vec_id < {_HN_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         {_cos_sql("q.qv", "e.embedding")} AS cosine_sim
  FROM embeddings e JOIN q ON e.label <> q.qlabel),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, neighbor_label, cosine_sim, rank
FROM ranked WHERE rank <= {_HN_K}
""",
)


# --- MAD outliers ----------------------------------------------------------

_Z_CUT = 3.5


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return sketches.mad_outliers(ev, z_cut=_Z_CUT)


_register(
    "value_outliers",
    _q_mad_outliers,
    f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1),
mad AS (
  SELECT e.event_type, med,
         quantile_cont(abs(e.value - med), 0.5) AS mad
  FROM events e JOIN med USING (event_type) GROUP BY 1, 2)
SELECT event_id, e.event_type, value,
       round((value - med) / nullif({sketches.MAD_SCALE} * mad, 0), 4) AS robust_z
FROM events e JOIN mad ON e.event_type = mad.event_type
WHERE abs(round((value - med) / nullif({sketches.MAD_SCALE} * mad, 0), 4)) > {_Z_CUT}
""",
)
