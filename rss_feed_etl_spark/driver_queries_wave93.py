"""Driver-contract queries, wave 93: IVF ANN with a TRAINED coarse
quantizer.

``ann_cosine_topk_ivf`` (wave 4) uses a fixed-k deterministic md5-rank
sample as its quantizer; this wave demonstrates the production path the
docstring promises is swappable — k-means centroids from
``clustering.kmeans_centroids`` (the exact 2-iteration Lloyd trajectory the
``kmeans_clusters`` oracle already replays in SQL) feeding the identical
probe plan.  Centroid state stays model-sized (k·dim doubles) regardless
of corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .driver_queries_wave10 import _km_step
from .operators import clustering, similarity

_KM_K = 8
_KM_ITERS = 2
_NPROBE = 2


def _q_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = clustering.kmeans_centroids(emb, k=_KM_K, iters=_KM_ITERS)
    return similarity.cosine_topk_ivf(
        emb, queries, k=5, nprobe=_NPROBE, centroids=list(cents.items())
    )


_register(
    "ann_cosine_topk_ivf_kmeans",
    _q_ivf_kmeans,
    f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
c0 AS (
  SELECT vec_id AS cid, list_transform(vec, x -> round(x, 6)) AS cvec
  FROM emb WHERE vec_id < {_KM_K}),{_km_step(1, "c0")},{_km_step(2, "c1")},
cents AS (SELECT cid AS cent_id, cvec AS cv FROM c2),
corpus_sc AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS ev, c.cent_id,
         {_cos_sql("e.embedding", "c.cv")} AS csim
  FROM embeddings e CROSS JOIN cents c),
corpus_cell AS (
  SELECT neighbor_id, ev, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM corpus_sc) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
q_sc AS (
  SELECT q.query_id, q.qv, c.cent_id, {_cos_sql("q.qv", "c.cv")} AS csim
  FROM q CROSS JOIN cents c),
q_cells AS (
  SELECT query_id, qv, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM q_sc) WHERE rn <= {_NPROBE}),
scored AS (
  SELECT qc.query_id, cc.neighbor_id,
         {_cos_sql("qc.qv", "cc.ev")} AS cosine_sim
  FROM q_cells qc JOIN corpus_cell cc ON qc.cell = cc.cell
  WHERE cc.neighbor_id <> qc.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
)
