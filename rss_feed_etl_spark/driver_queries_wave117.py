"""Driver-contract queries, wave 117: embedding-space quality evals —
alignment/uniformity and leave-one-out k-NN label accuracy.

Reference anchor: the reference scores resume/job matches with TF-IDF
cosine (src/utils/ats_matcher.py); these are the evals a pipeline runs
BEFORE trusting any embedding column those similarity operators consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql, _hexfold
from .operators import linalg, similarity

# --- alignment & uniformity -------------------------------------------------------

_AU_SALT = "au-v1"
_AU_T = 2.0


def _q_align_unif(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return linalg.alignment_uniformity(emb, t=_AU_T, salt=_AU_SALT)


_AU_HK = _hexfold(f"('{_AU_SALT}:' || CAST(vec_id AS VARCHAR))")
_AU_D2 = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> (l.va[i] - r.vb[i]) * (l.va[i] - r.vb[i])), (x, y) -> x + y)"
)

_register(
    "alignment_uniformity",
    _q_align_unif,
    f"""
WITH emb AS (
  SELECT vec_id AS id, label AS lab,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS raw,
         {_AU_HK} AS hk
  FROM embeddings),
nrm AS (
  SELECT id, lab, hk,
         list_transform(raw, x -> x / sqrt(list_reduce(
             list_transform(raw, y -> y * y), (a, b) -> a + b))) AS vec
  FROM emb),
ra AS (SELECT lab, vec,
              row_number() OVER (PARTITION BY lab ORDER BY hk, id) AS rn
       FROM nrm),
la AS (SELECT lab, CAST((rn - 1) / 2 AS BIGINT) AS p, vec AS va
       FROM ra WHERE rn % 2 = 1),
rb AS (SELECT lab, CAST((rn - 2) / 2 AS BIGINT) AS p, vec AS vb
       FROM ra WHERE rn % 2 = 0),
ad AS (SELECT round({_AU_D2}, 9) AS d2
       FROM la l JOIN rb r ON l.lab = r.lab AND l.p = r.p),
align AS (
  SELECT CAST(count(*) AS BIGINT) AS n_align_pairs,
         round(CAST(sum(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6)
           AS alignment
  FROM ad),
ru AS (SELECT vec, row_number() OVER (ORDER BY hk, id) AS rn FROM nrm),
ua AS (SELECT CAST((rn - 1) / 2 AS BIGINT) AS p, vec AS va
       FROM ru WHERE rn % 2 = 1),
ub AS (SELECT CAST((rn - 2) / 2 AS BIGINT) AS p, vec AS vb
       FROM ru WHERE rn % 2 = 0),
ud AS (SELECT round(exp(-{_AU_T} * round({_AU_D2}, 9)), 9) AS e
       FROM ua l JOIN ub r ON l.p = r.p),
unif AS (
  SELECT CAST(count(*) AS BIGINT) AS n_unif_pairs,
         round(ln(CAST(sum(CAST(e AS DECIMAL(30,10))) AS DOUBLE) / count(*)), 6)
           AS uniformity
  FROM ud)
SELECT n_align_pairs, alignment, n_unif_pairs, uniformity FROM align, unif
""",
)


# --- leave-one-out kNN label accuracy ----------------------------------------------

_KNN_K = 5
_KNN_NQ = 50


def _q_knn_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.label_knn_accuracy(emb, k=_KNN_K, n_queries=_KNN_NQ)


_register(
    "label_knn_accuracy",
    _q_knn_acc,
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS tl
           FROM embeddings WHERE vec_id < {_KNN_NQ}),
sc AS (SELECT q.query_id, q.tl, e.vec_id AS nid, e.label AS nl,
              {_cos_sql("q.qv", "e.embedding")} AS cs
       FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
tk AS (SELECT * FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC, nid ASC) AS rk
         FROM sc) WHERE rk <= {_KNN_K}),
v AS (SELECT query_id, tl, nl, count(*) AS v FROM tk GROUP BY 1, 2, 3),
p AS (SELECT query_id, tl AS label,
             CASE WHEN nl = tl THEN 1 ELSE 0 END AS ok
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY v DESC, nl ASC) AS rn
            FROM v) WHERE rn = 1)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(ok) AS BIGINT) AS n_correct,
       round(CAST(sum(ok) AS DOUBLE) / count(*), 6) AS accuracy
FROM p GROUP BY 1
""",
)
