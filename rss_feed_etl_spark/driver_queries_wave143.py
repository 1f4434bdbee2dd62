"""Driver-contract queries, wave 143: Kendall-τ ranker agreement and the
kNN label confusion matrix.

Reference anchor: the reference serves one fixed TF-IDF scorer
(src/utils/ats_matcher.py) with no agreement or error-structure audit;
τ completes the ranker-agreement pair started by ``rbo_bm25_vs_ql``
(RBO weights prefixes, τ counts pairwise order inversions over the
shared retrieved set), and the confusion matrix is the error-STRUCTURE
view of ``label_knn_accuracy`` (which label pairs the embedding space
cannot separate — the signal that picks contrastive negatives and
flags label noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _cos_sql
from .operators import retrieval, similarity

_KT_TERMS = ["spark", "vector", "window"]  # the wave-134 ranker pair
_KT_DEPTH = 20
_KT_MU = 300.0

_KC_K = 5
_KC_NQ = 50


def _q_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    a = retrieval.bm25_topk(docs, _KT_TERMS, topk=_KT_DEPTH)
    b = retrieval.query_likelihood_topk(
        docs, _KT_TERMS, mu=_KT_MU, topk=_KT_DEPTH
    )
    return retrieval.kendall_tau_rankings(a, b, depth=_KT_DEPTH)


_register(
    "kendall_tau_rankers",
    _q_kendall,
    f"""
WITH a0 AS (SELECT * FROM ({ORACLES["bm25_search"]}) t),
b0 AS (SELECT * FROM ({ORACLES["query_likelihood_search"]}) t),
ra AS (SELECT doc_id AS id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS ra
       FROM a0 QUALIFY ra <= {_KT_DEPTH}),
rb AS (SELECT doc_id AS id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rb
       FROM b0 QUALIFY rb <= {_KT_DEPTH}),
joint AS (SELECT ra.id, ra, rb FROM ra JOIN rb USING (id)),
m AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM joint),
pr AS (SELECT (l.ra - r.ra) * (l.rb - r.rb) AS prod
       FROM joint l JOIN joint r ON l.id < r.id),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(coalesce(sum(CASE WHEN prod > 0 THEN 1 END), 0) AS BIGINT)
                 AS concordant,
               CAST(coalesce(sum(CASE WHEN prod < 0 THEN 1 END), 0) AS BIGINT)
                 AS discordant
        FROM pr)
SELECT n_common, n_pairs, concordant, discordant,
       CASE WHEN n_pairs > 0
            THEN round(CAST(concordant - discordant AS DOUBLE) / n_pairs, 6)
       END AS kendall_tau
FROM m CROSS JOIN agg
""",
)


def _q_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.label_knn_confusion(emb, k=_KC_K, n_queries=_KC_NQ)


_register(
    "knn_label_confusion",
    _q_knn_confusion,
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS tl
           FROM embeddings WHERE vec_id < {_KC_NQ}),
sc AS (SELECT q.query_id, q.tl, e.vec_id AS nid, e.label AS nl,
              {_cos_sql("q.qv", "e.embedding")} AS cs
       FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
tk AS (SELECT * FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC, nid ASC) AS rk
         FROM sc) WHERE rk <= {_KC_K}),
v AS (SELECT query_id, tl, nl, count(*) AS v FROM tk GROUP BY 1, 2, 3),
p AS (SELECT query_id, tl AS true_label, nl AS pred_label
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY v DESC, nl ASC) AS rn
            FROM v) WHERE rn = 1),
cells AS (SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY 1, 2),
tot AS (SELECT true_label, CAST(count(*) AS BIGINT) AS t FROM p GROUP BY 1)
SELECT true_label, pred_label, n,
       round(CAST(n AS DOUBLE) / t, 6) AS row_share
FROM cells JOIN tot USING (true_label)
""",
)
