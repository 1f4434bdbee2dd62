"""Driver-contract queries, wave 140: hardest-triplet margins and the
filtered-vector-search (pre- vs post-filter) recall audit.

Reference anchor: the reference's matcher serves nearest-TF-IDF matches
unconditionally (src/utils/ats_matcher.py); the triplet audit is the
readiness check before contrastive fine-tuning of such a space, and the
filtered-ANN audit is the production question the moment retrieval
gains a metadata filter (same-category search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .operators import similarity

_TM_NQ = 50
_TM_MARGIN = 0.1
_FA_NQ = 50
_FA_K = 5
_FA_PRE = 15

_SCORED = f"""
q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id < {{nq}}),
scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  (e.label = q.qlabel) AS same,
                  {_cos_sql("q.qv", "e.embedding")} AS cs
           FROM embeddings e JOIN q ON e.vec_id <> q.query_id)
"""


def _q_triplet(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.triplet_margin_stats(
        emb, n_anchors=_TM_NQ, margin=_TM_MARGIN
    )


_register(
    "triplet_margin_stats",
    _q_triplet,
    f"""
WITH {_SCORED.format(nq=_TM_NQ)},
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id, same
                     ORDER BY CASE WHEN same THEN cs ELSE -cs END ASC,
                              neighbor_id ASC) AS r
           FROM scored),
pos AS (SELECT query_id, neighbor_id AS pos_id, cs AS cos_pos
        FROM ranked WHERE same AND r = 1),
neg AS (SELECT query_id, neighbor_id AS neg_id, cs AS cos_neg
        FROM ranked WHERE NOT same AND r = 1)
SELECT query_id, pos_id, neg_id, cos_pos, cos_neg,
       round(cos_pos - cos_neg, 4) AS triplet_margin,
       round(cos_pos - cos_neg, 4) < CAST({_TM_MARGIN} AS DOUBLE) AS violation
FROM pos JOIN neg USING (query_id)
""",
)


def _q_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.filtered_ann_recall(
        emb, n_queries=_FA_NQ, k=_FA_K, prefetch=_FA_PRE
    )


_register(
    "filtered_ann_recall",
    _q_filtered_ann,
    f"""
WITH {_SCORED.format(nq=_FA_NQ)},
exact AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cs DESC, neighbor_id ASC) AS r
          FROM scored WHERE same),
ek AS (SELECT query_id, neighbor_id FROM exact WHERE r <= {_FA_K}),
pre AS (SELECT query_id, neighbor_id, same,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cs DESC, neighbor_id ASC) AS r
        FROM scored),
post AS (SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY r ASC) AS rr
         FROM pre WHERE r <= {_FA_PRE} AND same),
pk AS (SELECT query_id, neighbor_id FROM post WHERE rr <= {_FA_K}),
counts AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_postfilter
           FROM pk GROUP BY 1),
inter AS (SELECT ek.query_id,
                 CAST(sum(CASE WHEN pk.neighbor_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
                 CAST(count(*) AS BIGINT) AS n_exact
          FROM ek LEFT JOIN pk ON ek.query_id = pk.query_id
                              AND ek.neighbor_id = pk.neighbor_id
          GROUP BY 1)
SELECT inter.query_id, n_exact,
       CAST(coalesce(n_postfilter, 0) AS BIGINT) AS n_postfilter,
       round(CAST(n_hit AS DOUBLE) / n_exact, 6) AS recall_at_k
FROM inter LEFT JOIN counts USING (query_id)
""",
)
