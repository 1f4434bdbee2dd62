"""Driver-contract queries, wave 144: UniMax budget allocation and the
pairwise embedding MMD matrix.

Reference anchor: the reference republishes whatever volume each feed
produced (no mixing policy at all, src/etl/rss_feed_etl.py); UniMax
(Chung et al. 2023) completes the mixture-planning family (temperature /
IPF / DoReMi / epoch-budget already registered) with the fairness-first
cap-constrained uniform allocation, and the MMD matrix (Gretton et al.
2012) is the embedding-space distributional companion of the trigram
JSD matrix — the two-sample test a mixture planner runs before merging
class buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import linalg, sampling

_UM_FRAC = 0.5
_UM_EPOCHS = 4

_MMD_M = 64
_MMD_GAMMA = 1.0
_MMD_SALT = "mmd-v1"


def _q_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.unimax_allocation(
        docs, budget_frac=_UM_FRAC, max_epochs=_UM_EPOCHS
    )


_UM_LEN = (
    "CASE WHEN trim(text) = '' THEN 0 "
    r"ELSE len(string_split_regex(trim(text), '\s+')) END"
)

_register(
    "unimax_allocation",
    _q_unimax,
    f"""
WITH per AS (SELECT source AS g, CAST(sum({_UM_LEN}) AS BIGINT) AS n_tokens
             FROM documents GROUP BY 1),
staged AS (
  SELECT g, n_tokens,
         CAST(n_tokens * {_UM_EPOCHS} AS BIGINT) AS cap,
         CAST(floor(CAST(sum(n_tokens) OVER () AS DOUBLE) * {_UM_FRAC})
              AS BIGINT) AS budget,
         row_number() OVER (ORDER BY n_tokens * {_UM_EPOCHS} ASC, g ASC) AS i,
         count(*) OVER () AS s_total,
         CAST(coalesce(sum(n_tokens * {_UM_EPOCHS}) OVER (
             ORDER BY n_tokens * {_UM_EPOCHS} ASC, g ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM per),
flagged AS (
  SELECT *, CAST(CAST(cap AS DOUBLE) <=
                 CAST(budget - cum_prev AS DOUBLE) / (s_total - i + 1)
            AS INT) AS capped
  FROM staged),
solved AS (
  SELECT *,
         CAST(sum(capped) OVER () AS BIGINT) AS k,
         CAST(coalesce(sum(CASE WHEN capped = 1 THEN cap END) OVER (), 0)
              AS BIGINT) AS cum_capped
  FROM flagged),
fin AS (
  SELECT *,
         CASE WHEN s_total > k
              THEN CAST(budget - cum_capped AS DOUBLE) / (s_total - k)
         END AS ustar
  FROM solved)
SELECT g AS source, n_tokens, cap AS cap_tokens, capped,
       round(CASE WHEN capped = 1 THEN CAST(cap AS DOUBLE) ELSE ustar END, 6)
         AS allocation_tokens,
       round(CASE WHEN capped = 1 THEN CAST(cap AS DOUBLE) ELSE ustar END
             / CAST(n_tokens AS DOUBLE), 6) AS epochs
FROM fin
""",
)


def _q_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return linalg.embedding_mmd_matrix(
        emb, m=_MMD_M, gamma=_MMD_GAMMA, salt=_MMD_SALT
    )


_MMD_HK = _hexfold(f"('{_MMD_SALT}:' || CAST(vec_id AS VARCHAR))")
_MMD_D2 = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> (l.va[i] - r.vb[i]) * (l.va[i] - r.vb[i])), (x, y) -> x + y)"
)
_MMD_K = f"round(exp(-{_MMD_GAMMA} * round({_MMD_D2}, 9)), 9)"

_register(
    "embedding_mmd_matrix",
    _q_mmd,
    f"""
WITH emb AS (
  SELECT vec_id AS id, label AS lab,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
         {_MMD_HK} AS hk
  FROM embeddings),
samp AS (SELECT lab, id, vec FROM (
           SELECT *, row_number() OVER (PARTITION BY lab
                                        ORDER BY hk ASC, id ASC) AS rn
           FROM emb) WHERE rn <= {_MMD_M}),
wpairs AS (SELECT l.lab AS la, {_MMD_K} AS k
           FROM (SELECT lab, id, vec AS va FROM samp) l
           JOIN (SELECT lab, id, vec AS vb FROM samp) r
             ON l.lab = r.lab AND l.id < r.id),
within AS (SELECT la, CAST(sum(CAST(k AS DECIMAL(30,10))) AS DOUBLE)
                        / count(*) AS w
           FROM wpairs GROUP BY 1),
counts AS (SELECT lab, CAST(count(*) AS BIGINT) AS n FROM samp GROUP BY 1),
xpairs AS (SELECT l.lab AS la, r.lab AS lb, {_MMD_K} AS k
           FROM (SELECT lab, id, vec AS va FROM samp) l
           JOIN (SELECT lab, id, vec AS vb FROM samp) r
             ON l.lab < r.lab),
cross_m AS (SELECT la, lb, CAST(sum(CAST(k AS DECIMAL(30,10))) AS DOUBLE)
                             / count(*) AS x
            FROM xpairs GROUP BY 1, 2)
SELECT c.la AS label_a, c.lb AS label_b, na.n AS n_a, nb.n AS n_b,
       round(wa.w + wb.w - 2.0 * c.x, 6) AS mmd2
FROM cross_m c
JOIN within wa ON wa.la = c.la
JOIN within wb ON wb.la = c.lb
JOIN counts na ON na.lab = c.la
JOIN counts nb ON nb.lab = c.lb
""",
)
