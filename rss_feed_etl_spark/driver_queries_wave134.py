"""Driver-contract queries, wave 134: rank-biased overlap between the
two lexical rankers, and the per-source Wasserstein-1 length shift.

Reference anchor: the reference ranks resumes against postings with one
fixed scorer (src/utils/ats_matcher.py); RBO is the ranker-agreement
audit you need the moment a second scorer exists (the registry has
BM25, query-likelihood and RRF fusion), and the W1 length shift is the
actionable form of the length drift its date-window filters only gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .operators import profiling, retrieval

# --- rank-biased overlap: BM25 vs query-likelihood ---------------------------------
# Same query terms and depth as the two registered rankers (waves 9/123).

_RBO_TERMS = ["spark", "vector", "window"]
_RBO_DEPTH = 20
_RBO_MU = 300.0


def _q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    a = retrieval.bm25_topk(docs, _RBO_TERMS, topk=_RBO_DEPTH)
    b = retrieval.query_likelihood_topk(
        docs, _RBO_TERMS, mu=_RBO_MU, topk=_RBO_DEPTH
    )
    return retrieval.rank_biased_overlap(a, b, depth=_RBO_DEPTH)


_register(
    "rbo_bm25_vs_ql",
    _q_rbo,
    f"""
WITH a0 AS (SELECT * FROM ({ORACLES["bm25_search"]}) t),
b0 AS (SELECT * FROM ({ORACLES["query_likelihood_search"]}) t),
ra AS (SELECT doc_id AS id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS ra
       FROM a0),
rb AS (SELECT doc_id AS id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rb
       FROM b0),
pairs AS (SELECT ra.ra, rb.rb FROM ra FULL OUTER JOIN rb ON ra.id = rb.id),
ds AS (SELECT unnest(range(1, {_RBO_DEPTH} + 1)) AS d),
per AS (SELECT d,
               CAST(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                                  AND ra <= d AND rb <= d
                             THEN 1 ELSE 0 END) AS BIGINT) AS inter
        FROM ds CROSS JOIN pairs GROUP BY 1)
SELECT CAST(max(d) AS INT) AS depth,
       CAST(max(CASE WHEN d = {_RBO_DEPTH} THEN inter END) AS BIGINT)
         AS n_common,
       round(CAST(max(CASE WHEN d = {_RBO_DEPTH} THEN inter END) AS DOUBLE)
             / CAST({_RBO_DEPTH} AS DOUBLE), 6) AS agreement_at_k,
       round(CAST(sum(CAST(round(CAST(inter AS DOUBLE) / d
                                 / (CAST(1 AS BIGINT) << d), 9)
                           AS DECIMAL(30,10))) AS DOUBLE), 6) AS rbo
FROM per
""",
)


# --- per-source Wasserstein-1 length shift ------------------------------------------

_W1_LEN = (
    "CASE WHEN trim(text) = '' THEN 0 "
    r"ELSE len(string_split_regex(trim(text), '\s+')) END"
)


def _q_w1_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return profiling.wasserstein_length_shift(docs, group_col="source")


_register(
    "wasserstein_length_shift",
    _q_w1_length,
    f"""
WITH t AS (SELECT source AS g, {_W1_LEN} AS v FROM documents),
counts AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
pooled AS (SELECT v,
                  CAST(sum(ct) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_all,
                  lead(v) OVER (ORDER BY v) AS next_v
           FROM (SELECT v, CAST(sum(c) AS BIGINT) AS ct
                 FROM counts GROUP BY 1)),
totals AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM counts GROUP BY 1),
alln AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM counts),
grid AS (SELECT totals.g, totals.n_g, pooled.v, pooled.cum_all,
                pooled.next_v, coalesce(counts.c, 0) AS c
         FROM totals CROSS JOIN pooled
         LEFT JOIN counts ON counts.g = totals.g AND counts.v = pooled.v),
staged AS (SELECT g, n_g, v, cum_all, next_v,
                  CAST(sum(c) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_g
           FROM grid)
SELECT g AS source,
       CAST(max(n_g) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(round(
           abs(CAST(cum_g AS DOUBLE) / n_g
               - CAST(cum_all AS DOUBLE) / n_all)
           * CAST(next_v - v AS DOUBLE), 9) AS DECIMAL(30,10))) AS DOUBLE), 6)
         AS w1_tokens
FROM staged CROSS JOIN alln
WHERE next_v IS NOT NULL
GROUP BY 1
""",
)
