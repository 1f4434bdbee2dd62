"""Driver-contract queries, wave 41: batched multi-query BM25 with
nDCG/MRR ranking metrics, Bloom-filter join pruning, and prefix-clone
pair detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _AUG_SQL, _W, _aug_docs, _hexfold
from .operators import dedup, joins, retrieval

# --- multi-query BM25 + nDCG/MRR -------------------------------------------

_RM_QUERIES = {
    "q_spark": ["spark"],
    "q_vector": ["vector", "window"],
    "q_batch": ["batch", "merge"],
}
_RM_K = 20


def _q_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    ranked = retrieval.bm25_multi_topk(docs, _RM_QUERIES, topk=_RM_K)
    # deterministic graded relevance for an engine-level eval fixture
    rel = (F.col("doc_id") + F.length("query_id")) % 4
    return retrieval.rank_metrics(ranked.withColumn("rel", rel))


def _rank_metrics_sql() -> str:
    all_terms = sorted({t for ts in _RM_QUERIES.values() for t in ts})
    terms_sql = ", ".join(f"'{t}'" for t in all_terms)
    values = ", ".join(
        f"('{q}', '{t}')" for q, ts in _RM_QUERIES.items() for t in ts
    )
    k1, b = retrieval.BM25_K1, retrieval.BM25_B
    return f"""
WITH toks AS (SELECT doc_id, {_W} AS w FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM toks),
q(query_id, term) AS (VALUES {values}),
ex AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks),
tf AS (SELECT doc_id, dl, term, count(*) AS tf
       FROM ex WHERE term IN ({terms_sql}) GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
scored AS (SELECT q.query_id, tf.doc_id,
                  round(sum(ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
                            * tf * ({k1} + 1)
                            / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))), 6)
                    AS score
           FROM tf JOIN dfreq USING (term) JOIN q USING (term) CROSS JOIN stats
           GROUP BY 1, 2),
ranked AS (SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rnk
           FROM scored QUALIFY rnk <= {_RM_K}),
rel AS (SELECT *, (doc_id + length(query_id)) % 4 AS rel FROM ranked),
ip AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                    ORDER BY rel DESC, doc_id ASC) AS ipos
       FROM rel)
SELECT query_id,
       round(CASE WHEN sum((pow(2.0, rel) - 1) / log2(ipos + 1.0)) > 0
                  THEN sum((pow(2.0, rel) - 1) / log2(rnk + 1.0))
                       / sum((pow(2.0, rel) - 1) / log2(ipos + 1.0))
                  ELSE 0.0 END, 6) AS ndcg,
       round(coalesce(1.0 / min(CASE WHEN rel >= 2 THEN rnk END), 0.0), 6) AS mrr,
       CAST(count(*) AS BIGINT) AS n_ranked
FROM ip GROUP BY 1
"""


_register("search_rank_metrics", _q_rank_metrics, _rank_metrics_sql())


# --- bloom-filter join pruning ---------------------------------------------

_BLOOM_MIN_PRICE = 450_000.0


def _q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = td.load_table(spark, sf_dir, "lineitem")
    orders = td.load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _BLOOM_MIN_PRICE
    )
    joined = joins.bloom_prune_join(
        li, orders, fact_key="l_orderkey", dim_key="o_orderkey"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


_register(
    "bloom_prune_revenue",
    _q_bloom_join,
    f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > {_BLOOM_MIN_PRICE}
GROUP BY 1
""",
)


# --- prefix-clone pairs ----------------------------------------------------

_PC_K = 10
_PC_MAX_BUCKET = 10_000


def _q_prefix_clones(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.prefix_clone_pairs(
        _aug_docs(spark, sf_dir), id_col="id", text_col="text",
        k=_PC_K, max_bucket=_PC_MAX_BUCKET,
    )


_register(
    "prefix_clone_pairs",
    _q_prefix_clones,
    f"""
WITH {_AUG_SQL},
t AS (SELECT id, {_W} AS w FROM aug),
c AS (SELECT id, {_hexfold(f"array_to_string(w[1:{_PC_K}], ' ')")} AS code
      FROM t WHERE len(w) >= {_PC_K}),
-- mirror the Spark query's max_bucket cap so guarded and oracle semantics
-- stay identical even when a head bucket crosses the cap
k AS (SELECT code FROM c GROUP BY code
      HAVING count(*) BETWEEN 2 AND {_PC_MAX_BUCKET})
SELECT a.id AS id_a, b.id AS id_b
FROM c a JOIN c b ON a.code = b.code AND a.id < b.id
WHERE a.code IN (SELECT code FROM k)
""",
)
