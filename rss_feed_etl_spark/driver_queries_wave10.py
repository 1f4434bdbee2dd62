"""Driver-contract queries, wave 10: iterative k-means clustering over
embeddings, sequence packing (token-budget layout for training batches),
and PMI collocation mining.

The k-means oracle replays the exact 2-iteration Lloyd trajectory in SQL —
possible because every centroid component is rounded in-engine each
iteration, so both engines step through identical states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _W, _hexfold
from .operators import clustering, packing, textstats
from .operators.textstats import token_count

# --- k-means (2 Lloyd iterations, k=8) ------------------------------------

_KM_K = 8


def _q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return clustering.kmeans_lloyd(emb, k=_KM_K, iters=2)


def _km_dist(e: str, c: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, 65), "
        f"i -> ({e}[i] - {c}[i]) * ({e}[i] - {c}[i])), (x, y) -> x + y)"
    )


def _km_step(i: int, prev: str) -> str:
    """CTEs for one Lloyd step: assign to ``prev`` centroids, re-average."""
    return f"""
s{i} AS (SELECT e.vec_id, e.vec, c.cid, {_km_dist("e.vec", "c.cvec")} AS dist
         FROM emb e CROSS JOIN {prev} c),
a{i} AS (SELECT vec_id, vec, cid FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist ASC, cid ASC) AS rn
           FROM s{i}) WHERE rn = 1),
u{i} AS (SELECT cid, i AS pos, round(avg(vec[i]), 6) AS cv
         FROM a{i} CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
         GROUP BY cid, i),
c{i} AS (SELECT cid, list(cv ORDER BY pos) AS cvec FROM u{i} GROUP BY cid)"""


_register(
    "kmeans_clusters",
    _q_kmeans,
    f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
c0 AS (
  SELECT vec_id AS cid, list_transform(vec, x -> round(x, 6)) AS cvec
  FROM emb WHERE vec_id < {_KM_K}),{_km_step(1, "c0")},{_km_step(2, "c1")},
s3 AS (SELECT e.vec_id, c.cid, {_km_dist("e.vec", "c.cvec")} AS dist
       FROM emb e CROSS JOIN c2 c),
a3 AS (SELECT vec_id, cid, dist FROM (
         SELECT *, row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist ASC, cid ASC) AS rn
         FROM s3) WHERE rn = 1)
SELECT cid AS cluster_id, count(*) AS n_members,
       round(avg(dist), 6) AS mean_sqdist
FROM a3 GROUP BY 1
""",
)


# --- sequence packing ------------------------------------------------------

_SEQ_LEN = 512
_PACK_SALT = "pack-v1"
_PACK_BUCKETS = 1024


def _q_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return packing.pack_sequences(
        staged,
        token_col="n_tokens",
        seq_len=_SEQ_LEN,
        salt=_PACK_SALT,
        n_buckets=_PACK_BUCKETS,
    )


_PACK_H = _hexfold(f"('{_PACK_SALT}:' || CAST(doc_id AS VARCHAR))")
_register(
    "sequence_packing",
    _q_packing,
    f"""
WITH staged AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0 ELSE len({_W}) END AS n_tokens,
         {_PACK_H} AS h
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY h % {_PACK_BUCKETS}, h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start
  FROM staged)
SELECT doc_id, n_tokens,
       CAST(floor(start / {_SEQ_LEN}) AS BIGINT) AS seq_id,
       CAST(start % {_SEQ_LEN} AS BIGINT) AS seq_offset
FROM cum
""",
)


# --- PMI collocations ------------------------------------------------------

_PMI_MIN_DF = 10
_PMI_MIN_PAIR = 5
_PMI_TOP = 50


def _q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.pmi_pairs(
        docs, min_df=_PMI_MIN_DF, min_pair=_PMI_MIN_PAIR, top=_PMI_TOP
    )


_register(
    "pmi_top_pairs",
    _q_pmi,
    f"""
WITH ex AS (SELECT DISTINCT doc_id AS id, unnest({_W}) AS term FROM documents),
dfreq AS (SELECT term, count(*) AS dfreq FROM ex GROUP BY term
          HAVING count(*) >= {_PMI_MIN_DF}),
kept AS (SELECT id, term, dfreq FROM ex JOIN dfreq USING (term)),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         a.dfreq AS df_a, b.dfreq AS df_b, count(*) AS n_ab
  FROM kept a JOIN kept b ON a.id = b.id AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {_PMI_MIN_PAIR})
SELECT term_a, term_b, n_ab,
       round(ln(n_ab * n_docs * 1.0 / (df_a * df_b)), 6) AS pmi
FROM pairs CROSS JOIN n
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT {_PMI_TOP}
""",
)
