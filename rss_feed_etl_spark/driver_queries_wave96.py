"""Driver-contract queries, wave 96: 1-bit (sign) quantized ANN with exact
rerank, and the shard source-mix entropy audit — the memory-floor end of
the embedding-retrieval ladder (float → int8 → 1 bit) plus the loader-
locality check on the LPT shard layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .operators import layout, similarity

# --- binary (sign-bit) ANN ----------------------------------------------------

_BIN_K = 5
_BIN_CAND = 50


def _q_binary_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    return similarity.binary_sign_ann_topk(
        emb, queries, k=_BIN_K, candidates=_BIN_CAND
    )


def _word_sql(e: str, lo: int, hi: int) -> str:
    """MSB-first sign-bit fold over dims lo..hi (1-based), exact bigint —
    identical to the Spark aggregate's acc*2 + (v[i] >= 0)."""
    return (
        f"list_reduce(list_transform(range({lo}, {hi + 1}), "
        f"i -> CAST(CASE WHEN {e}[i] >= 0 THEN 1 ELSE 0 END AS BIGINT)), "
        f"(a, b) -> a * 2 + b)"
    )


_register(
    "binary_sign_ann_topk",
    _q_binary_ann,
    f"""
WITH c AS (
  SELECT vec_id AS neighbor_id, embedding AS ev,
         {_word_sql("embedding", 1, 32)} AS w1,
         {_word_sql("embedding", 33, 64)} AS w2
  FROM embeddings),
q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         {_word_sql("embedding", 1, 32)} AS qw1,
         {_word_sql("embedding", 33, 64)} AS qw2
  FROM embeddings WHERE vec_id < 10),
h AS (
  SELECT q.query_id, c.neighbor_id, q.qv, c.ev,
         bit_count(xor(c.w1, q.qw1)) + bit_count(xor(c.w2, q.qw2)) AS hamming
  FROM c CROSS JOIN q
  WHERE c.neighbor_id <> q.query_id),
cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY hamming ASC, neighbor_id ASC) AS rn
    FROM h) WHERE rn <= {_BIN_CAND}),
r AS (
  SELECT query_id, neighbor_id, hamming,
         {_cos_sql("qv", "ev")} AS cosine_sim
  FROM cand),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM r)
SELECT query_id, neighbor_id, CAST(hamming AS INT) AS hamming,
       cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_BIN_K}
""",
)


# --- shard source entropy ------------------------------------------------------

_SHARDS = 8


def _q_shard_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return layout.shard_source_entropy(
        td.load_table(spark, sf_dir, "documents"), n_shards=_SHARDS
    )


_register(
    "shard_source_entropy",
    _q_shard_entropy,
    rf"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS w
  FROM documents),
r AS (
  SELECT doc_id, source, w,
         row_number() OVER (ORDER BY w DESC, doc_id) AS rk FROM t),
a AS (SELECT source, CAST((rk - 1) % {_SHARDS} AS BIGINT) AS shard FROM r),
cells AS (SELECT shard, source, count(*) AS c FROM a GROUP BY 1, 2),
tot AS (SELECT shard, sum(c) AS n FROM cells GROUP BY 1),
terms AS (
  SELECT cells.shard, tot.n,
         CAST(round(-(c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)), 9)
              AS DECIMAL(20,10)) AS term
  FROM cells JOIN tot USING (shard))
SELECT shard,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_sources,
       round(CAST(sum(term) AS DOUBLE), 6) AS entropy
FROM terms GROUP BY 1
""",
)
