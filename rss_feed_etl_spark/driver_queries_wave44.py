"""Driver-contract queries, wave 44: retrieve→rerank pipeline (int8
candidates, exact-cosine rerank), order-insensitive bag-of-words dedup,
and small-files compaction planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .operators import dedup, similarity
from .sources import parquet as pq

# --- retrieve → rerank ------------------------------------------------------

_RR_CAND_K = 30
_RR_K = 5
_RR_NQ = 10


def _q_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RR_NQ)
    cands = similarity.int8_dot_topk(emb, queries, k=_RR_CAND_K)
    return similarity.rerank_exact(emb, cands, k=_RR_K, decimals=4).select(
        "query_id", "neighbor_id", F.col("cosine").alias("cosine_sim"), "rank"
    )


_register(
    "ann_rerank_exact",
    _q_rerank,
    f"""
WITH s AS (SELECT CAST(max(abs(u)) AS DOUBLE) AS scale
           FROM (SELECT unnest(embedding) AS u FROM embeddings)),
q8 AS (SELECT vec_id,
              list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) / scale * 127) AS INT)) AS qv
       FROM embeddings, s),
qs AS (SELECT vec_id AS query_id, qv FROM q8 WHERE vec_id < {_RR_NQ}),
iscored AS (
  SELECT qs.query_id, e.vec_id AS neighbor_id,
         CAST(list_dot_product(qs.qv, e.qv) AS BIGINT) AS dot_q
  FROM q8 e JOIN qs ON e.vec_id <> qs.query_id),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY dot_q DESC, neighbor_id ASC) AS r
    FROM iscored) WHERE r <= {_RR_CAND_K}),
qv AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       WHERE vec_id < {_RR_NQ}),
nv AS (SELECT vec_id AS neighbor_id, embedding AS ne FROM embeddings),
rescored AS (
  SELECT c.query_id, c.neighbor_id, {_cos_sql("qv.qe", "nv.ne")} AS cosine_sim
  FROM cand c JOIN qv USING (query_id) JOIN nv USING (neighbor_id)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM rescored)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_RR_K}
""",
)


# --- bag-of-words fingerprint dedup -----------------------------------------


def _q_bow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.bow_fingerprint_dedup(td.load_table(spark, sf_dir, "documents"))


_register(
    "bow_fingerprint_dedup",
    _q_bow_dedup,
    """
WITH fp AS (
  SELECT doc_id, text,
         md5(array_to_string(
           list_sort(string_split_regex(lower(trim(text)), '\\s+')), ' ')) AS f
  FROM documents),
r AS (SELECT f, min(doc_id) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_dups
      FROM fp GROUP BY 1)
SELECT r.doc_id, fp.text, r.n_dups
FROM r JOIN fp ON r.doc_id = fp.doc_id
""",
)


# --- compaction plan --------------------------------------------------------

_COMPACT_TARGET = 40_000


def _q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    files = ev.groupBy(
        F.col("event_type").alias("part"),
        F.to_date("ts").alias("file_id"),
    ).agg((F.count("*") * 557).cast("bigint").alias("bytes"))
    out = pq.plan_compaction(
        files, partition_col="part", file_col="file_id", bytes_col="bytes",
        target_bytes=_COMPACT_TARGET,
    )
    return out.select(
        "part", F.date_format("file_id", "yyyy-MM-dd").alias("file_id"),
        "bytes", "bin", "bin_bytes", "n_bin_files",
    )


_register(
    "compaction_plan",
    _q_compaction,
    f"""
WITH files AS (
  SELECT event_type AS part, CAST(ts AS DATE) AS file_id,
         CAST(count(*) * 557 AS BIGINT) AS bytes
  FROM events GROUP BY 1, 2),
staged AS (
  SELECT *, CAST(floor(
      (sum(bytes) OVER (PARTITION BY part ORDER BY bytes DESC, file_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       - bytes) / {float(_COMPACT_TARGET)}) AS INT) AS bin
  FROM files)
SELECT part, strftime(file_id, '%Y-%m-%d') AS file_id, bytes, bin,
       CAST(sum(bytes) OVER (PARTITION BY part, bin) AS BIGINT) AS bin_bytes,
       CAST(count(*) OVER (PARTITION BY part, bin) AS BIGINT) AS n_bin_files
FROM staged
""",
)
