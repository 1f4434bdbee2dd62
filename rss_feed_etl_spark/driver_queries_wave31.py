"""Driver-contract queries, wave 31: DSIR importance weights for targeted
data selection, int8-quantized similarity search, SCD2 point-in-time
snapshot (time travel over the versioned dimension), and length-bucketed
batching with padding-cost accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _keyed_split, _register, _scd2_history
from .driver_queries_corpus import _hexfold
from .operators import merges, packing, sampling, similarity
from .operators.textstats import token_count

# --- DSIR importance weights ------------------------------------------------

_DSIR_BUCKETS = 4096


def _q_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.importance_weights(
        docs, target_pred=F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )


_register(
    "importance_weights",
    _q_importance,
    f"""
WITH toks AS (
  SELECT doc_id AS id, (lang = 'en') AS is_tgt,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
b AS (SELECT id, is_tgt, ({_hexfold("tok")}) % {_DSIR_BUCKETS} AS bucket FROM toks),
counts AS (
  SELECT bucket, count(*) AS n_raw,
         sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS n_tgt
  FROM b GROUP BY bucket),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM counts),
ratio AS (
  SELECT bucket,
         round(ln((n_tgt + 1.0) / (t_tgt + {_DSIR_BUCKETS}.0))
               - ln((n_raw + 1.0) / (t_raw + {_DSIR_BUCKETS}.0)), 9) AS lr
  FROM counts, tot)
SELECT id AS doc_id, round(avg(lr), 6) AS weight,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM b JOIN ratio USING (bucket) GROUP BY id
""",
)


# --- int8-quantized similarity search ---------------------------------------

_INT8_K = 5


def _q_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.int8_dot_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=_INT8_K
    )


_register(
    "int8_ann_topk",
    _q_int8_topk,
    f"""
WITH s AS (SELECT CAST(max(abs(u)) AS DOUBLE) AS scale
           FROM (SELECT unnest(embedding) AS u FROM embeddings)),
q8 AS (SELECT vec_id,
              list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) / scale * 127) AS INT)) AS qv
       FROM embeddings, s),
qs AS (SELECT vec_id AS query_id, qv FROM q8 WHERE vec_id < 10),
scored AS (
  SELECT qs.query_id, e.vec_id AS neighbor_id,
         CAST(list_dot_product(qs.qv, e.qv) AS BIGINT) AS dot_q
  FROM q8 e JOIN qs ON e.vec_id <> qs.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dot_q DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, dot_q, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_INT8_K}
""",
)


# --- SCD2 point-in-time snapshot --------------------------------------------

_SNAP_AT = "2024-01-20 00:00:00"  # between SCD2_CLOSED_END and AS_OF


def _q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, batch, _ = _keyed_split(spark, sf_dir)
    history = _scd2_history(spark, sf_dir)
    merged = merges.merge_scd2(batch, history, as_of=td.AS_OF)
    return merges.scd2_snapshot_at(merged, _SNAP_AT)


_register(
    "scd2_snapshot_asof",
    _q_scd2_snapshot,
    f"""
SELECT * FROM ({ORACLES["scd2_merge"]}) v
WHERE effective_start <= TIMESTAMP '{_SNAP_AT}'
  AND (effective_end IS NULL OR effective_end > TIMESTAMP '{_SNAP_AT}')
""",
)


# --- length-bucketed batching -----------------------------------------------

_LB_BATCH = 16
_LB_SALT = "lenbatch-v1"


def _q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return packing.length_bucket_batches(
        staged, token_col="n_tokens", batch_size=_LB_BATCH, salt=_LB_SALT
    )


_register(
    "length_bucket_batches",
    _q_length_batches,
    f"""
WITH t AS (
  SELECT doc_id AS key,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
           AS n_tokens
  FROM documents),
s AS (
  SELECT key, n_tokens,
         CAST(ceil(log2(greatest(n_tokens, 1))) AS INT) AS bucket,
         md5('{_LB_SALT}:' || CAST(key AS VARCHAR)) AS pri
  FROM t),
b AS (
  SELECT *, CAST(floor((row_number() OVER (PARTITION BY bucket
                                           ORDER BY pri, key) - 1)
                       / {_LB_BATCH}) AS BIGINT) AS batch_id
  FROM s)
SELECT bucket, batch_id, CAST(count(*) AS BIGINT) AS n_docs,
       max(n_tokens) AS max_tokens, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       round(1 - sum(n_tokens) / greatest(count(*) * max(n_tokens), 1), 6)
         AS pad_frac
FROM b GROUP BY 1, 2
""",
)
