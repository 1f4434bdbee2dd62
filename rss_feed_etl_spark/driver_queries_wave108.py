"""Driver-contract queries, wave 108: IVF-PQ composed ANN (the FAISS
production default — coarse cells + PQ-ADC over probed cells only),
packing fragmentation diagnostics, and byte-exact multimodal dedup.

Reference anchor: extends the reference's similarity surface
(src/rss_feed_etl/core/similarity*.py) along the production-ANN axis,
and its dedup stage (run_job_filter.py) to opaque binary media.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _NTOK, _hexfold
from .driver_queries_wave3 import _media_df
from .driver_queries_wave104 import _PQ_K, _PQ_M, _dist, _pq_sub
from .operators import multimodal, packing, similarity

# --- IVF-PQ ANN -------------------------------------------------------------

_IP_QID, _IP_TOP, _IP_CAND = 0, 10, 100
_IP_NCENT, _IP_NPROBE = 16, 4
_IP_NTRAIN = 1024
_IP_TRAIN_SALT, _IP_CELL_SALT = "ivfpq-train-v1", "ivfpq-cells-v1"
_IP_DIM = 64


def _q_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_ann_topk(
        emb,
        query_id=_IP_QID,
        k_top=_IP_TOP,
        candidates=_IP_CAND,
        m=_PQ_M,
        k_codes=_PQ_K,
        iters=1,
        dim=_IP_DIM,
        n_centroids=_IP_NCENT,
        nprobe=_IP_NPROBE,
        n_train=_IP_NTRAIN,
        train_salt=_IP_TRAIN_SALT,
        cell_salt=_IP_CELL_SALT,
    )


_IP_CELL_HK = _hexfold(f"('{_IP_CELL_SALT}:' || CAST(vec_id AS VARCHAR))")
_IP_TRAIN_HK = _hexfold(f"('{_IP_TRAIN_SALT}:' || CAST(vec_id AS VARCHAR))")
_IP_SUBS = ",".join(_pq_sub(s, corpus="probed") for s in range(_PQ_M))
_IP_SUM = " + ".join(f"v{s}.d" for s in range(_PQ_M))
_IP_JOINS = " ".join(f"JOIN v{s} USING (vec_id)" for s in range(1, _PQ_M))

_register(
    "ivfpq_ann_topk",
    _q_ivfpq,
    f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings),
cents AS (
  SELECT vec_id AS ccid, vec AS ccvec FROM (
    SELECT vec_id, vec, {_IP_CELL_HK} AS hk FROM emb
    ORDER BY hk, vec_id LIMIT {_IP_NCENT})),
assign AS (
  SELECT vec_id, ccid AS cell FROM (
    SELECT e.vec_id, c.ccid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_dist("e.vec", "c.ccvec", _IP_DIM)} ASC,
                                       c.ccid ASC) AS rn
    FROM emb e CROSS JOIN cents c) WHERE rn = 1),
qprobe AS (
  SELECT ccid FROM (
    SELECT c.ccid,
           row_number() OVER (ORDER BY {_dist("q.vec", "c.ccvec", _IP_DIM)} ASC,
                                       c.ccid ASC) AS rn
    FROM cents c CROSS JOIN
         (SELECT vec FROM emb WHERE vec_id = {_IP_QID}) q) WHERE rn <= {_IP_NPROBE}),
probed AS (
  SELECT e.vec_id, e.vec FROM emb e JOIN assign a USING (vec_id)
  WHERE a.cell IN (SELECT ccid FROM qprobe) AND e.vec_id <> {_IP_QID}),
samp AS (
  SELECT vec_id, vec FROM (
    SELECT vec_id, vec, {_IP_TRAIN_HK} AS hk FROM emb
    ORDER BY hk, vec_id LIMIT {_IP_NTRAIN})),
seeds AS (SELECT vec_id FROM samp ORDER BY vec_id LIMIT {_PQ_K}),{_IP_SUBS},
est AS (
  SELECT v0.vec_id, round({_IP_SUM}, 6) AS est_sqdist
  FROM v0 {_IP_JOINS}),
shortlist AS (SELECT vec_id FROM est
              ORDER BY est_sqdist ASC, vec_id ASC LIMIT {_IP_CAND}),
rer AS (
  SELECT s.vec_id,
         round({_dist("e.vec", "q.vec", _IP_DIM)}, 6) AS sqdist
  FROM shortlist s JOIN emb e USING (vec_id)
       CROSS JOIN (SELECT vec FROM emb WHERE vec_id = {_IP_QID}) q),
top AS (SELECT vec_id, sqdist FROM rer
        ORDER BY sqdist ASC, vec_id ASC LIMIT {_IP_TOP})
SELECT vec_id, sqdist,
       CAST(row_number() OVER (ORDER BY sqdist ASC, vec_id ASC) AS INT)
           AS rank
FROM top
""",
)


# --- packing fragmentation ---------------------------------------------------

_PF_SEQ, _PF_SALT, _PF_BUCKETS = 512, "pack-v1", 1024


def _q_pack_frag(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    from .operators.textstats import token_count

    staged = docs.select("doc_id", token_count("text").alias("nt"))
    return packing.packing_fragmentation(
        staged, "nt", key_col="doc_id", seq_len=_PF_SEQ, salt=_PF_SALT,
        n_buckets=_PF_BUCKETS,
    )


_PF_HEX = _hexfold(f"('{_PF_SALT}:' || CAST(doc_id AS VARCHAR))")

_register(
    "packing_fragmentation",
    _q_pack_frag,
    rf"""
WITH staged AS (
  SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens, {_PF_HEX} AS h
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY h % {_PF_BUCKETS}, h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS strt
  FROM staged),
pk AS (SELECT n_tokens, strt % {_PF_SEQ} AS seq_offset FROM cum)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(ceil(CAST(sum(n_tokens) AS DOUBLE) / {_PF_SEQ}.0) AS BIGINT)
           AS n_seqs,
       CAST(sum(CASE WHEN n_tokens > 0 AND seq_offset + n_tokens > {_PF_SEQ}
                     THEN 1 ELSE 0 END) AS BIGINT) AS straddled_docs,
       round(CAST(sum(CASE WHEN n_tokens > 0 AND seq_offset + n_tokens > {_PF_SEQ}
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(sum(CASE WHEN n_tokens > 0 THEN 1 ELSE 0 END) AS DOUBLE), 6)
           AS straddle_rate,
       round(CAST(sum(CASE WHEN n_tokens > 0
                           THEN 1 + floor((seq_offset + n_tokens - 1) / {_PF_SEQ})
                           END) AS DOUBLE)
             / CAST(sum(CASE WHEN n_tokens > 0 THEN 1 ELSE 0 END) AS DOUBLE), 6)
           AS mean_spans
FROM pk
""",
)


# --- byte-exact media dedup --------------------------------------------------


def _q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_df(spark, sf_dir, "image").select("media_id", "content")
    dup_all = media.select(
        (F.col("media_id") + 1000000).alias("media_id"), "content"
    )
    dup_third = media.filter(F.col("media_id") % 3 == 0).select(
        (F.col("media_id") + 2000000).alias("media_id"), "content"
    )
    aug = media.unionByName(dup_all).unionByName(dup_third)
    return multimodal.media_exact_dedup(aug)


_register(
    "media_exact_dedup",
    _q_media_dedup,
    """
WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS f FROM documents
  UNION ALL
  SELECT doc_id + 1000000, md5(text) FROM documents
  UNION ALL
  SELECT doc_id + 2000000, md5(text) FROM documents WHERE doc_id % 3 = 0),
c AS (SELECT f, min(media_id) AS canonical_id FROM m GROUP BY 1)
SELECT m.media_id, c.canonical_id
FROM m JOIN c USING (f)
WHERE m.media_id <> c.canonical_id
""",
)
