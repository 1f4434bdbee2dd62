"""Driver-contract queries, wave 33: pipeline self-evaluation (ANN
recall@k vs the exact baseline, Cohen's kappa for label agreement) and
unicode text normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .operators import clustering, similarity
from .functions.text import normalize_unicode

# --- ANN recall@k: LSH vs brute force ---------------------------------------

_RECALL_K = 5


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=_RECALL_K)
    approx = similarity.cosine_topk_lsh(emb, queries, k=_RECALL_K)
    return similarity.topk_recall(exact, approx, k=_RECALL_K)


_register(
    "ann_recall_lsh",
    _q_ann_recall,
    f"""
WITH exact AS (SELECT * FROM ({ORACLES["ann_cosine_topk"]}) t),
approx AS (SELECT * FROM ({ORACLES["ann_cosine_topk_lsh"]}) t)
SELECT e.query_id,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       round(count(a.neighbor_id) / {_RECALL_K}.0, 6) AS recall
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY 1
""",
)


# --- Cohen's kappa over the centroid-classification confusion ---------------


def _q_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    conf = similarity.nearest_centroid_confusion(emb)
    return clustering.cohens_kappa(conf)


_register(
    "clustering_kappa",
    _q_kappa,
    f"""
WITH conf AS (SELECT * FROM ({ORACLES["label_centroid_confusion"]}) t),
tot AS (
  SELECT sum(n) AS N,
         sum(CASE WHEN true_label = predicted_label THEN n ELSE 0 END) AS agree
  FROM conf),
r AS (SELECT true_label AS lbl, sum(n) AS rn FROM conf GROUP BY 1),
c AS (SELECT predicted_label AS lbl, sum(n) AS cn FROM conf GROUP BY 1),
marg AS (SELECT sum(rn * cn) AS s FROM r JOIN c USING (lbl))
SELECT CAST(N AS BIGINT) AS n_items,
       round(agree / N, 6) AS po,
       round(s / (N * N), 6) AS pe,
       round((agree / N - s / (N * N)) / (1 - s / (N * N)), 6) AS kappa
FROM tot, marg
""",
)


# --- unicode normalization --------------------------------------------------
# The synthetic corpus is ASCII, so the query first INJECTS the messy
# characters deterministically (curly-quoted 'data', NBSP after 'the',
# em-dash for ' - ') and then proves the normalizer maps them back out.


def _q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    messy = F.replace(
        F.replace(F.col("text"), F.lit(" data "), F.lit(" “data” ")),
        F.lit(" the "),
        F.lit(" the "),
    )
    norm = normalize_unicode(messy)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("bigint").alias("n_chars"),
    )


_register(
    "unicode_normalized",
    _q_normalize,
    """
WITH messy AS (
  SELECT doc_id,
         replace(replace(text, ' data ', ' “data” '),
                 ' the ', ' the ') AS m
  FROM documents),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(regexp_replace(
             translate(m, '‘’“”–— ', '''''""-- '),
             '…', '...', 'g'),
             '[\\x00-\\x1f\\x7f]', ' ', 'g'),
             '\\s+', ' ', 'g')) AS n
  FROM messy)
SELECT doc_id, md5(n) AS norm_md5, CAST(length(n) AS BIGINT) AS n_chars
FROM norm
""",
)
