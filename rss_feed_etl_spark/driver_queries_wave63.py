"""Wave-63 driver queries: token-length histogram (the sequence-length
profile that sizes packing/context-length decisions) and a language-ID
confusion matrix against the corpus labels (the eval for the `lang_id`
heuristic itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import textstats

_TLH_BUCKET = 50


def _q_token_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    n = textstats.token_count(F.col("text"))
    return (
        docs.select((F.floor(n / _TLH_BUCKET) * _TLH_BUCKET).cast("bigint").alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


_register(
    "token_length_histogram",
    _q_token_length_hist,
    rf"""
WITH t AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
  FROM documents)
SELECT CAST(floor(n_tok / {_TLH_BUCKET}) * {_TLH_BUCKET} AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM t GROUP BY 1
""",
)


def _q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement matrix of the stopword-profile language-ID heuristic vs
    the corpus's own lang labels — the precision/recall surface for the
    `lang_id` operator (X-eval of an operator BY another query, the same
    pattern as `dedup_pair_recall`)."""
    docs = td.load_table(spark, sf_dir, "documents")
    pred = textstats.lang_id(docs).select("doc_id", "pred_lang")
    truth = docs.select("doc_id", F.col("lang").alias("true_lang"))
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


# reuse the EXACT score/argmax macros the green `lang_id` oracle runs —
# the confusion matrix must grade the same predictions, not a re-derivation
from .driver_queries_corpus import _PRED, _SCORES  # noqa: E402

_register(
    "langid_confusion",
    _q_langid_confusion,
    f"""
WITH t AS (
  SELECT doc_id, list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)) AS toks
  FROM documents),
s AS (SELECT doc_id, {_SCORES} FROM t),
p AS (SELECT doc_id, {_PRED} AS pred_lang FROM s)
SELECT d.lang AS true_lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN p ON d.doc_id = p.doc_id
GROUP BY 1, 2
""",
)
