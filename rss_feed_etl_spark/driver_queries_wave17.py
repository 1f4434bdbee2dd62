"""Wave-17 driver queries: corpus-trained unigram-LM perplexity scoring
and incremental exact dedup of a batch against the corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import dedup, textstats

# --- unigram LM log-perplexity --------------------------------------------


def _q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.unigram_logppl(td.load_table(spark, sf_dir, "documents"))


_register(
    "unigram_logppl",
    _q_unigram_logppl,
    """
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tot AS (SELECT sum(n) AS total, count(*) AS vocab FROM counts),
scored AS (
  SELECT id, round(-ln((n + 1.0) / (total + vocab)), 9) AS nll
  FROM toks JOIN counts USING (tok), tot)
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(nll), 6) AS logppl
FROM scored GROUP BY id
""",
)


# --- incremental exact dedup (batch vs corpus) -----------------------------

# batch = 200 exact re-deliveries of corpus docs (must all drop) + 50
# genuinely new docs (must all survive)
_BATCH_SQL = """
batch AS (
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         text || ' unique suffix ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id < 50)
"""

_NORM_FP = "md5(lower(trim(regexp_replace({t}, '\\s+', ' ', 'g'))))"


def _q_incremental_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    redelivered = docs.filter(F.col("doc_id") < 200).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    fresh = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" unique suffix "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    return dedup.incremental_dedup_exact(docs, redelivered.unionByName(fresh))


_register(
    "incremental_dedup_exact",
    _q_incremental_dedup_exact,
    f"""
WITH {_BATCH_SQL},
fpb AS (SELECT {_NORM_FP.format(t="text")} AS f, doc_id, text FROM batch),
best AS (SELECT f, min(doc_id) AS doc_id, min_by(text, doc_id) AS text
         FROM fpb GROUP BY f)
SELECT doc_id, text FROM best
WHERE f NOT IN (SELECT {_NORM_FP.format(t="text")} FROM documents)
""",
)
