"""Driver-contract queries, wave 114: interpolated trigram LM scoring
and per-language UTF-8 byte economics.

Reference anchor: the reference scores text quality with an external
LLM call (src/rss_feed_etl/llm/scorer.py); the trigram interpolation is
the self-contained KenLM-shaped stand-in CCNet-style pipelines run
before any model is in the loop, and the byte-expansion table is the
storage/tokenizer-planning pass a multilingual corpus needs first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import textstats

# --- interpolated trigram logppl (train on even docs, score all) ----------------

_TRI_LAMBDAS = (0.6, 0.3, 0.1)


def _q_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    model = docs.filter(F.col("doc_id") % 2 == 0)
    return textstats.interp_trigram_logppl(
        docs, model=model, lambdas=_TRI_LAMBDAS
    )


_L3, _L2, _L1 = _TRI_LAMBDAS

_register(
    "interp_trigram_logppl",
    _q_trigram,
    rf"""
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents),
trigs AS (SELECT doc_id AS id,
                 unnest(list_transform(range(1, len(w) - 1),
                        i -> {{'a': w[i], 'b': w[i+1], 'c': w[i+2]}}),
                        recursive := true)
          FROM t),
mtrigs AS (SELECT doc_id AS id,
                  unnest(list_transform(range(1, len(w) - 1),
                         i -> {{'a': w[i], 'b': w[i+1], 'c': w[i+2]}}),
                         recursive := true)
           FROM t WHERE doc_id % 2 = 0),
mbigs AS (SELECT doc_id AS id,
                 unnest(list_transform(range(1, len(w)),
                        i -> {{'a': w[i], 'b': w[i+1]}}),
                        recursive := true)
          FROM t WHERE doc_id % 2 = 0),
c3 AS (SELECT a, b, c, count(*) AS n3 FROM mtrigs GROUP BY 1, 2, 3),
c2 AS (SELECT a, b, count(*) AS n2 FROM mbigs GROUP BY 1, 2),
c1 AS (SELECT tok, count(*) AS n1
       FROM (SELECT unnest(w) AS tok FROM t WHERE doc_id % 2 = 0)
       GROUP BY 1),
tot AS (SELECT sum(n1) AS total, count(*) AS vocab FROM c1),
scored AS (
  SELECT trigs.id,
         round(-ln(
           {_L3} * (CASE WHEN c3.n3 IS NOT NULL AND h.n2 > 0
                         THEN c3.n3 / CAST(h.n2 AS DOUBLE) ELSE 0.0 END)
           + {_L2} * (CASE WHEN bc.n2 IS NOT NULL AND nb.n1 > 0
                           THEN bc.n2 / CAST(nb.n1 AS DOUBLE) ELSE 0.0 END)
           + {_L1} * (coalesce(uc.n1, 0) + 1.0) / (total + vocab)
         ), 9) AS nll
  FROM trigs
  LEFT JOIN c3 ON trigs.a = c3.a AND trigs.b = c3.b AND trigs.c = c3.c
  LEFT JOIN c2 h ON trigs.a = h.a AND trigs.b = h.b
  LEFT JOIN c2 bc ON trigs.b = bc.a AND trigs.c = bc.b
  LEFT JOIN c1 nb ON trigs.b = nb.tok
  LEFT JOIN c1 uc ON trigs.c = uc.tok
  CROSS JOIN tot)
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(nll), 6) AS logppl
FROM scored GROUP BY 1
""",
)


# --- UTF-8 expansion by lang (plant non-ASCII deterministically) -----------------

_UTF8_PLANT_SPARK = {
    "zh": " 模型训练数据",
    "de": " schöne Grüße",
    "fr": " déjà café",
    "es": " año señal",
}


def _q_utf8(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    suffix = F.lit("")
    planted = F.when(F.col("doc_id") % 4 == 0, F.lit(""))
    for lang, sfx in _UTF8_PLANT_SPARK.items():
        planted = planted.when(F.col("lang") == lang, F.lit(sfx))
    staged = docs.select(
        "doc_id", "lang",
        F.concat(F.col("text"), F.coalesce(planted, suffix)).alias("text"),
    )
    return textstats.utf8_expansion_by_lang(staged)


_UTF8_PLANT_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN '{sfx}'"
    for lang, sfx in _UTF8_PLANT_SPARK.items()
)

_register(
    "utf8_expansion_by_lang",
    _q_utf8,
    f"""
WITH raw AS (
  SELECT lang,
         text || CASE WHEN doc_id % 4 = 0 THEN ''
                      {_UTF8_PLANT_SQL}
                      ELSE '' END AS t
  FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(t)) AS BIGINT) AS n_chars,
       CAST(sum(strlen(t)) AS BIGINT) AS n_bytes,
       CASE WHEN sum(length(t)) > 0
            THEN round(CAST(sum(strlen(t)) AS DOUBLE)
                       / CAST(sum(length(t)) AS DOUBLE), 6)
            END AS bytes_per_char,
       round(avg(CASE WHEN strlen(t) = length(t) THEN 1.0 ELSE 0.0 END), 6)
         AS ascii_doc_share
FROM raw GROUP BY 1
""",
)
