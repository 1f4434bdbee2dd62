"""Driver-contract queries, wave 133: Chao1 vocabulary richness.

Reference anchor: the reference's vocabulary is whatever arrives in
today's feed batch (src/etl/rss_feed_etl.py); Chao1 answers how much
vocabulary the NEXT batches will still add — the type-count twin of
wave 127's Good-Turing unseen mass, over the same trigram tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import textstats


def _q_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.chao1_vocab_estimate(docs, ngram=3)


_register(
    "chao1_vocab_estimate",
    _q_chao1,
    r"""
WITH t AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents),
toks AS (
  SELECT unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
  FROM t),
types AS (SELECT tok, count(*) AS r FROM toks GROUP BY 1),
agg AS (SELECT CAST(count(*) AS BIGINT) AS v,
               CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(r) AS BIGINT) AS nt
        FROM types)
SELECT v AS v_observed, n1, n2,
       round(v + CAST(n1 AS DOUBLE) * (n1 - 1) / (2.0 * (n2 + 1)), 6)
         AS chao1,
       round(CAST(1.0 AS DOUBLE) - CAST(n1 AS DOUBLE) / nt, 6) AS coverage
FROM agg
""",
)
