"""Wave-80 driver queries: price-volume revenue bridge and Flesch-Kincaid
readability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import decision_support as ds
from .operators import textstats


def _q_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.revenue_bridge(
        td.load_table(spark, sf_dir, "lineitem"),
        td.load_table(spark, sf_dir, "part"),
    )


_register(
    "revenue_bridge",
    _q_bridge,
    """
WITH b AS (SELECT min(l_shipdate) AS d0, max(l_shipdate) AS d1 FROM lineitem),
cells AS (
  SELECT p.p_brand AS brand,
         CASE WHEN date_diff('day', b.d0, l.l_shipdate) * 2
                   >= date_diff('day', b.d0, b.d1) THEN 1 ELSE 0 END AS era,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(30,10))) * 100, 0) AS BIGINT) AS rc
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey, b
  GROUP BY 1, 2),
piv AS (
  SELECT brand,
         CAST(sum(CASE WHEN era = 0 THEN q ELSE 0 END) AS BIGINT) q1,
         CAST(sum(CASE WHEN era = 1 THEN q ELSE 0 END) AS BIGINT) q2,
         CAST(sum(CASE WHEN era = 0 THEN rc ELSE 0 END) AS BIGINT) r1,
         CAST(sum(CASE WHEN era = 1 THEN rc ELSE 0 END) AS BIGINT) r2
  FROM cells GROUP BY 1)
SELECT brand,
       round(CAST(r1 AS DOUBLE) / 100.0, 2) AS rev_old,
       round(CAST(r2 AS DOUBLE) / 100.0, 2) AS rev_new,
       round(CAST(q2 - q1 AS DOUBLE)
             * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) / 100.0, 2)
         AS volume_effect,
       round(CAST(q2 AS DOUBLE)
             * (CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
                - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) / 100.0, 2)
         AS price_effect,
       round(CAST(r2 - r1 AS DOUBLE) / 100.0, 2) AS delta
FROM piv WHERE q1 > 0 AND q2 > 0
""",
)


def _q_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fk_readability(td.load_table(spark, sf_dir, "documents"))


_register(
    "fk_readability",
    _q_fk,
    r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END
              AS BIGINT) AS n_words,
         CAST(greatest(length(regexp_replace(text, '[.!?]+', '#', 'g'))
              - length(regexp_replace(text, '[.!?]+', '', 'g')), 1)
              AS BIGINT) AS n_sentences,
         CAST(length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
              - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
              AS BIGINT) AS n_syllables
  FROM documents)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(CAST(0.39 AS DOUBLE)
               * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             + CAST(11.8 AS DOUBLE)
               * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             - CAST(15.59 AS DOUBLE), 4) AS fk_grade
FROM t WHERE n_words > 0
""",
)
