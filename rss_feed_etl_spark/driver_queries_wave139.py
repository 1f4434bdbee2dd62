"""Driver-contract queries, wave 139: Kneser-Ney bigram perplexity and
the Church-Gale term burstiness profile.

Reference anchor: the reference has no language-model notion of quality
at all (its filters are keyword membership, run_job_filter.py); KN
smoothing is the LM the CCNet-style quality tier actually uses, and the
burstiness profile is the stopword-free way to find the topical
vocabulary its keyword lists are written against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import textstats

_KN_D = 0.75


def _q_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.kneser_ney_bigram_ppl(docs, discount=_KN_D)


_register(
    "kneser_ney_bigram_ppl",
    _q_kn,
    f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
           FROM documents),
bigs AS (SELECT doc_id AS id,
                unnest(list_transform(range(1, len(w)),
                       i -> {{'a': w[i], 'b': w[i+1]}}),
                       recursive := true)
         FROM t),
c12 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n2 FROM bigs GROUP BY 1, 2),
lft AS (SELECT a, CAST(sum(n2) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1pl FROM c12 GROUP BY 1),
rgt AS (SELECT b, CAST(count(*) AS BIGINT) AS n1pr FROM c12 GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n1pt FROM c12),
scored AS (
  SELECT bigs.id,
         round(-ln(greatest(CAST(n2 AS DOUBLE) - CAST({_KN_D} AS DOUBLE),
                            CAST(0.0 AS DOUBLE)) / c1
                   + (CAST({_KN_D} AS DOUBLE) * CAST(n1pl AS DOUBLE) / c1)
                     * (CAST(n1pr AS DOUBLE) / n1pt)), 9) AS nll
  FROM bigs JOIN c12 USING (a, b) JOIN lft USING (a) JOIN rgt USING (b)
  CROSS JOIN tot)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(CAST(nll AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6)
         AS kn_logppl
FROM scored GROUP BY 1
""",
)


_TB_TOP = 30


def _q_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.term_burstiness_profile(docs, top=_TB_TOP)


_register(
    "term_burstiness_profile",
    _q_burst,
    f"""
WITH tc AS (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY 1, 2),
stats AS (
  SELECT term, CAST(sum(c) AS BIGINT) AS tf,
         CAST(count(*) AS BIGINT) AS df_docs,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM tc GROUP BY 1
  ORDER BY tf DESC, term ASC LIMIT {_TB_TOP}),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT term, tf, df_docs,
       round(CAST(tf AS DOUBLE) / n_docs, 6) AS mean_per_doc,
       round((CAST(s2 AS DOUBLE) / n_docs
              - (CAST(tf AS DOUBLE) / n_docs) * (CAST(tf AS DOUBLE) / n_docs))
             / (CAST(tf AS DOUBLE) / n_docs), 6) AS vmr,
       round(CAST(tf AS DOUBLE) / df_docs, 6) AS mean_when_present
FROM stats CROSS JOIN nd
""",
)
