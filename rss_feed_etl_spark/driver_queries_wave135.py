"""Driver-contract queries, wave 135: source-token mutual information
and the pairwise source Jensen-Shannon divergence matrix.

Reference anchor: the reference treats every feed as interchangeable
input to one pipeline (src/etl/rss_feed_etl.py); MI prices how far that
assumption is from true at the corpus level, and the JSD matrix says
WHICH source pairs are stylistic clones — the distributional companion
of wave 118's cross-source duplicate matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import textstats

_TRI = (
    r"list_transform(range(1, len(w) - 1), "
    r"i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"
)
# Round 11 (guide §2.3, lockstep with the Spark operators): the trigram
# key is the 60-bit md5 code (Spark's functions.hashing.md5_bucket ==
# DuckDB's _hexfold) — narrower count/join/window keys on both engines,
# identical collisions, hash-exact parity.
_TOKS = (
    r"SELECT source AS g, "
    rf"unnest(list_transform({_TRI}, t -> {_hexfold('t')})) AS tok "
    r"FROM (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS w "
    r"FROM documents)"
)


def _q_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.source_token_mutual_info(docs)


_register(
    "source_token_mutual_info",
    _q_mi,
    f"""
WITH toks AS ({_TOKS}),
counts AS (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2),
ng AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM counts GROUP BY 1),
nt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS n_t FROM counts GROUP BY 1),
alln AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_all,
                CAST(count(*) AS BIGINT) AS n_sources FROM ng),
terms AS (SELECT round((CAST(c AS DOUBLE) / n_all)
                       * ln((CAST(c AS DOUBLE) * n_all)
                            / (CAST(n_g AS DOUBLE) * n_t)), 9) AS term
          FROM counts JOIN ng USING (g) JOIN nt USING (tok)
          CROSS JOIN alln),
mi AS (SELECT round(CAST(sum(CAST(term AS DECIMAL(30,10))) AS DOUBLE), 6)
         AS mi_nats FROM terms),
ntypes AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM nt),
h AS (SELECT round(CAST(sum(CAST(round(
            -(CAST(n_g AS DOUBLE) / n_all)
            * ln(CAST(n_g AS DOUBLE) / n_all), 9)
          AS DECIMAL(30,10))) AS DOUBLE), 6) AS h_source_nats
      FROM ng CROSS JOIN alln)
SELECT n_all AS n_tokens, n_sources, n_types, mi_nats, h_source_nats,
       CASE WHEN h_source_nats > 0
            THEN round(mi_nats / h_source_nats, 6) END AS nmi
FROM alln CROSS JOIN mi CROSS JOIN ntypes CROSS JOIN h
""",
)


def _q_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.source_js_divergence_matrix(docs)


_register(
    "source_js_divergence_matrix",
    _q_jsd,
    f"""
WITH toks AS ({_TOKS}),
counts AS (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2),
totals AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
cj AS (SELECT a.g AS ga, b.g AS gb, a.c AS ca, b.c AS cb,
              ta.n AS na, tb.n AS nb
       FROM counts a JOIN counts b ON a.tok = b.tok AND a.g < b.g
       JOIN totals ta ON ta.g = a.g
       JOIN totals tb ON tb.g = b.g),
ps AS (SELECT ga, gb, ca, cb,
              CAST(ca AS DOUBLE) / na AS p1,
              CAST(cb AS DOUBLE) / nb AS p2
       FROM cj),
bt AS (SELECT ga, gb, ca, cb,
              round((p1 / 2.0) * ln((2.0 * p1) / (p1 + p2))
                    + (p2 / 2.0) * ln((2.0 * p2) / (p1 + p2)), 9) AS t
       FROM ps),
pair_agg AS (SELECT ga, gb,
                    CAST(sum(CAST(t AS DECIMAL(30,10))) AS DOUBLE) AS sb,
                    CAST(sum(ca) AS BIGINT) AS s1,
                    CAST(sum(cb) AS BIGINT) AS s2,
                    CAST(count(*) AS BIGINT) AS n_common_types
             FROM bt GROUP BY 1, 2),
grid AS (SELECT ta.g AS ga, ta.n AS na, tb.g AS gb, tb.n AS nb
         FROM totals ta CROSS JOIN totals tb WHERE ta.g < tb.g)
SELECT ga AS source_a, gb AS source_b,
       CAST(coalesce(n_common_types, 0) AS BIGINT) AS n_common_types,
       round(coalesce(sb, 0.0)
             + round((ln(2.0) / 2.0)
                     * (2.0 - CAST(coalesce(s1, 0) AS DOUBLE) / na
                            - CAST(coalesce(s2, 0) AS DOUBLE) / nb), 9), 6)
         AS jsd_nats
FROM grid LEFT JOIN pair_agg USING (ga, gb)
""",
)
