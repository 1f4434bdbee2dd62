"""Driver-contract queries, wave 37: winsorized robust means, distinct-n
lexical diversity, and the foreign-key join-profile report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _W
from .operators import joins, sketches, textstats

# --- winsorized means -------------------------------------------------------

_WZ_LO, _WZ_HI = 0.05, 0.95


def _q_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.winsorized_means(
        td.load_table(spark, sf_dir, "events"), lo=_WZ_LO, hi=_WZ_HI
    )


_register(
    "winsorized_means",
    _q_winsorized,
    f"""
WITH q AS (
  SELECT event_type AS g,
         round(quantile_cont(value, {_WZ_LO}), 9) AS p_lo,
         round(quantile_cont(value, {_WZ_HI}), 9) AS p_hi
  FROM events GROUP BY 1)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 6) AS raw_mean,
       round(avg(least(greatest(value, p_lo), p_hi)), 6) AS winsorized_mean,
       max(p_lo) AS p_lo, max(p_hi) AS p_hi
FROM events JOIN q ON event_type = g
GROUP BY 1
""",
)


# --- distinct-n diversity ---------------------------------------------------


def _q_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.ngram_diversity(td.load_table(spark, sf_dir, "documents"))


_register(
    "ngram_diversity",
    _q_diversity,
    f"""
WITH t AS (SELECT source AS g, {_W} AS w FROM documents),
uni AS (SELECT g, unnest(w) AS gram FROM t),
bi AS (SELECT g, unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i + 1])) AS gram FROM t),
u1 AS (SELECT g, gram, count(*) AS c FROM uni GROUP BY 1, 2),
u AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS d_tokens FROM u1 GROUP BY 1),
b1 AS (SELECT g, gram, count(*) AS c FROM bi GROUP BY 1, 2),
b AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(count(*) AS BIGINT) AS d_bigrams FROM b1 GROUP BY 1)
SELECT g AS source, n_tokens, round(d_tokens / n_tokens, 6) AS distinct_1,
       n_bigrams, round(d_bigrams / n_bigrams, 6) AS distinct_2
FROM u JOIN b USING (g)
""",
)


# --- FK profile -------------------------------------------------------------


def _q_fk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.fk_profile(
        td.load_table(spark, sf_dir, "lineitem"),
        td.load_table(spark, sf_dir, "orders"),
        fk="l_orderkey",
        pk="o_orderkey",
    )


_register(
    "fk_profile_lineitem_orders",
    _q_fk_profile,
    """
WITH per_key AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
keys AS (SELECT DISTINCT o_orderkey AS k, 1 AS in_dim FROM orders),
j AS (SELECT per_key.*, keys.in_dim FROM per_key LEFT JOIN keys USING (k)),
s AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_fact,
         CAST(count(*) AS BIGINT) AS n_distinct_fk,
         CAST(sum(CASE WHEN in_dim IS NULL THEN c ELSE 0 END) AS BIGINT)
           AS n_orphan_facts,
         CAST(max(c) AS BIGINT) AS max_fanout,
         round(avg(c), 6) AS avg_fanout
  FROM j),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_dim FROM orders)
SELECT n_fact, n_dim, n_distinct_fk, n_orphan_facts, max_fanout, avg_fanout
FROM s, nd
""",
)
