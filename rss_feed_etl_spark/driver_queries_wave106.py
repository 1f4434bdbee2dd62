"""Driver-contract queries, wave 106: the per-source curation scorecard
— document count, within-source exact-dup count, Gopher keep rate, mean
quality, and token share, one row per source.

The oracle COMPOSES the existing gates' SQL verbatim
(``ORACLES["gopher_quality_flags"]``, ``ORACLES["text_quality_stats"]``)
so the scorecard can never disagree with the operators it summarizes —
the same reuse discipline as wave 99's keep-threshold query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .operators import textstats


def _q_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.source_scorecard(td.load_table(spark, sf_dir, "documents"))


_register(
    "source_scorecard",
    _q_scorecard,
    rf"""
WITH g AS (SELECT doc_id, keep FROM ({ORACLES["gopher_quality_flags"]})),
q AS (SELECT doc_id, quality FROM ({ORACLES["text_quality_stats"]})),
b AS (
  SELECT doc_id, source,
         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
             AS nt
  FROM documents),
j AS (SELECT b.source, b.fp, b.nt, g.keep, q.quality
      FROM b JOIN g USING (doc_id) JOIN q USING (doc_id)),
per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS dup_docs,
         round(CAST(sum(keep) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS keep_rate,
         round(CAST(sum(CAST(quality AS DECIMAL(20,10))) AS DOUBLE)
               / count(*), 6) AS mean_quality,
         CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM j GROUP BY 1),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM per_source)
SELECT source, n_docs, dup_docs, keep_rate, mean_quality, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / t, 6) AS token_share
FROM per_source, tot
""",
)
