"""Driver-contract queries, wave 95: code-switch detection, per-source
perplexity outliers, and context-window padding accounting — the
language-purity and sequence-budget gates of a monolingual training
mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _BEST, _SCORES, _PRED
from .operators import packing, textstats

# --- code-switch ratio -------------------------------------------------------


def _q_code_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.code_switch_ratio(td.load_table(spark, sf_dir, "documents"))


_TOTAL = " + ".join(f"score_{lang}" for lang in textstats.LANG_PROFILES)

_register(
    "code_switch_ratio",
    _q_code_switch,
    f"""
WITH t AS (
  SELECT doc_id, list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)) AS toks
  FROM documents),
s AS (SELECT doc_id, {_SCORES} FROM t),
m AS (SELECT doc_id, {_PRED} AS primary_lang, {_BEST} AS best,
             {_TOTAL} AS total
      FROM s)
SELECT doc_id, primary_lang,
       CAST(best AS BIGINT) AS primary_hits,
       CAST(total - best AS BIGINT) AS other_hits,
       CASE WHEN total > 0
            THEN round((total - best) / CAST(total AS DOUBLE), 4)
            ELSE 0.0 END AS switch_ratio
FROM m
""",
)


# --- per-source perplexity z-scores ------------------------------------------

_Z_FLAG = 2.0


def _q_lp_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.logppl_zscore_by_source(
        td.load_table(spark, sf_dir, "documents"), z_flag=_Z_FLAG
    )


_register(
    "logppl_zscore_by_source",
    _q_lp_z,
    f"""
WITH lp AS (SELECT * FROM ({ORACLES["unigram_logppl"]})),
j AS (
  SELECT lp.doc_id, d.source, lp.logppl,
         CAST(round(lp.logppl * 1e6) AS BIGINT) AS code
  FROM lp JOIN documents d USING (doc_id)),
st AS (
  SELECT source, count(*) AS n, sum(code) AS s1, sum(code * code) AS s2q
  FROM j GROUP BY 1),
m AS (
  SELECT source,
         CAST(s1 AS DOUBLE) / n AS mean,
         CAST(s2q AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS var
  FROM st),
z AS (
  SELECT j.doc_id, j.source, j.logppl,
         CASE WHEN m.var > 0
              THEN round((j.code - m.mean) / sqrt(m.var), 4)
              ELSE 0.0 END AS z
  FROM j JOIN m USING (source))
SELECT doc_id, source, logppl, z,
       CAST(abs(z) >= {_Z_FLAG} AS INT) AS flag_outlier
FROM z
""",
)


# --- context-window padding accounting ---------------------------------------

_SEQ = 512


def _q_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.context_overflow_stats(
        td.load_table(spark, sf_dir, "documents"), seq_len=_SEQ
    )


_register(
    "context_overflow_stats",
    _q_overflow,
    rf"""
WITH t AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
  FROM documents),
s AS (SELECT source, n, CAST(ceil(n / {_SEQ}.0) AS BIGINT) AS chunks FROM t)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(chunks) AS BIGINT) AS n_chunks,
       CAST(sum(chunks) * {_SEQ} - sum(n) AS BIGINT) AS pad_tokens,
       CASE WHEN sum(chunks) > 0
            THEN round((sum(chunks) * {_SEQ} - sum(n))
                       / (sum(chunks) * {_SEQ}.0), 6)
            ELSE 0.0 END AS pad_ratio
FROM s GROUP BY 1
""",
)
