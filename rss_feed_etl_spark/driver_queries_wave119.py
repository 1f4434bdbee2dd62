"""Driver-contract queries, wave 119: per-eval-doc contamination degree
and the per-host crawl scorecard.

Reference anchor: the reference dedups on exact link keys
(src/rss_feed_etl/core/merge.py); these lift the same hygiene to the
shapes a crawl corpus needs — shingle-level leakage fractions for eval
suites, and host-grain dup/volume economics for blocklist decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _SHINGLES, _code
from .operators import sampling, textstats

# --- contamination overlap fraction ------------------------------------------------

_CT_EVAL_MOD = 10
_CT_THRESH = 0.2


def _q_contamination_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.contamination_overlap_fraction(
        docs, eval_mod=_CT_EVAL_MOD, dirty_threshold=_CT_THRESH
    )


_CT_W = "string_split_regex(trim(text), '\\s+')"

_register(
    "contamination_overlap_fraction",
    _q_contamination_frac,
    f"""
WITH t AS (SELECT doc_id, {_CT_W} AS w FROM documents),
sh AS (SELECT doc_id,
              list_transform({_SHINGLES.format(w="w")}, x -> {_code("x")}) AS s
       FROM t),
e AS (SELECT doc_id, unnest(s) AS code FROM sh
      WHERE doc_id % {_CT_EVAL_MOD} = 0),
tr AS (SELECT DISTINCT unnest(s) AS code FROM sh
       WHERE doc_id % {_CT_EVAL_MOD} <> 0),
h AS (SELECT e.doc_id,
             count(*) AS n_shingles,
             sum(CASE WHEN tr.code IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      FROM e LEFT JOIN tr USING (code) GROUP BY 1),
ids AS (SELECT doc_id FROM documents WHERE doc_id % {_CT_EVAL_MOD} = 0)
SELECT ids.doc_id,
       CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       coalesce(round(CAST(n_hit AS DOUBLE) / n_shingles, 6), 0.0)
         AS dirty_frac,
       coalesce(CAST(n_hit AS DOUBLE) / n_shingles
                  >= CAST({_CT_THRESH} AS DOUBLE), FALSE) AS is_dirty
FROM ids LEFT JOIN h USING (doc_id)
""",
)


# --- per-host crawl scorecard -------------------------------------------------------
# Synthetic URLs planted inside the query (the wave-16/111 pattern): host
# 0 takes every even doc (a mega-host), odd docs spread over 11 hosts;
# every 5th doc is an identical boilerplate body so per-host dup rates
# differ.

_HOST_URL_SPARK = None  # built inline below

_HOST_BOILER = "boilerplate landing page body"


def _q_host_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    hid = F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(
        F.col("doc_id") % 12
    )
    staged = docs.select(
        F.concat(
            F.lit("https://www.host"),
            hid.cast("string"),
            F.lit(".example.com/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(_HOST_BOILER))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return textstats.host_crawl_scorecard(staged)


_register(
    "host_crawl_scorecard",
    _q_host_scorecard,
    rf"""
WITH raw AS (
  SELECT 'https://www.host'
         || CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE doc_id % 12 END
                 AS VARCHAR)
         || '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 5 = 0 THEN '{_HOST_BOILER}' ELSE text END AS t
  FROM documents),
m AS (SELECT lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)', 1)) AS host,
             md5(t) AS h,
             CAST(CASE WHEN trim(t) = '' THEN 0
                  ELSE len(string_split_regex(trim(t), '\s+')) END AS BIGINT)
               AS nt
      FROM raw),
tot AS (SELECT count(*) AS n_total FROM m)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
       round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6)
         AS dup_rate,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       round(CAST(count(*) AS DOUBLE) / max(n_total), 6) AS corpus_share
FROM m, tot GROUP BY 1
""",
)
