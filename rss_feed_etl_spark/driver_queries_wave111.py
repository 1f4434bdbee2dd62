"""Driver-contract queries, wave 111: per-source PII exposure and
per-source quality-selection cutoffs.

Reference anchor: the reference filters on keywords and null keys
(src/rss_feed_etl/core/data_filter.py); these extend that gate family
to the safety (PII density) and mixture-aware selection (per-source
top-p thresholds) checks a production curation run adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .functions.text import PII_EMAIL, PII_PHONE, PII_SSN
from .operators import sampling, textstats

# --- per-source PII density ----------------------------------------------------
# The synthetic corpus is PII-free, so the query PLANTS deterministic
# hits with per-source-varying density (every 3rd doc an email, every
# 5th a phone, every 7th an SSN) — the same plant-inside-the-query
# pattern pii_redact uses.


def _q_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" reach me at u"), did.cast("string"),
                F.lit("@mail.example.org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call (415) 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit(" ssn 987-65-4321.")).otherwise(F.lit("")),
    )
    staged = docs.select("doc_id", "source", planted.alias("text"))
    return textstats.pii_density(staged)


_PII_RAW = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' reach me at u' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.org' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call (415) 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' ssn 987-65-4321.' ELSE '' END"
)

_register(
    "pii_density_by_source",
    _q_pii_density,
    rf"""
WITH raw AS (SELECT doc_id, source, {_PII_RAW} AS t FROM documents),
m AS (
  SELECT source,
         CAST(CASE WHEN trim(t) = '' THEN 0
              ELSE len(string_split_regex(trim(t), '\s+')) END AS BIGINT) AS nt,
         CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS e,
         CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS p,
         CAST(len(regexp_extract_all(t, '{PII_SSN}')) AS BIGINT) AS s
  FROM raw)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(e) AS BIGINT) AS n_emails,
       CAST(sum(p) AS BIGINT) AS n_phones,
       CAST(sum(s) AS BIGINT) AS n_ssns,
       CASE WHEN sum(nt) > 0
            THEN round(1000.0 * CAST(sum(e) + sum(p) + sum(s) AS DOUBLE)
                       / CAST(sum(nt) AS DOUBLE), 6)
            END AS pii_per_1k_tokens
FROM m GROUP BY 1
""",
)


# --- per-source quality-selection cutoffs ---------------------------------------

_QC_PM = (500, 700, 900)


def _q_quality_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    scores = textstats.text_stats(docs).select("doc_id", "quality").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return sampling.quality_select_cutoffs(scores, keep_permille=_QC_PM)


_QC_LIST = ", ".join(str(p) for p in sorted(_QC_PM))

_register(
    "quality_select_cutoffs",
    _q_quality_cutoffs,
    f"""
WITH q AS (SELECT doc_id, quality FROM ({ORACLES["text_quality_stats"]})),
s AS (SELECT d.source, q.doc_id, q.quality
      FROM q JOIN documents d USING (doc_id)),
r AS (SELECT source, doc_id, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id ASC) AS rn
      FROM s),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM s GROUP BY 1),
f AS (SELECT unnest([{_QC_LIST}]) AS keep_permille),
k AS (SELECT source, keep_permille, n_docs,
             CAST(floor((n_docs * keep_permille + 999) / 1000) AS BIGINT) AS kk
      FROM c CROSS JOIN f)
SELECT k.source, k.keep_permille, k.n_docs, round(r.quality, 6) AS cutoff
FROM k JOIN r ON r.source = k.source AND r.rn = k.kk
""",
)
