"""Driver-contract queries, wave 7: corpus curation — deterministic
train/val/test splitting, per-group quota sampling (data mixing), and PII
redaction.

Splitting and sampling are content-addressed (md5 of salt:key), the only
assignment scheme that keeps documents from migrating across the
train/test boundary when the corpus grows or repartitions — and exactly
replayable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .functions.text import PII_EMAIL, PII_PHONE, PII_SSN, redact_pii
from .operators import sampling

# --- deterministic train/val/test split -----------------------------------

_SPLIT_SALT = "split-v1"
_WEIGHTS = {"train": 80, "val": 10, "test": 10}


def _q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.deterministic_split(
        docs, key_col="doc_id", weights=_WEIGHTS, salt=_SPLIT_SALT
    )


_SPLIT_BUCKET = (
    _hexfold(f"('{_SPLIT_SALT}:' || CAST(doc_id AS VARCHAR))") + " % 100"
)
_register(
    "train_val_test_split",
    _q_split,
    f"""
SELECT doc_id, lang,
       CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
            WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)


# --- per-language quota sampling (data mixing) ----------------------------

_QUOTA = 30
_QUOTA_SALT = "quota-v1"


def _q_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.quota_per_group(
        docs, group_col="lang", quota=_QUOTA, key_col="doc_id", salt=_QUOTA_SALT
    )


_QUOTA_RANK = (
    _hexfold(f"('{_QUOTA_SALT}:' || CAST(doc_id AS VARCHAR))") + " % 1000000007"
)
_register(
    "lang_quota_sample",
    _q_quota,
    f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_QUOTA_RANK} ASC, doc_id ASC) AS rk
  FROM documents) WHERE rk <= {_QUOTA}
""",
)


# --- PII redaction ---------------------------------------------------------


def _q_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically plant an email, a phone number, and an SSN in each
    document, then scrub them — the testdata corpus itself is PII-free, so
    the query demonstrates redaction end-to-end while staying exactly
    reproducible on both engines."""
    docs = td.load_table(spark, sf_dir, "documents")
    tail = F.concat(
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call (312) 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" SSN 123-45-6789."),
    )
    raw = F.concat(F.col("text"), tail)
    return docs.select("doc_id", redact_pii(raw).alias("text_redacted"))


_RAW_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or call (312) 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' SSN 123-45-6789.'"
)
_register(
    "pii_redact",
    _q_pii,
    f"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace({_RAW_SQL}, '{PII_SSN}', '[SSN]', 'g'),
           '{PII_PHONE}', '[PHONE]', 'g'),
         '{PII_EMAIL}', '[EMAIL]', 'g') AS text_redacted
FROM documents
""",
)


# --- mixture sampling by source --------------------------------------------

_MIX_SALT = "mix-v1"
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_MIX_DEFAULT = 0.05
_MIX_PREC = 1_000_000


def _q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.mixture_sample(
        docs, group_col="source", rates=_MIX_RATES, key_col="doc_id",
        salt=_MIX_SALT, default_rate=_MIX_DEFAULT, precision=_MIX_PREC,
    )


_MIX_BUCKET = _hexfold(f"('{_MIX_SALT}:' || CAST(doc_id AS VARCHAR))") + f" % {_MIX_PREC}"
_MIX_CASE = "CASE " + " ".join(
    f"WHEN source = '{g}' THEN {int(r * _MIX_PREC)}" for g, r in _MIX_RATES.items()
) + f" ELSE {int(_MIX_DEFAULT * _MIX_PREC)} END"
_register(
    "source_mixture_sample",
    _q_mixture,
    f"""
SELECT doc_id, source FROM documents
WHERE {_MIX_BUCKET} < {_MIX_CASE}
""",
)
