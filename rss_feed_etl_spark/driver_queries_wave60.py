"""Wave-60 driver queries: exact-substring benchmark contamination and
DSIR importance weights (Xie et al. 2023) — the strict-match complement of
shingle decontamination, and the standard cheap domain-relevance scorer
for mixing a web crawl toward a curated target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _AUG_SQL, _aug_docs, _hexfold
from .driver_queries_wave9 import _DECON_BUCKET, _DECON_SALT
from .operators import sampling

_NEEDLE_LEN = 64


def _q_exact_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On the augmented corpus (each doc + its 80%-prefix copy): copies
    land in independent splits, so literal cross-split prefix copies exist
    and recall is verifiable."""
    aug = _aug_docs(spark, sf_dir)
    split = sampling.deterministic_split(aug, key_col="id", salt=_DECON_SALT)
    return sampling.exact_substring_contamination(split, needle_len=_NEEDLE_LEN)


_register(
    "exact_contamination",
    _q_exact_contamination,
    f"""
WITH {_AUG_SQL},
lab AS (
  SELECT id, text,
         CASE WHEN {_DECON_BUCKET} < 80 THEN 'train'
              WHEN {_DECON_BUCKET} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM aug),
nd AS (
  SELECT id AS holdout_id, substr(text, 1, {_NEEDLE_LEN}) AS needle
  FROM lab WHERE split = 'test' AND length(text) >= {_NEEDLE_LEN})
SELECT t.id AS train_id, nd.holdout_id
FROM lab t, nd
WHERE t.split = 'train' AND contains(t.text, nd.needle)
""",
)


_DSIR_B = 1024


def _q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.dsir_importance_weights(
        docs, target=F.col("lang") == "en", n_buckets=_DSIR_B
    )


_DSIR_BUCKET = f"({_hexfold('gram')}) % {_DSIR_B}"
_register(
    "dsir_importance_weights",
    _q_dsir,
    rf"""
WITH t AS (
  SELECT doc_id, lang = 'en' AS tgt,
         string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents),
g AS (
  SELECT doc_id, tgt,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
  FROM t WHERE len(w) >= 2),
b AS (SELECT doc_id, tgt, {_DSIR_BUCKET} AS bkt FROM g),
counts AS (
  SELECT bkt, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct, count(*) AS cr
  FROM b GROUP BY 1),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS rr FROM counts),
model AS (
  SELECT bkt,
         round(ln((ct + 1.0) / (tt + {_DSIR_B}.0))
               - ln((cr + 1.0) / (rr + {_DSIR_B}.0)), 8) AS lr
  FROM counts, tot)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_features,
       round(CAST(sum(CAST(lr AS DECIMAL(20,10))) AS DOUBLE), 4) AS log_weight
FROM b JOIN model USING (bkt)
GROUP BY 1
""",
)
