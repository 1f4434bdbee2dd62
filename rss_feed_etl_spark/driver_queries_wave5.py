"""Driver-contract queries, wave 5: the corpus DECISION layer — composed
quality keep/drop gates and the near-dup drop list.

Waves 2-4 compute signals (stats, language, signatures, pair similarity);
these two queries are what a training-data pipeline actually acts on:
which documents pass the quality bar, and which near-duplicates to drop
in favor of a canonical survivor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _NTOK, _PRED, _SCORES, _STOPLIST, _aug_docs
from .operators import dedup, textstats

# --- composed quality filter ---------------------------------------------

_MIN_TOKENS = 20
_MAX_PUNCT = 0.08
_MIN_STOP = 0.05


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_filter(
        td.load_table(spark, sf_dir, "documents"),
        min_tokens=_MIN_TOKENS,
        max_punct_ratio=_MAX_PUNCT,
        min_stopword_ratio=_MIN_STOP,
        allowed_lang="en",
    )


_register(
    "corpus_quality_filter",
    _q_quality_filter,
    f"""
WITH t AS (
  SELECT doc_id, text,
         list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)) AS toks
  FROM documents),
s AS (SELECT doc_id, text, {_SCORES} FROM t),
st AS (
  SELECT doc_id,
         {_NTOK} AS n_tokens,
         {_PRED} AS pred_lang,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(text, '[.!,?;:]', '', 'g')))
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN {_NTOK} > 0
              THEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   t -> lower(t) IN ({_STOPLIST})))
                   / CAST({_NTOK} AS DOUBLE)
              ELSE 0.0 END AS stop_ratio
  FROM s),
r AS (
  SELECT doc_id, n_tokens, pred_lang,
         concat_ws(';',
           CASE WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short' END,
           CASE WHEN punct_ratio > {_MAX_PUNCT} THEN 'too_much_punct' END,
           CASE WHEN stop_ratio < {_MIN_STOP} THEN 'low_stopword' END,
           CASE WHEN pred_lang <> 'en' THEN 'bad_lang' END) AS reasons
  FROM st)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, pred_lang, reasons,
       reasons = '' AS keep
FROM r
""",
)


# --- near-dup drop list ---------------------------------------------------


def _q_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.minhash_lsh_pairs(
        _aug_docs(spark, sf_dir), id_col="id", text_col="text", n=3, threshold=0.25
    )
    return dedup.neardup_drop_list(pairs)


# the pair set is exactly the minhash_lsh_neardup oracle; the drop list is
# a one-hop min-canonical aggregation over it
_register(
    "neardup_drop_list",
    _q_drop_list,
    f"""
WITH pairs AS ({ORACLES["minhash_lsh_neardup"]})
SELECT id_b AS id, min(id_a) AS canonical_id
FROM pairs GROUP BY id_b
""",
)
