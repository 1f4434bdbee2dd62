"""Driver-contract queries, wave 145: Bloom-filter sizing planner and
the truncation token-loss curve.

Reference anchor: the reference re-reads its whole sheet to answer "have
I seen this link?" (scd1_manager.py) — the bloom planner is the
membership-index sizing table that replaces that scan at scale (and
complements the registered ``bloom_prune_revenue`` join pruning and the
``lsh_param_plan``/``postinglist_compression_plan`` planner family);
the truncation curve is the other half of the max-sequence-length
decision ``packing_fragmentation`` already prices (truncation loses
tails, padding wastes slots — the curves bracket the choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import packing, sketches

_BF_BITS = (4, 6, 8, 10, 12, 16)
_LN2 = 0.6931471805599453

_TL_CUTS = (64, 128, 256, 512)


def _q_bloom_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return sketches.bloom_filter_plan(ev, key_col="user_id", bits_per_key=_BF_BITS)


_register(
    "bloom_filter_plan",
    _q_bloom_plan,
    f"""
WITH n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
           FROM events),
cand AS (SELECT * FROM (VALUES {", ".join(f"({b})" for b in _BF_BITS)})
         t(bits_per_key)),
staged AS (
  SELECT n_keys, bits_per_key,
         CAST(floor(bits_per_key * {_LN2} + 0.5) AS BIGINT) AS k_hashes,
         CAST(n_keys * bits_per_key AS BIGINT) AS m_bits
  FROM n CROSS JOIN cand)
SELECT n_keys, bits_per_key, k_hashes, m_bits,
       CAST(ceil(CAST(m_bits AS DOUBLE) / 8.0) AS BIGINT) AS filter_bytes,
       round(exp(CAST(k_hashes AS DOUBLE)
                 * ln(round(1.0 - exp(-CAST(k_hashes AS DOUBLE)
                                      / CAST(bits_per_key AS DOUBLE)), 9))),
             6) AS fpr
FROM staged
""",
)


def _q_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return packing.truncation_loss_curve(docs, cutoffs=_TL_CUTS)


_TL_LEN = (
    "CASE WHEN trim(text) = '' THEN 0 "
    r"ELSE len(string_split_regex(trim(text), '\s+')) END"
)

_register(
    "truncation_loss_curve",
    _q_truncation,
    f"""
WITH lens AS (SELECT {_TL_LEN} AS len, CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY 1),
cand AS (SELECT * FROM (VALUES {", ".join(f"({c})" for c in _TL_CUTS)})
         t(cutoff)),
g AS (SELECT cutoff, len, c,
             CASE WHEN len > cutoff THEN len - cutoff ELSE 0 END AS lost
      FROM cand CROSS JOIN lens),
a AS (SELECT cutoff,
             CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN len > cutoff THEN c ELSE 0 END) AS BIGINT)
               AS n_truncated,
             CAST(sum(len * c) AS BIGINT) AS tokens_total,
             CAST(sum(lost * c) AS BIGINT) AS tokens_lost
      FROM g GROUP BY 1)
SELECT cutoff, n_docs, n_truncated,
       round(CAST(n_truncated AS DOUBLE) / n_docs, 6) AS frac_docs_truncated,
       tokens_total, tokens_lost,
       round(CAST(tokens_lost AS DOUBLE) / tokens_total, 6)
         AS frac_tokens_lost
FROM a
""",
)
