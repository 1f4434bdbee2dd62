"""Driver-contract queries, wave 94: sequence-training pair mining, IPF
mixture raking, and the tokenizer vocab coverage curve — the "turn a raw
corpus into a training run" trio: mine supervised examples from logs,
solve the source×lang mixture, size the vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import eventanalytics, sampling, textstats

# --- next-item training pairs ----------------------------------------------

_NITP_BUCKETS = 1024
_NITP_SALT = "nitp-v1"


def _q_nitp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return eventanalytics.next_item_training_pairs(
        td.load_table(spark, sf_dir, "events"),
        n_neg_buckets=_NITP_BUCKETS,
        salt=_NITP_SALT,
    )


_NITP_HK = _hexfold(
    f"('{_NITP_SALT}:' || CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR))"
)

_register(
    "next_item_training_pairs",
    _q_nitp,
    f"""
WITH b AS (
  SELECT user_id, CAST(json_extract(props, '$.k') AS INT) AS context_item,
         ts, event_id
  FROM events
  WHERE event_type = 'view' AND json_extract(props, '$.k') IS NOT NULL),
p AS (
  SELECT user_id, context_item,
         lead(context_item) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC) AS next_item,
         event_id
  FROM b)
SELECT user_id, context_item, next_item,
       CAST({_NITP_HK} % {_NITP_BUCKETS} AS BIGINT) AS neg_bucket
FROM p
WHERE next_item IS NOT NULL AND next_item <> context_item
""",
)


# --- IPF (raking) mixture weights -------------------------------------------

_IPF_ITERS = 3


def _q_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.ipf_source_lang_weights(
        td.load_table(spark, sf_dir, "documents"), iters=_IPF_ITERS
    )


def _ipf_steps() -> str:
    """Unrolled IPF half-steps: row (source) scaling then column (lang)
    scaling per iteration, weights rounded 6dp each half-step and
    marginals summed as exact decimals — bit-identical to the Spark
    trajectory."""
    prev = "g0"
    out = []
    for i in range(1, _IPF_ITERS + 1):
        out.append(
            f"""r{i} AS (SELECT source AS s2,
           CAST(sum(CAST(w AS DECIMAL(30,10))) AS DOUBLE) AS sw
      FROM {prev} GROUP BY 1),
gr{i} AS (SELECT g.source, g.lang, g.n_docs, g.total, g.ns, g.nl,
            round(g.w * (g.total / g.ns) / r.sw, 6) AS w
      FROM {prev} g JOIN r{i} r ON g.source = r.s2),
c{i} AS (SELECT lang AS l2,
           CAST(sum(CAST(w AS DECIMAL(30,10))) AS DOUBLE) AS lw
      FROM gr{i} GROUP BY 1),
g{i} AS (SELECT g.source, g.lang, g.n_docs, g.total, g.ns, g.nl,
           round(g.w * (g.total / g.nl) / c.lw, 6) AS w
      FROM gr{i} g JOIN c{i} c ON g.lang = c.l2)"""
        )
        prev = f"g{i}"
    return ",\n".join(out)


_register(
    "ipf_source_lang_weights",
    _q_ipf,
    f"""
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
         CAST(count(DISTINCT source) AS DOUBLE) AS ns,
         CAST(count(DISTINCT lang) AS DOUBLE) AS nl
  FROM cells),
g0 AS (
  SELECT source, lang, n_docs, total, ns, nl, CAST(n_docs AS DOUBLE) AS w
  FROM cells, tot),
{_ipf_steps()}
SELECT source, lang, n_docs,
       w AS cell_weight,
       round(w / CAST(n_docs AS DOUBLE), 6) AS doc_weight
FROM g{_IPF_ITERS}
""",
)


# --- vocab coverage curve ----------------------------------------------------

_VCC_VS = (100, 1000, 10000)


def _q_vcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.vocab_coverage_curve(
        td.load_table(spark, sf_dir, "documents"), vs=_VCC_VS
    )


_VCC_ROWS = "\nUNION ALL\n".join(
    f"""SELECT CAST({v} AS BIGINT) AS v,
       CAST(max(cum) AS BIGINT) AS covered_occurrences,
       round(max(cum) / (SELECT total FROM tot), 6) AS coverage
FROM cum WHERE rn <= {v}"""
    for v in _VCC_VS
)

_register(
    "vocab_coverage_curve",
    _q_vcc,
    rf"""
WITH t AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents),
c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
top AS (SELECT n, tok FROM c ORDER BY n DESC, tok ASC LIMIT {max(_VCC_VS)}),
cum AS (
  SELECT row_number() OVER (ORDER BY n DESC, tok ASC) AS rn,
         sum(n) OVER (ORDER BY n DESC, tok ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM top)
{_VCC_ROWS}
""",
)
