"""Driver-contract queries, wave 113: training-mixture planning — a
DoReMi-style exponentiated-gradient reweighting step and a
data-constrained epoch budget planner.

Reference anchor: the reference pipeline has one implicit mixture knob
(which feeds land in config — src/rss_feed_etl/core/config.py); at
pretraining scale the mixture IS the product, and these two queries are
the planning steps a curation run executes before any shuffle starts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import sampling

# --- DoReMi exponentiated-gradient step over sources -----------------------------

_DM_ETA = 1.0
_DM_SMOOTH = 0.1


def _q_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.doremi_mixture_step(
        docs, eta=_DM_ETA, smoothing=_DM_SMOOTH
    )


_register(
    "doremi_mixture_step",
    _q_doremi,
    rf"""
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source,
           unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents) WHERE tok <> ''),
sc AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2),
ps AS (SELECT source, n_tokens,
              round(ln(n_tokens) - CAST(nlogn AS DOUBLE) / n_tokens, 6)
                AS entropy
       FROM (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
                    sum(CAST(round(n * ln(n), 9) AS DECIMAL(20,10))) AS nlogn
             FROM sc GROUP BY 1)),
ref AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS gt,
               round(CAST(sum(CAST(round(entropy * n_tokens, 4)
                                   AS DECIMAL(30,10))) AS DOUBLE)
                     / CAST(sum(n_tokens) AS BIGINT), 6) AS h_ref
        FROM ps),
s1 AS (SELECT source, n_tokens,
              round(CAST(n_tokens AS DOUBLE) / gt, 9) AS token_share,
              entropy, h_ref
       FROM ps, ref),
s2 AS (SELECT source, n_tokens, token_share, entropy,
              round(greatest(0.0, entropy - h_ref), 6) AS excess FROM s1),
s3 AS (SELECT *, round(token_share * exp({_DM_ETA} * excess), 9) AS u
       FROM s2),
t AS (SELECT CAST(sum(CAST(u AS DECIMAL(20,10))) AS DOUBLE) AS usum,
             CAST(count(*) AS DOUBLE) AS k
      FROM s3)
SELECT source, n_tokens, token_share, entropy, excess,
       round({1.0 - _DM_SMOOTH} * u / usum + {_DM_SMOOTH} / k, 6) AS weight
FROM s3, t
""",
)


# --- data-constrained epoch budget over langs -------------------------------------

_EB_MULT = 3.5
_EB_MAXEP = 4.0


def _q_epoch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.epoch_budget_plan(
        docs, budget_multiplier=_EB_MULT, source_col="lang",
        max_epochs=_EB_MAXEP,
    )


_register(
    "epoch_budget_plan",
    _q_epoch_budget,
    rf"""
WITH ps AS (
  SELECT lang AS source,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END)
              AS BIGINT) AS unique_tokens
  FROM documents GROUP BY 1),
sw AS (SELECT source, unique_tokens,
              round(sqrt(CAST(unique_tokens AS DOUBLE)), 9) AS sw FROM ps),
t AS (SELECT CAST(sum(CAST(sw AS DECIMAL(20,10))) AS DOUBLE) AS swtot,
             {_EB_MULT} * CAST(sum(unique_tokens) AS DOUBLE) AS b
      FROM sw),
base AS (SELECT source, unique_tokens, sw, b,
                round(sw / swtot, 9) AS weight,
                round(b * sw / swtot, 4) AS desired_tokens,
                round({_EB_MAXEP} * unique_tokens, 4) AS cap_tokens
         FROM sw, t),
b2 AS (SELECT *,
              CASE WHEN desired_tokens < cap_tokens
                   THEN desired_tokens ELSE cap_tokens END AS first_pass,
              desired_tokens < cap_tokens AS uncapped
       FROM base),
l AS (SELECT max(b)
             - CAST(sum(CAST(first_pass AS DECIMAL(30,10))) AS DOUBLE)
               AS leftover,
             CAST(sum(CAST(CASE WHEN uncapped THEN sw ELSE 0.0 END
                           AS DECIMAL(20,10))) AS DOUBLE) AS sw_uncapped
      FROM b2),
p AS (SELECT b2.*,
             CASE WHEN uncapped AND leftover > 0
                  THEN round(leftover * sw / sw_uncapped, 4)
                  ELSE 0.0 END AS extra
      FROM b2, l),
p2 AS (SELECT *,
              CASE WHEN first_pass + extra < cap_tokens
                   THEN round(first_pass + extra, 4)
                   ELSE cap_tokens END AS realized_tokens
       FROM p)
SELECT source, unique_tokens, weight, desired_tokens, realized_tokens,
       round(realized_tokens / CAST(unique_tokens AS DOUBLE), 4) AS epochs,
       realized_tokens >= cap_tokens AS capped
FROM p2
""",
)
