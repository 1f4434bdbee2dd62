"""Wave-62 driver queries: CCNet perplexity tiers (Wenzek et al. 2020) —
the per-language head/middle/tail quality bucketing that decides mixing
rates before LLM pretraining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import textstats


def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.ccnet_ppl_buckets(td.load_table(spark, sf_dir, "documents"))


_register(
    "ccnet_ppl_buckets",
    _q_ccnet_buckets,
    r"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tot AS (SELECT sum(n) AS total, count(*) AS vocab FROM counts),
scored AS (
  SELECT id, round(-ln((n + 1.0) / (total + vocab)), 9) AS nll
  FROM toks JOIN counts USING (tok), tot),
ppl AS (
  SELECT id AS doc_id, round(avg(nll), 6) AS logppl
  FROM scored GROUP BY id),
ranked AS (
  SELECT p.doc_id, d.lang, p.logppl,
         percent_rank() OVER (PARTITION BY d.lang
                              ORDER BY p.logppl ASC, p.doc_id ASC) AS pr
  FROM ppl p JOIN documents d ON p.doc_id = d.doc_id)
SELECT doc_id, lang, logppl,
       CASE WHEN pr < 1.0/3 THEN 'head'
            WHEN pr < 2.0/3 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
""",
)
