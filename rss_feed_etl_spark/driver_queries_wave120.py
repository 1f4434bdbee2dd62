"""Driver-contract queries, wave 120: NPMI topic coherence per source
and vocabulary-pruning impact.

Reference anchor: the reference extracts per-document keywords
(src/utils/ats_matcher.py skills lexicon); coherence scores whether a
source's dominant terms form one topic at all, and the prune-impact
table prices the tokenizer-vocab budget every downstream token count in
this registry depends on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import textstats

# --- NPMI topic coherence ----------------------------------------------------------

_NC_TOP = 10


def _q_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.npmi_topic_coherence(docs, top_terms=_NC_TOP)


_register(
    "npmi_topic_coherence",
    _q_coherence,
    rf"""
WITH pres AS (
  SELECT source, id, tok FROM (
    SELECT source, doc_id AS id,
           unnest(list_distinct(
               string_split_regex(trim(lower(text)), '\s+'))) AS tok
    FROM documents) WHERE tok <> ''),
tf AS (SELECT source, tok, count(*) AS dfreq FROM pres GROUP BY 1, 2),
top AS (SELECT source, tok, dfreq FROM (
          SELECT *, row_number() OVER (PARTITION BY source
                     ORDER BY dfreq DESC, tok ASC) AS rk
          FROM tf) WHERE rk <= {_NC_TOP}),
nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
tp AS (SELECT p.source, p.id, p.tok FROM pres p JOIN top USING (source, tok)),
pairs AS (SELECT a.source, a.tok AS ta, b.tok AS tb, count(*) AS co
          FROM tp a JOIN tp b
            ON a.source = b.source AND a.id = b.id AND a.tok < b.tok
          GROUP BY 1, 2, 3),
allp AS (SELECT x.source, x.tok AS ta, y.tok AS tb,
                x.dfreq AS fa, y.dfreq AS fb
         FROM top x JOIN top y ON x.source = y.source AND x.tok < y.tok),
scored AS (
  SELECT allp.source, nd.n_docs,
         CASE WHEN coalesce(co, 0) = 0 THEN CAST(-1.0 AS DOUBLE)
              WHEN co = nd.n_docs THEN CAST(1.0 AS DOUBLE)
              ELSE round(ln(CAST(co AS DOUBLE) * nd.n_docs
                            / CAST(fa * fb AS DOUBLE))
                         / -ln(CAST(co AS DOUBLE) / nd.n_docs), 9)
         END AS npmi
  FROM allp
  LEFT JOIN pairs USING (source, ta, tb)
  JOIN nd ON allp.source = nd.source)
SELECT source,
       CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(CAST(npmi AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6)
         AS coherence
FROM scored GROUP BY 1
""",
)


# --- vocabulary pruning impact -----------------------------------------------------

_VP_COUNTS = (2, 5, 10)


def _q_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.vocab_prune_impact(docs, min_counts=_VP_COUNTS)


def _vp_branch(mc: int) -> str:
    return f"""
  SELECT {mc} AS min_count,
         CAST(count(*) AS BIGINT) AS vocab_before,
         CAST(sum(CASE WHEN n >= {mc} THEN 1 ELSE 0 END) AS BIGINT)
           AS vocab_after,
         round(CAST(sum(CASE WHEN n < {mc} THEN n ELSE 0 END) AS DOUBLE)
               / sum(n), 6) AS pruned_token_share,
         round(CAST(sum(CASE WHEN n >= {mc} THEN n ELSE 0 END)
                    + sum(CASE WHEN n < {mc} THEN chars ELSE 0 END) AS DOUBLE)
               / sum(n), 6) AS length_inflation
  FROM t2"""


_register(
    "vocab_prune_impact",
    _q_vocab_prune,
    rf"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents) WHERE tok <> ''),
types AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
t2 AS (SELECT n, n * length(tok) AS chars FROM types)
{" UNION ALL ".join(_vp_branch(mc) for mc in _VP_COUNTS)}
""",
)
