"""Driver-contract queries, wave 138: query clarity and retrieval
source concentration — the two pre/post-retrieval quality predictors.

Reference anchor: the reference fires its keyword search at whatever
feeds arrived (run_job_filter.py keyword machinery) with no notion of
whether the query was answerable; clarity predicts result quality from
the result LM itself, and source entropy says whether the hits
concentrate (specific query) or spray across feeds (ambiguous).

Both compose over the registered BM25 ranking (same terms as
``bm25_search``), reusing its oracle as a CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .operators import retrieval

_QC_TERMS = ["spark", "vector", "window"]
_QC_FB = 10
_SE_K = 20

_TRI_TOKS = (
    r"SELECT doc_id, "
    r"unnest(list_transform(range(1, len(w) - 1), "
    r"i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok "
    r"FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w "
    r"FROM documents)"
)


def _q_clarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return retrieval.query_clarity_score(docs, _QC_TERMS, fb_docs=_QC_FB)


# The final select is a GLOBAL aggregate (no GROUP BY) so a degenerate
# corpus whose feedback docs yield zero trigrams still returns exactly
# one row — (n_fb_docs, NULL, NULL, NULL) — matching Spark's global agg
# over the empty term set (ADVICE r8).  fbt is one row by construction,
# so on a non-degenerate corpus the values are unchanged.
_register(
    "query_clarity_score",
    _q_clarity,
    f"""
WITH fb AS (SELECT doc_id FROM ({ORACLES["bm25_search"]}) t
            ORDER BY score DESC, doc_id ASC LIMIT {_QC_FB}),
tris AS ({_TRI_TOKS}),
fbc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_fb
        FROM tris JOIN fb USING (doc_id) GROUP BY 1),
fbt AS (SELECT CAST(sum(c_fb) AS BIGINT) AS fb_tokens,
               CAST(count(*) AS BIGINT) AS fb_types FROM fbc),
cc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_all
       FROM tris WHERE tok IN (SELECT tok FROM fbc) GROUP BY 1),
ct AS (SELECT CAST(count(*) AS BIGINT) AS corpus_tokens FROM tris),
terms AS (SELECT round((CAST(c_fb AS DOUBLE) / fb_tokens)
                       * ln((CAST(c_fb AS DOUBLE) * corpus_tokens)
                            / (CAST(fb_tokens AS DOUBLE) * c_all)), 9) AS term
          FROM fbc JOIN cc USING (tok) CROSS JOIN fbt CROSS JOIN ct)
SELECT CAST({_QC_FB} AS BIGINT) AS n_fb_docs,
       CAST(max(fb_types) AS BIGINT) AS fb_types,
       CAST(max(fb_tokens) AS BIGINT) AS fb_tokens,
       round(CAST(sum(CAST(term AS DECIMAL(30,10))) AS DOUBLE), 6)
         AS clarity_nats
FROM terms CROSS JOIN fbt
""",
)


def _q_src_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return retrieval.retrieval_source_entropy(docs, _QC_TERMS, topk=_SE_K)


_register(
    "retrieval_source_entropy",
    _q_src_entropy,
    f"""
WITH hits AS (SELECT doc_id FROM ({ORACLES["bm25_search"]}) t),
per AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS c
        FROM documents JOIN hits USING (doc_id) GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM per),
h AS (SELECT round(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
               AS t2, c, n
      FROM per CROSS JOIN tot)
SELECT CAST(max(n) AS BIGINT) AS n_results,
       CAST(count(*) AS BIGINT) AS n_sources,
       round(CAST(max(c) AS DOUBLE) / max(n), 6) AS majority_share,
       round(CAST(sum(CAST(t2 AS DECIMAL(30,10))) AS DOUBLE), 6)
         AS source_entropy_nats
FROM h
""",
)
