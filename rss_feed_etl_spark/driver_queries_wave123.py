"""Driver-contract queries, wave 123: Dirichlet query-likelihood
retrieval and the click position-bias curve.

Reference anchor: the reference matches resumes to postings with TF-IDF
cosine (src/utils/ats_matcher.py); query-likelihood is the
language-model ranker that complements the registry's BM25 (wave 8),
and the position-bias curve is what makes any click-trained ranker's
labels usable at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics, retrieval

# --- Dirichlet query-likelihood ----------------------------------------------------

_QL_TERMS = ("spark", "vector", "window")
_QL_MU = 300.0
_QL_K = 20

_QL_IN = ", ".join(f"'{t}'" for t in _QL_TERMS)


def _q_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return retrieval.query_likelihood_topk(
        docs, list(_QL_TERMS), mu=_QL_MU, topk=_QL_K
    )


_register(
    "query_likelihood_search",
    _q_ql,
    rf"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents),
ctot AS (SELECT CAST(sum(len(w)) AS DOUBLE) AS c_total FROM toks),
ex AS (SELECT doc_id, unnest(w) AS term FROM toks),
cf AS (SELECT term, CAST(count(*) AS DOUBLE) AS cf
       FROM ex WHERE term IN ({_QL_IN}) GROUP BY 1),
cand AS (SELECT doc_id, len(w) AS dl FROM toks
         WHERE len(list_filter(w, t -> t IN ({_QL_IN}))) > 0),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM ex WHERE term IN ({_QL_IN}) GROUP BY 1, 2),
sc AS (SELECT cand.doc_id,
              round(ln((coalesce(tf.tf, CAST(0.0 AS DOUBLE))
                        + CAST({_QL_MU} AS DOUBLE) * cf.cf / c_total)
                       / (cand.dl + CAST({_QL_MU} AS DOUBLE))), 9) AS t
       FROM cand CROSS JOIN cf CROSS JOIN ctot
       LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.term = cf.term)
SELECT doc_id,
       round(CAST(sum(CAST(t AS DECIMAL(30,10))) AS DOUBLE), 6) AS score
FROM sc GROUP BY 1 ORDER BY score DESC, doc_id ASC LIMIT {_QL_K}
""",
)


# --- click position bias -----------------------------------------------------------
# Positions and a decaying click-keep rule are planted deterministically
# from event_id (the wave-111/114 plant-inside-the-query pattern).


def _q_pos_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    pos = (F.col("event_id") % 10 + 1).cast("int")
    staged = ev.select(
        pos.alias("position"),
        F.when(
            (F.col("event_type") == "click")
            & ((F.col("event_id") % 12) < (F.col("event_id") % 10 + 1)),
            F.lit("dropped"),
        )
        .otherwise(F.col("event_type"))
        .alias("event_type"),
    )
    return eventanalytics.click_position_bias(staged)


_register(
    "click_position_bias",
    _q_pos_bias,
    """
WITH staged AS (
  SELECT CAST((event_id % 10) + 1 AS INT) AS position,
         CASE WHEN event_type = 'click'
                   AND (event_id % 12) < (event_id % 10) + 1
              THEN 'dropped' ELSE event_type END AS event_type
  FROM events)
SELECT position,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS impressions,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS clicks,
       CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0
            THEN round(CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                ELSE 0 END) AS DOUBLE)
                       / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
                       6) END AS ctr,
       CASE WHEN (SELECT round(CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                       ELSE 0 END) AS DOUBLE)
                        / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
                        6)
                  FROM staged WHERE position = 1) > 0
            THEN round(
              (CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                             END) > 0
                    THEN round(CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                        ELSE 0 END) AS DOUBLE)
                               / sum(CASE WHEN event_type = 'view' THEN 1
                                     ELSE 0 END), 6) END)
              / (SELECT round(CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                       ELSE 0 END) AS DOUBLE)
                        / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
                        6)
                 FROM staged WHERE position = 1), 6)
       END AS bias_vs_top
FROM staged GROUP BY 1
""",
)
