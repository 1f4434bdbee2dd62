"""Driver-contract queries, wave 99: budget-constrained quality cutoffs
and pseudo-relevance-feedback query expansion — the per-source curation
knob and the retrieval recall-repair loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import _STOPLIST
from .operators import retrieval, textstats

# --- per-source quality keep threshold -----------------------------------------

_KEEP = 0.7
_DROP = 1.0 - _KEEP  # python double — embedded verbatim so both engines
# multiply by the SAME IEEE value (a bare 0.3 literal in DuckDB is DECIMAL
# and ceils differently on exact-integer boundaries)


def _q_keep_thr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_keep_threshold(
        td.load_table(spark, sf_dir, "documents"), keep_frac=_KEEP
    )


_register(
    "quality_keep_threshold",
    _q_keep_thr,
    f"""
WITH q AS (SELECT doc_id, quality FROM ({ORACLES["text_quality_stats"]})),
j AS (
  SELECT d.source, CAST(round(q.quality * 1e6) AS BIGINT) AS code
  FROM q JOIN documents d USING (doc_id)),
counts AS (SELECT source, code, count(*) AS m FROM j GROUP BY 1, 2),
st AS (SELECT source, sum(m) AS n FROM counts GROUP BY 1),
cum AS (
  SELECT counts.source, code, m,
         sum(m) OVER (PARTITION BY counts.source ORDER BY code
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         st.n
  FROM counts JOIN st USING (source)),
thr AS (
  -- drop budget clamped to n-1 so a single-doc source keeps its top doc
  -- instead of vanishing (mirrors the Spark-side least(ceil(...), n-1))
  SELECT source, max(n) AS n,
         min(CASE WHEN cum > least(
                    CAST(ceil(CAST({_DROP!r} AS DOUBLE) * n) AS BIGINT), n - 1)
                  THEN code END) AS tcode
  FROM cum GROUP BY 1),
kept AS (
  SELECT counts.source, sum(m) AS n_kept
  FROM counts JOIN thr USING (source)
  WHERE code >= tcode GROUP BY 1)
SELECT thr.source,
       CAST(thr.n AS BIGINT) AS n_docs,
       tcode / 1e6 AS threshold,
       CAST(kept.n_kept AS BIGINT) AS n_kept,
       round(kept.n_kept / CAST(thr.n AS DOUBLE), 4) AS kept_frac
FROM thr JOIN kept USING (source)
""",
)


# --- PRF query expansion --------------------------------------------------------

_PRF_TERMS = ["spark", "vector", "window"]
_PRF_FB_DOCS = 10
_PRF_FB_TERMS = 5
_TERMLIST = ", ".join(f"'{t}'" for t in _PRF_TERMS)


def _q_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retrieval.prf_query_expansion(
        td.load_table(spark, sf_dir, "documents"),
        _PRF_TERMS,
        fb_docs=_PRF_FB_DOCS,
        fb_terms=_PRF_FB_TERMS,
    )


_register(
    "prf_query_expansion",
    _q_prf,
    rf"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM toks),
ex AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks),
tf AS (SELECT doc_id, dl, term, count(*) AS tf
       FROM ex WHERE term IN ({_TERMLIST}) GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY 1),
fb AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           round(sum(ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
                     * tf * (1.2 + 1)
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
    FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT {_PRF_FB_DOCS})),
cand AS (
  SELECT ex.term, CAST(count(*) AS BIGINT) AS fb_tf
  FROM ex JOIN fb USING (doc_id)
  WHERE lower(ex.term) NOT IN ({_STOPLIST})
    AND ex.term NOT IN ({_TERMLIST})
    AND ex.term <> ''
  GROUP BY 1),
dfc AS (
  SELECT ex.term, CAST(count(DISTINCT ex.doc_id) AS BIGINT) AS dfreq
  FROM ex JOIN cand USING (term) GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT cand.term, cand.fb_tf, dfc.dfreq,
         round(cand.fb_tf * ln(nd.n_docs / CAST(dfc.dfreq AS DOUBLE)), 6) AS score
  FROM cand JOIN dfc USING (term) CROSS JOIN nd),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, term ASC) AS rank
  FROM scored)
SELECT term, fb_tf, dfreq, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_PRF_FB_TERMS}
""",
)
