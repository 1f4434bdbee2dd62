"""Driver-contract queries, wave 32: count-min frequency estimates (the
mergeable heavy-hitter sketch), winnowing fingerprints (MOSS local
similarity), per-document tf-idf keywords, and reciprocal-rank fusion of
retrieval lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _W, _hexfold
from .operators import retrieval, sketches, textstats

# --- count-min sketch estimates ---------------------------------------------

_CM_DEPTH, _CM_WIDTH, _CM_SALT = 4, 256, "cm-v1"


def _q_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.countmin_estimates(
        td.load_table(spark, sf_dir, "events"),
        "user_id",
        depth=_CM_DEPTH,
        width=_CM_WIDTH,
        salt=_CM_SALT,
    )


def _cm_bucket(key_expr: str) -> str:
    return (
        _hexfold(f"('{_CM_SALT}:' || CAST(row AS VARCHAR) || ':' || {key_expr})")
        + f" % {_CM_WIDTH}"
    )


_register(
    "countmin_estimates",
    _q_countmin,
    f"""
WITH rows AS (SELECT unnest(range({_CM_DEPTH})) AS row),
cells AS (
  SELECT row, {_cm_bucket("CAST(user_id AS VARCHAR)")} AS bucket
  FROM events, rows),
sketch AS (SELECT row, bucket, count(*) AS n FROM cells GROUP BY 1, 2),
exact AS (SELECT user_id AS key, count(*) AS exact_n FROM events GROUP BY 1),
probes AS (
  SELECT key, exact_n, row, {_cm_bucket("CAST(key AS VARCHAR)")} AS bucket
  FROM exact, rows)
SELECT key, CAST(exact_n AS BIGINT) AS exact_n, CAST(min(n) AS BIGINT) AS est_n
FROM probes JOIN sketch USING (row, bucket)
GROUP BY 1, 2
""",
)


# --- winnowing fingerprints -------------------------------------------------

_WIN_K, _WIN_W = 4, 5


def _q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.winnow_fingerprints(
        td.load_table(spark, sf_dir, "documents"), k=_WIN_K, w=_WIN_W
    )


_register(
    "winnow_fingerprints",
    _q_winnow,
    f"""
WITH toks AS (SELECT doc_id AS id, {_W} AS w FROM documents),
sized AS (SELECT id, w, greatest(len(w) - {_WIN_K - 1}, 1) AS m FROM toks),
pos AS (SELECT id, w, m, unnest(range(1, m + 1)) AS i FROM sized),
h AS (SELECT id, i - 1 AS pos, m,
             ({_hexfold(f"array_to_string(w[i:i + {_WIN_K - 1}], ' ')")})
               % 1000000007 AS h
      FROM pos),
win AS (
  SELECT id, pos, m,
         min(h) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS fp
  FROM h)
SELECT DISTINCT id AS doc_id, fp
FROM win WHERE pos <= greatest(m - {_WIN_W}, 0)
""",
)


# --- per-document tf-idf keywords -------------------------------------------

_KW_TOP, _KW_MIN_DF = 3, 2


def _q_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_keywords(
        td.load_table(spark, sf_dir, "documents"), top=_KW_TOP, min_df=_KW_MIN_DF
    )


_register(
    "doc_keywords",
    _q_keywords,
    f"""
WITH ex AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents),
tf AS (SELECT id, term, count(*) AS tf FROM ex GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS dfreq FROM tf
          GROUP BY 1 HAVING count(*) >= {_KW_MIN_DF}),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT id, term, tf,
         round(tf * ln(CAST(n_docs AS DOUBLE) / dfreq), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored)
SELECT id AS doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_KW_TOP}
""",
)


# --- reciprocal-rank fusion -------------------------------------------------

_RRF_A = ["spark", "vector", "window"]
_RRF_B = ["data", "merge", "stream"]
_RRF_LIST_K, _RRF_K, _RRF_TOP = 20, 60, 20


def _q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    a = retrieval.bm25_topk(docs, _RRF_A, topk=_RRF_LIST_K)
    b = retrieval.bm25_topk(docs, _RRF_B, topk=_RRF_LIST_K)
    return retrieval.rrf_fusion([a, b], k=_RRF_K, top=_RRF_TOP)


def _bm25_ctes(suffix: str, terms: list[str]) -> str:
    """Flat CTE chain computing a BM25 top-k list (mirrors the bm25_search
    oracle, wave 9) with suffixed names so two lists coexist in one WITH."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    s = suffix
    return f"""
tf{s} AS (SELECT doc_id, dl, term, count(*) AS tf
       FROM ex0 WHERE term IN ({terms_sql}) GROUP BY 1, 2, 3),
dfreq{s} AS (SELECT term, count(DISTINCT doc_id) AS dfreq FROM tf{s} GROUP BY 1),
list{s} AS (
  SELECT doc_id,
         round(sum(ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
                   * tf * ({retrieval.BM25_K1} + 1)
                   / (tf + {retrieval.BM25_K1}
                      * (1 - {retrieval.BM25_B}
                         + {retrieval.BM25_B} * dl / avgdl))), 6) AS score
  FROM tf{s} JOIN dfreq{s} USING (term) CROSS JOIN stats0
  GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT {_RRF_LIST_K})"""


_register(
    "rrf_fusion",
    _q_rrf,
    f"""
WITH toks0 AS (SELECT doc_id, {_W} AS w FROM documents),
stats0 AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM toks0),
ex0 AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks0),
{_bm25_ctes("_a", _RRF_A)},
{_bm25_ctes("_b", _RRF_B)},
tagged AS (
  SELECT doc_id AS id, score AS s, 0 AS list_id FROM list_a
  UNION ALL
  SELECT doc_id AS id, score AS s, 1 AS list_id FROM list_b),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY list_id
                               ORDER BY s DESC, id ASC) AS rank
  FROM tagged)
SELECT id AS doc_id, round(sum(1.0 / ({_RRF_K} + rank)), 9) AS rrf_score,
       CAST(count(*) AS BIGINT) AS n_lists
FROM ranked GROUP BY id
ORDER BY rrf_score DESC, doc_id ASC LIMIT {_RRF_TOP}
""",
)
