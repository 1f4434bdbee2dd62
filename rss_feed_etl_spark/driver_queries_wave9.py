"""Driver-contract queries, wave 9: corpus retrieval (inverted index, BM25
ranking), benchmark decontamination, time-series gap filling, and weighted
priority sampling.

These extend the reference's keyword filtering / TF-IDF surface
(run_job_filter.py:206-237, src/utils/ats_matcher.py:20-37) and lookback
windows (run_job_filter.py:112-152) into the corpus-scale forms a
training-data pipeline needs.  Every formula is engine-independent
(md5-derived uniforms, single IEEE divisions, explicit rounding before any
ordering that selects rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _AUG_SQL, _SHINGLES, _W, _aug_docs, _hexfold
from .operators import retrieval, sampling, timeseries

# --- inverted index --------------------------------------------------------

_MIN_DF = 25
_MAX_POST = 10


def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return retrieval.inverted_index(docs, min_df=_MIN_DF, max_postings=_MAX_POST)


_register(
    "inverted_index",
    _q_inverted_index,
    f"""
WITH ex AS (
  SELECT DISTINCT doc_id, unnest({_W}) AS term FROM documents)
SELECT term, count(*) AS dfreq,
       array_to_string((list(doc_id ORDER BY doc_id))[1:{_MAX_POST}], ',') AS postings
FROM ex GROUP BY term HAVING count(*) >= {_MIN_DF}
""",
)


# --- BM25 ranking ----------------------------------------------------------

_BM25_TERMS = ["spark", "vector", "window"]
_BM25_K = 20


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(docs, _BM25_TERMS, topk=_BM25_K)


_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
_register(
    "bm25_search",
    _q_bm25,
    f"""
WITH toks AS (SELECT doc_id, {_W} AS w FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(w)) AS avgdl FROM toks),
ex AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks),
tf AS (SELECT doc_id, dl, term, count(*) AS tf
       FROM ex WHERE term IN ({_TERMS_SQL}) GROUP BY 1, 2, 3),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY 1)
SELECT doc_id,
       round(sum(ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
                 * tf * ({retrieval.BM25_K1} + 1)
                 / (tf + {retrieval.BM25_K1}
                    * (1 - {retrieval.BM25_B} + {retrieval.BM25_B} * dl / avgdl))), 6)
         AS score
FROM tf JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {_BM25_K}
""",
)


# --- daily gap-fill with LOCF ---------------------------------------------

_GAP_CUTOFF = 300.0


def _q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value") > _GAP_CUTOFF)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    filled = timeseries.gapfill_locf(daily, key_col="event_type")
    # day → 'yyyy-MM-dd' string at the sink: the driver's pandas compare
    # renders Spark DATE and DuckDB DATE differently (date vs datetime64)
    return filled.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "total",
        "filled_total",
        "is_gap",
    )


_register(
    "daily_gapfill",
    _q_gapfill,
    f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 2) AS total
  FROM events WHERE value > {_GAP_CUTOFF} GROUP BY 1, 2),
bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
spine0 AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day0
  FROM bounds),
spine AS (SELECT event_type, CAST(day0 AS DATE) AS day FROM spine0)
SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day, d.total,
       last_value(d.total IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total,
       d.total IS NULL AS is_gap
FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
""",
)


# --- weighted priority sample ---------------------------------------------

_WS_K = 50
_WS_SALT = "wsample-v1"


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return sampling.weighted_priority_sample(
        docs, k=_WS_K, weight_col="n_chars", salt=_WS_SALT
    )


_WS_U = _hexfold(f"('{_WS_SALT}:' || CAST(doc_id AS VARCHAR))")
_register(
    "weighted_doc_sample",
    _q_weighted_sample,
    f"""
SELECT doc_id, lang, n_chars FROM documents
ORDER BY {_WS_U} / n_chars ASC, doc_id ASC
LIMIT {_WS_K}
""",
)


# --- train/holdout decontamination ----------------------------------------

_DECON_SALT = "split-v1"
_MIN_SHARED = 3
_DECON_MAX_DF = 1000


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage check on the AUGMENTED corpus (each doc + its
    80%-prefix copy at id+1e6 — see driver_queries_corpus): the copies
    land in independent splits, so train×holdout shingle overlap is
    observable and recall is verifiable."""
    aug = _aug_docs(spark, sf_dir)
    split = sampling.deterministic_split(aug, key_col="id", salt=_DECON_SALT)
    return sampling.cross_split_contamination(
        split, min_shared=_MIN_SHARED, max_df=_DECON_MAX_DF
    )


def _q_decontaminate_bc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-sized-holdout variant: the capped holdout bucket table is
    broadcast, removing the corpus-side shuffle (plan pinned in
    test_plan_shapes.py)."""
    aug = _aug_docs(spark, sf_dir)
    split = sampling.deterministic_split(aug, key_col="id", salt=_DECON_SALT)
    return sampling.cross_split_contamination(
        split,
        min_shared=_MIN_SHARED,
        max_df=_DECON_MAX_DF,
        broadcast_holdout=True,
    )


_DECON_BUCKET = _hexfold(f"('{_DECON_SALT}:' || CAST(id AS VARCHAR))") + " % 100"
_DECON_SQL = f"""
WITH {_AUG_SQL},
lab AS (
  SELECT id, text,
         CASE WHEN {_DECON_BUCKET} < 80 THEN 'train'
              WHEN {_DECON_BUCKET} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM aug),
sh AS (SELECT id, split, {_hexfold('shingle')} AS shingle
       FROM (SELECT id, split, unnest({_SHINGLES.format(w=_W)}) AS shingle
             FROM lab)),
hold AS (SELECT id, shingle FROM sh WHERE split = 'test'),
keep AS (SELECT shingle FROM hold GROUP BY 1 HAVING count(*) <= {_DECON_MAX_DF})
SELECT t.id AS train_id, h.id AS holdout_id, count(*) AS shared_shingles
FROM sh t
JOIN keep k ON t.shingle = k.shingle
JOIN hold h ON t.shingle = h.shingle
WHERE t.split = 'train'
GROUP BY 1, 2
HAVING count(*) >= {_MIN_SHARED}
"""
_register("decontaminate_splits", _q_decontaminate, _DECON_SQL)
_register("decontaminate_broadcast_holdout", _q_decontaminate_bc, _DECON_SQL)
