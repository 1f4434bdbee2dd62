"""Driver-contract queries, wave 4: BPE-ish token counting and IVF
approximate nearest-neighbor search.

Registered into ``driver_queries.QUERIES`` / ``ORACLES`` like waves 2-3.
Both queries are deterministic end-to-end (sampled quantizer, 4dp-rounded
cosines, fixed regex) so the DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .operators import similarity, sketches, textstats

# --- token counting: whitespace + BPE-ish regex (training-data pipeline) --


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.bpe_token_counts(td.load_table(spark, sf_dir, "documents"))


_register(
    "token_counts",
    _q_token_counts,
    rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws,
         len(regexp_extract_all(text, '{textstats.BPE_REGEX}')) AS n_bpe,
         length(text) AS n_chars
  FROM documents)
SELECT doc_id,
       CAST(n_ws AS BIGINT) AS n_ws_tokens,
       CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
       CASE WHEN n_bpe > 0 THEN round(n_chars / CAST(n_bpe AS DOUBLE), 4)
            ELSE 0.0 END AS chars_per_tok
FROM t
""",
)


# --- IVF approximate nearest neighbor -------------------------------------

_N_CENT = 40
_NPROBE = 2
_IVF_SALT = "ivf-v1"


def _q_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_ivf(
        emb, queries, k=5, n_centroids=_N_CENT, nprobe=_NPROBE, salt=_IVF_SALT
    )


from .driver_queries_corpus import _hexfold  # noqa: E402

_IVF_HK = _hexfold(f"('{_IVF_SALT}:' || CAST(vec_id AS VARCHAR))")

_register(
    "ann_cosine_topk_ivf",
    _q_ivf,
    f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM (
    SELECT vec_id, embedding, {_IVF_HK} AS hk FROM embeddings
    ORDER BY hk, vec_id LIMIT {_N_CENT})),
corpus_sc AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS ev, c.cent_id,
         {_cos_sql("e.embedding", "c.cv")} AS csim
  FROM embeddings e CROSS JOIN cents c),
corpus_cell AS (
  SELECT neighbor_id, ev, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM corpus_sc) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
q_sc AS (
  SELECT q.query_id, q.qv, c.cent_id, {_cos_sql("q.qv", "c.cv")} AS csim
  FROM q CROSS JOIN cents c),
q_cells AS (
  SELECT query_id, qv, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY csim DESC, cent_id ASC) AS rn
    FROM q_sc) WHERE rn <= {_NPROBE}),
scored AS (
  SELECT qc.query_id, cc.neighbor_id,
         {_cos_sql("qc.qv", "cc.ev")} AS cosine_sim
  FROM q_cells qc JOIN corpus_cell cc ON qc.cell = cc.cell
  WHERE cc.neighbor_id <> qc.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
)


# --- cardinality / distribution profiles (exact = oracle baseline for the
# --- HLL / GK-digest sketches in operators/sketches.py) -------------------


def _q_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.distinct_daily(td.load_table(spark, sf_dir, "events"))


_register(
    "events_distinct_daily",
    _q_distinct_daily,
    """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events GROUP BY day ORDER BY day
""",
)


def _q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.value_percentiles(td.load_table(spark, sf_dir, "events"))


_register(
    "value_percentiles",
    _q_value_percentiles,
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       round(avg(value), 4) AS mean
FROM events GROUP BY event_type ORDER BY event_type
""",
)
