"""Driver-contract queries, wave 103: semantic split decontamination
(banded-LSH nearest-train-neighbor over the eval split), per-language
tokenizer fertility, and eval-vs-train OOV skew.

Reference anchor: generalizes the reference's keyword/content filters
(src/rss_feed_etl/core/data_filter.py) to the split-hygiene checks a
training-data pipeline runs before trusting an eval number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _band_sig_sql, _cos_sql
from .operators import sampling, textstats

# --- semantic split contamination -----------------------------------------------
# eval = every 5th vector by id (deterministic, content-addressed split);
# threshold at contamination grade: near-identical embeddings only.  The
# synthetic corpus has NO natural cross-split near-duplicates (max natural
# cosine ~0.45), so the query PLANTS leakage — a perturbed copy (cos
# ~0.999) of every third eval vector joins the train pool, the same
# augment-inside-the-query pattern the near-dup queries use (_AUG_EMB_SQL)
# — and the operator must flag exactly the planted vectors.

_SC_MOD, _SC_PLANT_MOD, _SC_THR, _SC_BANDS, _SC_ROWS = 5, 15, 0.98, 6, 16
_SC_PERTURB = (
    "transform(embedding, (x, i) -> cast(x + 0.001 * ((i % 3) - 1) as float))"
)


def _q_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % _SC_MOD == 0).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % _SC_PLANT_MOD == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.expr(_SC_PERTURB).alias("embedding"),
    )
    tr = (
        emb.filter(F.col("vec_id") % _SC_MOD != 0)
        .select("vec_id", "embedding")
        .unionByName(planted)
    )
    return sampling.semantic_contamination(
        ev, tr, threshold=_SC_THR, bands=_SC_BANDS, rows_per_band=_SC_ROWS
    )


# 16-bit bands (not the miners' 8): contamination-grade cosines survive
# sharp signatures while the natural collision fraction drops ~150x --
# the knob that keeps the 10x scale measurement near-linear.
_SC_EBANDS = "\nUNION ALL\n".join(
    f"SELECT eval_id, {b} AS band, {_band_sig_sql(b, _SC_ROWS)} AS sig FROM e"
    for b in range(_SC_BANDS)
)
_SC_TBANDS = "\nUNION ALL\n".join(
    f"SELECT train_id, {b} AS band, {_band_sig_sql(b, _SC_ROWS)} AS sig FROM t"
    for b in range(_SC_BANDS)
)

_register(
    "semantic_split_contamination",
    _q_semantic_contamination,
    f"""
WITH e AS (SELECT vec_id AS eval_id, embedding FROM embeddings
           WHERE vec_id % {_SC_MOD} = 0),
t AS (SELECT vec_id AS train_id, embedding FROM embeddings
      WHERE vec_id % {_SC_MOD} <> 0
      UNION ALL
      SELECT vec_id + 1000000 AS train_id,
             list_transform(range(1, 65),
               i -> CAST(CAST(embedding[i] AS DOUBLE)
                         + 0.001 * (((i - 1) % 3) - 1) AS FLOAT)) AS embedding
      FROM embeddings WHERE vec_id % {_SC_PLANT_MOD} = 0),
ebands AS ({_SC_EBANDS}),
tbands AS ({_SC_TBANDS}),
cand AS (
  SELECT DISTINCT x.eval_id, y.train_id
  FROM ebands x JOIN tbands y ON x.band = y.band AND x.sig = y.sig),
s AS (
  SELECT c.eval_id, c.train_id,
         {_cos_sql("ev.embedding", "tv.embedding")} AS cos
  FROM cand c JOIN e ev USING (eval_id) JOIN t tv USING (train_id)),
best AS (SELECT *, row_number() OVER (PARTITION BY eval_id
                                      ORDER BY cos DESC, train_id) AS rk
         FROM s)
SELECT eval_id, train_id AS nearest_train_id, cos AS cosine_sim
FROM best WHERE rk = 1 AND cos >= {_SC_THR}
""",
)


# --- per-language tokenizer fertility --------------------------------------------


def _q_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.tokenizer_fertility(td.load_table(spark, sf_dir, "documents"))


_register(
    "tokenizer_fertility_by_lang",
    _q_fertility,
    r"""
WITH m AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS nc,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS nt
  FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CASE WHEN sum(nt) > 0
            THEN round(CAST(sum(nc) AS DOUBLE) / CAST(sum(nt) AS DOUBLE), 4)
            END AS chars_per_token,
       round(CAST(sum(nt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
           AS tokens_per_doc
FROM m GROUP BY 1
""",
)


# --- eval-vs-train OOV skew -------------------------------------------------------
# eval = every 10th document by id; vocabulary = all train types (min_count=1).

_OOV_MOD = 10


def _q_split_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % _OOV_MOD == 0)
    tr = docs.filter(F.col("doc_id") % _OOV_MOD != 0)
    return textstats.split_oov_rate(tr, ev, min_count=1)


_register(
    "split_oov_rate",
    _q_split_oov,
    rf"""
WITH tr AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE doc_id % {_OOV_MOD} <> 0),
v AS (SELECT DISTINCT tok FROM tr WHERE tok <> ''),
ev AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE doc_id % {_OOV_MOD} = 0),
et AS (SELECT * FROM ev WHERE tok <> '')
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS oov_rate
FROM et LEFT JOIN v ON et.tok = v.tok GROUP BY 1
""",
)
