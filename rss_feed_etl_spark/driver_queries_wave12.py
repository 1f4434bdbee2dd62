"""Driver-contract queries, wave 12: incremental batch-vs-corpus near-dup
(the streaming-corpus dedup path) and RAG-style document chunking."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import (
    _AUG_SQL,
    _BAND_LIST,
    _MH_LIST,
    _SHINGLES,
    _W,
    _aug_docs,
    _code,
)
from .operators import dedup, packing
from .operators.dedup import N_MINHASH

# --- incremental near-dup: new batch vs existing corpus --------------------

_INC_THRESHOLD = 0.25


def _q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch = the deterministic 80%-prefix copies (id ≥ 1e6, see
    driver_queries_corpus), corpus = the original documents — so each
    batch doc has a known near-dup in the corpus and recall is
    observable."""
    aug = _aug_docs(spark, sf_dir)
    corpus = aug.filter(F.col("id") < 1000000)
    batch = aug.filter(F.col("id") >= 1000000)
    return dedup.incremental_minhash_pairs(
        corpus, batch, id_col="id", text_col="text", threshold=_INC_THRESHOLD
    )


_register(
    "incremental_neardup",
    _q_incremental_neardup,
    f"""
WITH {_AUG_SQL},
codes AS (SELECT id, list_transform({_SHINGLES.format(w=_W)}, s -> {_code("s")}) AS codes
          FROM aug),
sigs AS (SELECT id, [{_MH_LIST}] AS sig FROM codes),
banded AS (SELECT id, sig, unnest([{_BAND_LIST}]) AS bucket FROM sigs),
cand AS (
  SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id, b.sig AS sig_b, c.sig AS sig_c
  FROM banded c JOIN banded b ON c.bucket = b.bucket
  WHERE c.id < 1000000 AND b.id >= 1000000),
est AS (
  SELECT batch_id, corpus_id,
         round(len(list_filter(range(1, {N_MINHASH} + 1),
                               i -> sig_b[i] = sig_c[i])) / {N_MINHASH}, 6) AS est_jaccard
  FROM cand)
SELECT batch_id, corpus_id, est_jaccard FROM est WHERE est_jaccard >= {_INC_THRESHOLD}
""",
)


# --- document chunking -----------------------------------------------------

_CHUNK_W = 16
_CHUNK_S = 12


def _q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return packing.chunk_documents(
        docs, chunk_tokens=_CHUNK_W, stride=_CHUNK_S
    )


_register(
    "document_chunks",
    _q_chunking,
    f"""
WITH base AS (SELECT doc_id, {_W} AS w, len({_W}) AS n FROM documents),
idx AS (
  SELECT doc_id, w, n,
         unnest(range(0, 1 + CAST(ceil(greatest(n - {_CHUNK_W}, 0) * 1.0 / {_CHUNK_S}) AS BIGINT))) AS i
  FROM base),
st AS (
  SELECT DISTINCT doc_id, w,
         least(i * {_CHUNK_S} + 1, greatest(n - {_CHUNK_W} + 1, 1)) AS start
  FROM idx)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS chunk_idx,
       start,
       len(w[start:start + {_CHUNK_W} - 1]) AS n_tokens,
       md5(array_to_string(w[start:start + {_CHUNK_W} - 1], ' ')) AS chunk_md5
FROM st
""",
)
