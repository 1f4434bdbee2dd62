"""Driver-contract queries, wave 40: distributed embedding covariance,
driver-side PCA with map-only projection, and fractional-epoch mixture
upsampling.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import linalg, sampling

# --- embedding covariance ---------------------------------------------------

_DIM = 64


def _q_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    return linalg.embedding_covariance(
        td.load_table(spark, sf_dir, "embeddings"), dim=_DIM
    )


_register(
    "embedding_covariance",
    _q_cov,
    f"""
WITH p AS (
  SELECT i, j,
         CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) AS x,
         CAST(embedding[CAST(j + 1 AS INT)] AS DOUBLE) AS y
  FROM embeddings,
       (SELECT unnest(range({_DIM})) AS i),
       (SELECT unnest(range({_DIM})) AS j)
  WHERE i <= j)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       round(sum(x * y) / count(*)
             - (sum(x) / count(*)) * (sum(y) / count(*)), 6) + 0.0 AS cov
FROM p GROUP BY 1, 2
""",
)


# --- PCA projection (no SQL oracle: eigendecomposition) ---------------------


def _q_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    return linalg.pca_project(
        td.load_table(spark, sf_dir, "embeddings"), k=8, dim=_DIM
    )


# Registered WITHOUT oracle_sql: the eigenbasis is not SQL-expressible.
# The driver records the weaker rows-only check; value-level invariants
# (variance ordering, orthonormality, sign stability) are pinned in
# tests/test_wave40.py.
_register("pca_projection", _q_pca, None)


# --- fractional-epoch upsampling --------------------------------------------

_EPOCH_SALT = "epoch-v1"
_EPOCH_PREC = 1_000_000
_EPOCH_WEIGHTS = {f"src{i}": 0.4 + (i % 5) * 0.55 for i in range(20)}


def _q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.epoch_upsample(
        docs, group_col="source", weights=_EPOCH_WEIGHTS, salt=_EPOCH_SALT
    )


def _epoch_sql() -> str:
    whole_arms = " ".join(
        f"WHEN '{g}' THEN {int(math.floor(w))}" for g, w in _EPOCH_WEIGHTS.items()
    )
    thresh_arms = " ".join(
        f"WHEN '{g}' THEN {int(round((w - math.floor(w)) * _EPOCH_PREC))}"
        for g, w in _EPOCH_WEIGHTS.items()
    )
    h = _hexfold(f"('{_EPOCH_SALT}:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH h AS (SELECT doc_id, source, {h} % {_EPOCH_PREC} AS b FROM documents),
n AS (SELECT doc_id, source,
             (CASE source {whole_arms} ELSE 1 END)
             + (CASE WHEN b < (CASE source {thresh_arms} ELSE 0 END)
                     THEN 1 ELSE 0 END) AS n
      FROM h)
SELECT doc_id, source, unnest(range(n)) AS epoch FROM n
"""


_register("epoch_upsample", _q_epoch_upsample, _epoch_sql())
