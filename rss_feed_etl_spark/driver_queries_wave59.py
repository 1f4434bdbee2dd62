"""Wave-59 driver queries: embedding storage-format evals — Matryoshka
truncation quality (Kusupati et al. 2022) and symmetric int8 quantization
error — the geometry checks a pipeline runs before shrinking a 100 TB
embedding corpus for ANN serving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import similarity

_MTE_DIMS = (8, 16, 32)


def _q_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.matryoshka_truncation_eval(emb, dims=_MTE_DIMS)


def _dot_sql(a: str, b: str, hi: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {hi} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _nrm_sql(a: str, hi: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(range(1, {hi} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), (x, y) -> x + y))"
    )


_register(
    "matryoshka_truncation_eval",
    _q_matryoshka,
    f"""
WITH p AS (
  SELECT a.embedding AS v1, b.embedding AS v2
  FROM embeddings a JOIN embeddings b ON a.vec_id = b.vec_id + 1),
x AS (
  SELECT d,
         round({_dot_sql('v1', 'v2', '64')} / ({_nrm_sql('v1', '64')} * {_nrm_sql('v2', '64')}), 4) AS cf,
         round({_dot_sql('v1', 'v2', 'd')} / ({_nrm_sql('v1', 'd')} * {_nrm_sql('v2', 'd')}), 4) AS ct
  FROM p, (SELECT unnest([{", ".join(str(d) for d in _MTE_DIMS)}]) AS d))
SELECT CAST(d AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(CAST(abs(cf - ct) AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS mean_abs_err,
       round(CAST(sum(CAST(ct AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS mean_trunc_cosine
FROM x GROUP BY 1
""",
)


def _q_int8_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.int8_quantization_error(emb)


_register(
    "int8_quantization_error",
    _q_int8_err,
    """
WITH s AS (
  SELECT label, embedding AS v,
         greatest(list_reduce(list_transform(range(1, 65),
                    i -> abs(CAST(embedding[i] AS DOUBLE))), (x, y) -> greatest(x, y)),
                  1e-12) / 127.0 AS sc
  FROM embeddings),
pv AS (
  SELECT label, sc,
         list_reduce(list_transform(
           list_transform(range(1, 65),
             i -> CAST(v[i] AS DOUBLE)
                  - least(127.0, greatest(-127.0,
                          floor(CAST(v[i] AS DOUBLE) / sc + 0.5))) * sc),
           e -> e * e), (x, y) -> x + y) / 64.0 AS mse
  FROM s)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(CAST(round(mse, 10) AS DECIMAL(25,10))) AS DOUBLE) / count(*), 9) AS mean_mse,
       round(CAST(sum(CAST(round(sc, 10) AS DECIMAL(25,10))) AS DOUBLE) / count(*), 9) AS mean_scale
FROM pv GROUP BY 1
""",
)
