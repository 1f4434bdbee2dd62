"""Driver-contract queries, wave 23: the dedup KEEP side and two more
near-dup modalities — semantic (embedding-cell) dedup, quality-based
canonical survivor per cluster, and blocked edit-distance entity matching.

``semantic_dedup_pairs`` is SemDeDup with deterministic seed cells so the
cell partition (and therefore the whole query) replays exactly in the
DuckDB oracle; ``canonical_per_component`` turns the component labels into
the actual keep-decision (best-quality member survives, not min-id);
``levenshtein_blocked_pairs`` is record-linkage blocking + edit distance
on the customer name master.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import ORACLES, _register
from .driver_queries_corpus import (
    _AUG_SQL,
    _aug_docs,
    _aug_embeddings,
    _AUG_EMB_SQL,
    _cos_sql,
    _hexfold,
)
from .operators import dedup, fuzzy, similarity

# --- semantic dedup (SemDeDup, deterministic seed cells) -------------------

_SEM_K = 8
_SEM_T = 0.99
_SEM_SALT = "semdedup-v1"
_SEM_MAXCELL = 20_000


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.semantic_dedup_pairs(
        _aug_embeddings(spark, sf_dir),
        k=_SEM_K,
        threshold=_SEM_T,
        salt=_SEM_SALT,
        max_cell=_SEM_MAXCELL,
    )


_SEM_HK = _hexfold(f"('{_SEM_SALT}:' || CAST(vec_id AS VARCHAR))")

_register(
    "semantic_dedup_pairs",
    _q_semantic_dedup,
    f"""
WITH {_AUG_EMB_SQL},
h AS (SELECT vec_id AS id, embedding, {_SEM_HK} AS hk FROM aug_emb),
seeds AS (
  SELECT row_number() OVER (ORDER BY hk, id) - 1 AS seed_idx, embedding AS sv
  FROM (SELECT * FROM h ORDER BY hk, id LIMIT {_SEM_K})),
scored AS (
  SELECT h.id, h.embedding, s.seed_idx,
         {_cos_sql("h.embedding", "s.sv")} AS c
  FROM h CROSS JOIN seeds s),
cells AS (
  SELECT id, embedding, CAST(seed_idx AS BIGINT) AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY id
                                     ORDER BY c DESC, seed_idx ASC) AS rn
        FROM scored)
  WHERE rn = 1),
ok AS (SELECT cell FROM cells GROUP BY 1
       HAVING count(*) BETWEEN 2 AND {_SEM_MAXCELL}),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b, a.cell AS cell,
         {_cos_sql("a.embedding", "b.embedding")} AS cosine_sim
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id
  JOIN ok ON ok.cell = a.cell)
SELECT id_a, id_b, cell, cosine_sim FROM cand WHERE cosine_sim >= {_SEM_T}
""",
)


# --- canonical survivor per near-dup component ------------------------------


def _q_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _aug_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        docs, id_col="id", text_col="text", n=3, threshold=0.25
    )
    comp = dedup.neardup_components(pairs)
    scored = docs.select("id", F.length("text").cast("bigint").alias("len"))
    return dedup.canonical_per_component(comp, scored, id_col="id", score_col="len")


_register(
    "canonical_per_component",
    _q_canonical,
    f"""
WITH {_AUG_SQL},
comps AS (SELECT * FROM ({ORACLES["neardup_components"]})),
m AS (SELECT c.component_id, c.id, length(a.text) AS len
      FROM comps c JOIN aug a ON a.id = c.id)
SELECT component_id, id AS canonical_id,
       CAST(cnt AS BIGINT) AS n_members, CAST(best AS BIGINT) AS best_score
FROM (SELECT component_id, id, len,
             row_number() OVER (PARTITION BY component_id
                                ORDER BY len DESC, id ASC) AS rn,
             count(*) OVER (PARTITION BY component_id) AS cnt,
             max(len) OVER (PARTITION BY component_id) AS best
      FROM m)
WHERE rn = 1
""",
)


# --- blocked edit-distance entity matching ---------------------------------

_FUZZY_DIST = 1
_FUZZY_MAXBLOCK = 10_000


def _q_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = td.load_table(spark, sf_dir, "customer")
    return fuzzy.levenshtein_blocked_pairs(
        cust,
        block=F.substring("c_name", 1, 16),
        id_col="c_custkey",
        text_col="c_name",
        max_dist=_FUZZY_DIST,
        max_block=_FUZZY_MAXBLOCK,
    )


_register(
    "fuzzy_name_pairs",
    _q_fuzzy_names,
    f"""
WITH t AS (SELECT c_custkey AS id, c_name AS nm,
                  substr(c_name, 1, 16) AS block
           FROM customer),
ok AS (SELECT block FROM t GROUP BY 1
       HAVING count(*) BETWEEN 2 AND {_FUZZY_MAXBLOCK})
SELECT a.id AS id_a, b.id AS id_b, a.block AS block,
       CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
FROM t a JOIN t b ON a.block = b.block AND a.id < b.id
JOIN ok ON ok.block = a.block
WHERE levenshtein(a.nm, b.nm) <= {_FUZZY_DIST}
""",
)
