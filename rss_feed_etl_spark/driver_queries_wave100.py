"""Driver-contract queries, wave 100: negative-sampling distribution table
and MMR diversified top-k — the contrastive-training sampler and the
result-list diversifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _cos_sql
from .operators import similarity, textstats

# --- negative sampling table ----------------------------------------------------

_NS_VOCAB = 10000


def _q_neg_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.negative_sampling_table(
        td.load_table(spark, sf_dir, "documents"), vocab_size=_NS_VOCAB
    )


_register(
    "negative_sampling_table",
    _q_neg_table,
    rf"""
WITH t AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents),
c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t WHERE tok <> '' GROUP BY 1),
top AS (SELECT tok, n FROM c ORDER BY n DESC, tok ASC LIMIT {_NS_VOCAB}),
wtab AS (
  SELECT tok, n, round(sqrt(sqrt(CAST(n AS DOUBLE) * n * n)), 9) AS w
  FROM top),
tot AS (
  SELECT CAST(sum(CAST(w AS DECIMAL(30,10))) AS DOUBLE) AS wtot FROM wtab),
cumt AS (
  SELECT tok, n, w,
         row_number() OVER (ORDER BY n DESC, tok ASC) AS rank,
         sum(CAST(w AS DECIMAL(30,10)))
           OVER (ORDER BY n DESC, tok ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM wtab)
SELECT CAST(rank AS INT) AS rank, tok AS term, n,
       round(w / wtot, 9) AS prob,
       round(CAST(cw AS DOUBLE) / wtot, 9) AS cum_prob
FROM cumt, tot
""",
)


# --- MMR diversified top-k --------------------------------------------------------

_MMR_QID = 0
_MMR_K = 5
_MMR_CAND = 20
_MMR_LAM = 0.7
_MMR_ONE_MINUS = 1.0 - _MMR_LAM  # python double, embedded verbatim


def _q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.mmr_diversified_topk(
        td.load_table(spark, sf_dir, "embeddings"),
        query_id=_MMR_QID,
        k=_MMR_K,
        candidates=_MMR_CAND,
        lam=_MMR_LAM,
    )


def _mmr_steps() -> str:
    """Unrolled greedy MMR steps: each step argmaxes
    round(λ·rel − (1−λ)·max sim-to-selected, 6) over the unselected
    candidates, ties on id — the exact Spark trajectory."""
    out = [
        f"""s1 AS (
  SELECT id, rel, round(rel * {_MMR_LAM!r}, 6) AS mmr, 1 AS r
  FROM cand ORDER BY mmr DESC, id ASC LIMIT 1),
sel1 AS (SELECT id FROM s1)"""
    ]
    for step in range(2, _MMR_K + 1):
        prev = step - 1
        out.append(
            f"""s{step} AS (
  SELECT c.id, c.rel,
         round(c.rel * {_MMR_LAM!r} - {_MMR_ONE_MINUS!r} * max(pw.sim), 6) AS mmr,
         {step} AS r
  FROM cand c JOIN pw ON pw.ia = c.id AND pw.ib IN (SELECT id FROM sel{prev})
  WHERE c.id NOT IN (SELECT id FROM sel{prev})
  GROUP BY c.id, c.rel
  ORDER BY mmr DESC, id ASC LIMIT 1),
sel{step} AS (SELECT id FROM sel{prev} UNION ALL SELECT id FROM s{step})"""
        )
    return ",\n".join(out)


_MMR_UNION = "\nUNION ALL\n".join(
    f"SELECT id AS vec_id, rel, mmr AS mmr_score, CAST(r AS INT) AS mmr_rank FROM s{i}"
    for i in range(1, _MMR_K + 1)
)

_register(
    "mmr_diversified_topk",
    _q_mmr,
    f"""
WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {_MMR_QID}),
cand AS (
  SELECT vec_id AS id, embedding AS vec, {_cos_sql("embedding", "q")} AS rel
  FROM embeddings, qv WHERE vec_id <> {_MMR_QID}
  ORDER BY rel DESC, id ASC LIMIT {_MMR_CAND}),
pw AS (
  SELECT a.id AS ia, b.id AS ib, {_cos_sql("a.vec", "b.vec")} AS sim
  FROM cand a CROSS JOIN cand b),
{_mmr_steps()}
{_MMR_UNION}
""",
)


# --- banded bitext mining (explicit scale-path name) ---------------------------
# Since round 6 `bitext_mining_pairs` itself runs the banded plan; this
# alias keeps the explicit name registered with the identical shared
# oracle (both callables and both SQL strings resolve to the same plan).

from .driver_queries_wave61 import (  # noqa: E402
    _BT_A, _BT_B, _BT_BANDED_SQL, _BT_BANDS, _BT_K, _BT_THR,
)


def _q_bitext_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td.load_table(spark, sf_dir, "embeddings")
    return similarity.bitext_mining_pairs_banded(
        emb, label_a=_BT_A, label_b=_BT_B, k=_BT_K,
        margin_threshold=_BT_THR, bands=_BT_BANDS,
    )


_register("bitext_mining_pairs_banded", _q_bitext_banded, _BT_BANDED_SQL)
