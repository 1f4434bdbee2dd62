"""Wave-79 driver queries: weighted percentiles (inverse-CDF on a
quantized grid) and the source-level MinHash Jaccard matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import dedup, sketches
from .operators.dedup import MOD, N_MINHASH

_PS = (0.5, 0.9, 0.99)


def _q_wpct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.weighted_percentiles(
        td.load_table(spark, sf_dir, "lineitem"), ps=_PS
    )


_WP_COLS = ", ".join(
    f"CAST(min(CASE WHEN CAST(cum AS DOUBLE) >= {p!r} * CAST(wt AS DOUBLE) "
    f"THEN v END) AS BIGINT) AS wp{str(p).replace('0.', '').ljust(2, '0')}"
    for p in _PS
)

_register(
    "weighted_percentiles",
    _q_wpct,
    f"""
WITH g AS (
  SELECT CAST(round(l_extendedprice, 0) AS BIGINT) AS v,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1),
c AS (
  SELECT v,
         CAST(sum(w) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(w) OVER () AS BIGINT) AS wt
  FROM g)
SELECT CAST(max(wt) AS BIGINT) AS w_total, {_WP_COLS}
FROM c
""",
)

_SJ_N = 3


def _q_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.source_jaccard_matrix(
        td.load_table(spark, sf_dir, "documents"), n=_SJ_N
    )


_COEFFS = [
    ((2 * i + 1) * 2654435761 % MOD, (i * i + i + 41) % MOD)
    for i in range(N_MINHASH)
]
_MINS = ", ".join(
    f"min(({a} * c + {b}) % {MOD}) AS m{i}" for i, (a, b) in enumerate(_COEFFS)
)
_UNPIVOT = " UNION ALL ".join(
    f"SELECT src, {i} AS perm, m{i} AS mh FROM sig" for i in range(N_MINHASH)
)

# gram identity = base-31 polynomial of per-token codes over tokens
# i..min(i+n-1, nw) — identical arithmetic to the Spark side's integer
# grams (one md5 per token, no gram strings); short documents keep the
# old behavior (position 1 emits whatever tokens exist).  CASE arms are
# built for _SJ_N = 3.
assert _SJ_N == 3, "oracle CASE arms are written for n = 3"

_register(
    "source_jaccard_matrix",
    _q_source_jaccard,
    rf"""
WITH t AS (
  SELECT source AS src, string_split_regex(trim(text), '\s+') AS w
  FROM documents),
k AS (SELECT src, len(w) AS nw, list_transform(w, x -> {_code('x')}) AS c
      FROM t),
codes AS (
  SELECT src,
         unnest(list_distinct(list_transform(
           range(1, greatest(nw - {_SJ_N - 1}, 1) + 1),
           i -> CASE
                  WHEN i + 2 <= nw
                  THEN ((c[i] * 31 + c[i+1]) % {MOD} * 31 + c[i+2]) % {MOD}
                  WHEN i + 1 <= nw THEN (c[i] * 31 + c[i+1]) % {MOD}
                  ELSE c[i]
                END))) AS c
  FROM k),
sig AS (SELECT src, {_MINS} FROM codes GROUP BY 1),
lng AS ({_UNPIVOT}),
p AS (
  SELECT a.src sa, b.src sb, a.mh ma, b.mh mb
  FROM lng a JOIN lng b ON a.perm = b.perm AND a.src < b.src)
SELECT sa AS source_a, sb AS source_b,
       CAST(count(*) AS BIGINT) AS n_perms,
       round(CAST(sum(CASE WHEN ma = mb THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS est_jaccard
FROM p GROUP BY 1, 2
""",
)
