"""Wave-78 driver queries: Simpson's-paradox audit and keyword-in-context
snippets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import eventanalytics as ea
from .operators import textstats


def _q_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.simpsons_paradox_check(td.load_table(spark, sf_dir, "events"))


_M = "CAST({s} AS DOUBLE) / CAST({n} AS DOUBLE) / 100.0"
_DSEG = f"({_M.format(s='s1', n='n1')} - {_M.format(s='s0', n='n0')})"
_DALL = f"({_M.format(s='ts1', n='tn1')} - {_M.format(s='ts0', n='tn0')})"

_register(
    "simpsons_paradox_check",
    _q_simpson,
    f"""
WITH cells AS (
  SELECT event_type AS seg,
         ({_code('CAST(user_id AS VARCHAR)')}) % 2 AS arm,
         CAST(count(*) AS BIGINT) n,
         CAST(round(sum(CAST(value AS DECIMAL(30,10))) * 100, 0) AS BIGINT) sc
  FROM events GROUP BY 1, 2),
piv AS (
  SELECT seg,
         CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) n0,
         CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) n1,
         CAST(sum(CASE WHEN arm = 0 THEN sc ELSE 0 END) AS BIGINT) s0,
         CAST(sum(CASE WHEN arm = 1 THEN sc ELSE 0 END) AS BIGINT) s1
  FROM cells GROUP BY 1),
tot AS (
  SELECT *, CAST(sum(n0) OVER () AS BIGINT) tn0,
         CAST(sum(n1) OVER () AS BIGINT) tn1,
         CAST(sum(s0) OVER () AS BIGINT) ts0,
         CAST(sum(s1) OVER () AS BIGINT) ts1
  FROM piv)
SELECT seg AS segment, n0 AS n_arm0, n1 AS n_arm1,
       round({_M.format(s='s0', n='n0')}, 6) AS mean_arm0,
       round({_M.format(s='s1', n='n1')}, 6) AS mean_arm1,
       round({_DSEG}, 6) AS diff,
       CAST(CASE WHEN sign({_DSEG}) = sign({_DALL}) THEN 1 ELSE 0 END AS INT)
         AS agrees_with_overall
FROM tot WHERE n0 > 0 AND n1 > 0
UNION ALL
SELECT 'OVERALL', tn0, tn1,
       round({_M.format(s='ts0', n='tn0')}, 6),
       round({_M.format(s='ts1', n='tn1')}, 6),
       round({_DALL}, 6), CAST(1 AS INT)
FROM (SELECT DISTINCT tn0, tn1, ts0, ts1 FROM tot)
""",
)

_KW = "data"
_CTX = 40


def _q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.keyword_snippets(
        td.load_table(spark, sf_dir, "documents"), _KW, context_chars=_CTX
    )


_register(
    "keyword_snippets",
    _q_snippets,
    f"""
WITH p AS (
  SELECT doc_id, CAST(strpos(text, '{_KW}') AS BIGINT) AS pos, text
  FROM documents)
SELECT doc_id, pos,
       substr(text,
              CAST(greatest(pos - {_CTX}, 1) AS INT),
              CAST(pos - greatest(pos - {_CTX}, 1) + {len(_KW)} + {_CTX} AS INT))
         AS snippet
FROM p WHERE pos > 0
""",
)
