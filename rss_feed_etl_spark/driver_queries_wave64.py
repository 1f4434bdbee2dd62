"""Wave-64 driver queries: data-layout tooling — a z-order scan advisor
(measures min-max file skipping per candidate layout) and deterministic
weight-balanced shard assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import layout, textstats

_BITS = 8
_FILES = 64


def _q_zorder_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = td.load_table(spark, sf_dir, "lineitem")
    return layout.zorder_scan_advisor(
        li, "l_partkey", "l_suppkey", "l_orderkey",
        n_files=_FILES, grid_bits=_BITS,
    )


def _zexpr(gx: str, gy: str, bits: int) -> str:
    terms = [f"(((({gx}) >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    terms += [f"(((({gy}) >> {i}) & 1) << {2 * i})" for i in range(bits)]
    return " | ".join(terms)


_GX = "(CAST(l_partkey AS BIGINT) - mnx) * 256 // (mxx - mnx + 1)"
_GY = "(CAST(l_suppkey AS BIGINT) - mny) * 256 // (mxy - mny + 1)"

_register(
    "zorder_layout_advisor",
    _q_zorder_advisor,
    f"""
WITH st AS (
  SELECT CAST(min(l_partkey) AS BIGINT) mnx, CAST(max(l_partkey) AS BIGINT) mxx,
         CAST(min(l_suppkey) AS BIGINT) mny, CAST(max(l_suppkey) AS BIGINT) mxy,
         CAST(min(l_orderkey) AS BIGINT) mno, CAST(max(l_orderkey) AS BIGINT) mxo,
         CAST(count(*) AS BIGINT) n_rows
  FROM lineitem),
tagged AS (
  SELECT 'zorder' AS layout,
         CAST({_zexpr(f"({_GX})", f"({_GY})", _BITS)} AS BIGINT) AS cell,
         CAST(l_partkey AS BIGINT) x, CAST(l_suppkey AS BIGINT) y,
         mnx, mxx, mny, mxy, n_rows
  FROM lineitem, st
  UNION ALL
  SELECT 'natural',
         CAST((CAST(l_orderkey AS BIGINT) - mno) * {(1 << _BITS) ** 2} // (mxo - mno + 1) AS BIGINT),
         CAST(l_partkey AS BIGINT), CAST(l_suppkey AS BIGINT),
         mnx, mxx, mny, mxy, n_rows
  FROM lineitem, st),
cells AS (
  SELECT layout, cell, count(*) cnt,
         min(x) cmnx, max(x) cmxx, min(y) cmny, max(y) cmxy,
         any_value(mnx) mnx, any_value(mxx) mxx, any_value(mny) mny,
         any_value(mxy) mxy, any_value(n_rows) n_rows
  FROM tagged GROUP BY 1, 2),
filed AS (
  SELECT *,
         (sum(cnt) OVER (PARTITION BY layout ORDER BY cell
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
           * {_FILES} // n_rows AS fid
  FROM cells),
files AS (
  SELECT layout, fid,
         min(cmnx) fmnx, max(cmxx) fmxx, min(cmny) fmny, max(cmxy) fmxy,
         any_value(mnx) mnx, any_value(mxx) mxx,
         any_value(mny) mny, any_value(mxy) mxy
  FROM filed GROUP BY 1, 2)
SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       round(CAST(sum(fmxx - fmnx + 1) AS DOUBLE)
             / CAST(count(*) * (any_value(mxx) - any_value(mnx) + 1) AS DOUBLE), 6)
         AS scan_frac_x,
       round(CAST(sum(fmxy - fmny + 1) AS DOUBLE)
             / CAST(count(*) * (any_value(mxy) - any_value(mny) + 1) AS DOUBLE), 6)
         AS scan_frac_y
FROM files GROUP BY layout
""",
)

_SHARDS = 8


def _q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return layout.shard_assign_balanced(
        docs, "doc_id", textstats.token_count(F.col("text")), n_shards=_SHARDS
    )


_register(
    "shard_assign_balanced",
    _q_shard_assign,
    rf"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS w
  FROM documents),
r AS (
  SELECT doc_id, w, row_number() OVER (ORDER BY w DESC, doc_id) AS rk FROM t)
SELECT CAST((rk - 1) % {_SHARDS} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS tok_total
FROM r GROUP BY 1
""",
)
