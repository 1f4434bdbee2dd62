"""Wave-70 driver queries: z-order clustering depth (layout health after
appends) and Neyman budget allocation across strata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .driver_queries_wave64 import _GX, _GY, _zexpr
from .operators import layout, sampling, textstats

_BITS = 8
_FILES = 64


def _q_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = td.load_table(spark, sf_dir, "lineitem")
    return layout.zorder_clustering_depth(
        li, "l_partkey", "l_suppkey", "l_orderkey",
        n_files=_FILES, grid_bits=_BITS,
    )


_register(
    "zorder_clustering_depth",
    _q_depth,
    f"""
WITH st AS (
  SELECT CAST(min(l_partkey) AS BIGINT) mnx, CAST(max(l_partkey) AS BIGINT) mxx,
         CAST(min(l_suppkey) AS BIGINT) mny, CAST(max(l_suppkey) AS BIGINT) mxy,
         CAST(min(l_orderkey) AS BIGINT) mno, CAST(max(l_orderkey) AS BIGINT) mxo,
         CAST(count(*) AS BIGINT) n_rows
  FROM lineitem),
zc AS (
  SELECT CAST({_zexpr(f"({_GX})", f"({_GY})", _BITS)} AS BIGINT) AS z,
         CAST((CAST(l_orderkey AS BIGINT) - mno) * {(1 << _BITS) ** 2}
              // (mxo - mno + 1) AS BIGINT) AS ncell,
         n_rows
  FROM lineitem, st),
tagged AS (
  SELECT 'zorder' AS layout, z AS cell, z, n_rows FROM zc
  UNION ALL
  SELECT 'natural', ncell, z, n_rows FROM zc),
cells AS (
  SELECT layout, cell, count(*) cnt, min(z) czmn, max(z) czmx,
         any_value(n_rows) n_rows
  FROM tagged GROUP BY 1, 2),
filed AS (
  SELECT *,
         (sum(cnt) OVER (PARTITION BY layout ORDER BY cell
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
           * {_FILES} // n_rows AS fid
  FROM cells),
files AS (
  SELECT layout, fid, min(czmn) zmn, max(czmx) zmx
  FROM filed GROUP BY 1, 2),
depth AS (
  SELECT a.layout, a.fid, CAST(count(*) AS BIGINT) AS d
  FROM files a JOIN files b
    ON a.layout = b.layout AND a.zmn <= b.zmx AND b.zmn <= a.zmx
  GROUP BY 1, 2)
SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       round(CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_depth,
       CAST(max(d) AS BIGINT) AS max_depth
FROM depth GROUP BY 1
""",
)

_BUDGET = 1000


def _q_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return sampling.neyman_allocation(
        docs, "source", textstats.token_count(F.col("text")).cast("long"),
        budget=_BUDGET,
    )


_TOK = (
    "CAST(CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)"
)

_register(
    "neyman_allocation",
    _q_neyman,
    f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_TOK}) AS BIGINT) AS s,
         CAST(sum({_TOK} * {_TOK}) AS BIGINT) AS sq
  FROM documents GROUP BY 1),
sc AS (
  SELECT source, n,
         sqrt(greatest(CAST(sq AS DOUBLE) / n
                       - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                       0.0)) AS sd,
         CAST(floor(CAST(n AS DOUBLE)
                    * sqrt(greatest(CAST(sq AS DOUBLE) / n
                           - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                           0.0)) * 1000000.0) AS BIGINT) AS wh
  FROM per),
tot AS (
  SELECT source, n, sd, wh,
         CAST(sum(wh) OVER () AS BIGINT) AS tw,
         CAST(sum(n) OVER () AS BIGINT) AS tn
  FROM sc)
SELECT source AS stratum, n AS n_docs, round(sd, 6) AS sd,
       CAST(floor(CAST({_BUDGET} * wh AS DOUBLE) / CAST(tw AS DOUBLE) + 0.5)
            AS BIGINT) AS alloc_neyman,
       CAST(floor(CAST({_BUDGET} * n AS DOUBLE) / CAST(tn AS DOUBLE) + 0.5)
            AS BIGINT) AS alloc_proportional
FROM tot
""",
)
