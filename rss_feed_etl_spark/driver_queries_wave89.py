"""Wave-89 driver queries: Qini uplift curve over score deciles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _code
from .operators import eventanalytics as ea

_NB = 10


def _q_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.qini_curve(td.load_table(spark, sf_dir, "events"), n_buckets=_NB)


_QS = [i / _NB for i in range(1, _NB)]
_CUTS = ", ".join(
    f"quantile_cont(score, {q!r}) AS c{int(q * 100)}" for q in _QS
)
_BUCKET = "1 + " + " + ".join(
    f"CASE WHEN CAST(score AS DOUBLE) > c{int(q * 100)} THEN 1 ELSE 0 END"
    for q in _QS
)

_register(
    "qini_curve",
    _q_qini,
    f"""
WITH per AS (
  SELECT user_id AS u,
         CAST(round(sum(CAST(value AS DECIMAL(30,10))) * 100, 0) AS BIGINT)
           AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1),
cuts AS (SELECT {_CUTS} FROM per),
cells AS (
  SELECT ({_BUCKET}) AS b,
         CAST(sum(CASE WHEN ({_code('CAST(u AS VARCHAR)')}) % 2 = 1
                  THEN 1 ELSE 0 END) AS BIGINT) nt,
         CAST(sum(CASE WHEN ({_code('CAST(u AS VARCHAR)')}) % 2 = 0
                  THEN 1 ELSE 0 END) AS BIGINT) nc,
         CAST(sum(CASE WHEN ({_code('CAST(u AS VARCHAR)')}) % 2 = 1
                  THEN conv ELSE 0 END) AS BIGINT) ct,
         CAST(sum(CASE WHEN ({_code('CAST(u AS VARCHAR)')}) % 2 = 0
                  THEN conv ELSE 0 END) AS BIGINT) cc
  FROM per, cuts GROUP BY 1),
cum AS (
  SELECT b, CAST(sum(nt) OVER w AS BIGINT) cnt,
         CAST(sum(nc) OVER w AS BIGINT) cnc,
         CAST(sum(ct) OVER w AS BIGINT) cct,
         CAST(sum(cc) OVER w AS BIGINT) ccc
  FROM cells WINDOW w AS (ORDER BY b DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT CAST(b AS BIGINT) AS bucket, cnt AS n_treat, cnc AS n_ctrl,
       cct AS conv_treat, ccc AS conv_ctrl,
       round(CAST(cct AS DOUBLE)
             - CAST(ccc AS DOUBLE)
               * (CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE)), 6) + 0.0 AS qini
FROM cum WHERE cnc > 0
""",
)
