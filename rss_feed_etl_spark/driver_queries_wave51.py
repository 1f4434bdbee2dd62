"""Driver-contract queries, wave 51: Benford first-digit screening and
sorted-neighborhood record-linkage blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import fuzzy, profiling

# --- Benford digit test -----------------------------------------------------


def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.benford_digit_test(
        td.load_table(spark, sf_dir, "orders"), value_col="o_totalprice"
    )


def _benford_sql() -> str:
    import math

    arms = " ".join(
        f"WHEN {d} THEN {math.log10(1 + 1 / d)!r}" for d in range(1, 10)
    )
    return f"""
WITH d AS (
  SELECT CAST(regexp_replace(CAST(abs(o_totalprice) AS VARCHAR),
                             '[^1-9]*([1-9]).*', '\\1') AS INT) AS digit
  FROM orders WHERE abs(o_totalprice) > 0),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
      FROM d WHERE digit IS NOT NULL GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM g)
SELECT digit, n,
       round(n / tot, 6) AS p_observed,
       round(CASE digit {arms} ELSE 0.0 END, 6) AS p_benford,
       round((n / tot - CASE digit {arms} ELSE 0.0 END)
             * (n / tot - CASE digit {arms} ELSE 0.0 END)
             / (CASE digit {arms} ELSE 0.0 END) * tot, 6) AS chi2_contrib
FROM g, t
"""


_register("benford_digit_test", _q_benford, _benford_sql())


# --- sorted-neighborhood blocking -------------------------------------------

_SN_WINDOW = 3
_SN_BLOCK = 3


def _q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = td.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.reverse(F.col("c_name")).alias("rname"),
    )
    return fuzzy.sorted_neighborhood_pairs(
        cust, id_col="id", key_col="rname",
        window=_SN_WINDOW, block_chars=_SN_BLOCK,
    )


_register(
    "sorted_neighborhood_pairs",
    _q_sorted_neighborhood,
    f"""
WITH t AS (
  SELECT c_custkey AS id,
         lower(regexp_replace(reverse(c_name), '[^A-Za-z0-9]', '', 'g')) AS k
  FROM customer),
r AS (SELECT *, substr(k, 1, {_SN_BLOCK}) AS blk,
             row_number() OVER (PARTITION BY substr(k, 1, {_SN_BLOCK})
                                ORDER BY k, id) AS rn
      FROM t)
SELECT DISTINCT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
       CAST(levenshtein(a.k, b.k) AS INT) AS edit_distance
FROM r a JOIN r b
  ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND {_SN_WINDOW}
""",
)
